"""Independent NumPy implementation of the COCO detection-evaluation
protocol (greedy matching + 101-point AP accumulation), used as the
oracle for the Spark evaluator's parity tests.

pycocotools is not installable in this environment, so this is a
from-scratch implementation of the published protocol (Lin et al.,
"Microsoft COCO: Common Objects in Context", and the COCO detection
challenge evaluation rules): per (image, category), predictions in
descending-score order each greedily take the still-unmatched
groundtruth with the highest IoU ≥ t; AP(t) = mean of the
monotone-enveloped precision sampled at 101 recall points.

Mirrors what the reference asserts against pycocotools in
``test_lours/test_evaluation/test_matches.py:30-79`` (exact match-set
equality) and prints in ``test_pr.py:14-42`` (accumulated precision).
Deliberately written array-at-a-time with no pycocotools code reuse.
"""

from __future__ import annotations

import numpy as np


def xywh_iou_matrix(gt: np.ndarray, dt: np.ndarray) -> np.ndarray:
    """IoU between every (gt, dt) pair of XYWH boxes → (n_gt, n_dt)."""
    if len(gt) == 0 or len(dt) == 0:
        return np.zeros((len(gt), len(dt)))
    gx1, gy1 = gt[:, 0][:, None], gt[:, 1][:, None]
    gx2, gy2 = gx1 + gt[:, 2][:, None], gy1 + gt[:, 3][:, None]
    dx1, dy1 = dt[:, 0][None, :], dt[:, 1][None, :]
    dx2, dy2 = dx1 + dt[:, 2][None, :], dy1 + dt[:, 3][None, :]
    iw = np.clip(np.minimum(gx2, dx2) - np.maximum(gx1, dx1), 0, None)
    ih = np.clip(np.minimum(gy2, dy2) - np.maximum(gy1, dy1), 0, None)
    inter = iw * ih
    union = (
        gt[:, 2][:, None] * gt[:, 3][:, None]
        + dt[:, 2][None, :] * dt[:, 3][None, :]
        - inter
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def greedy_match_image(
    gt_ids: np.ndarray,
    gt_boxes: np.ndarray,
    dt_ids: np.ndarray,
    dt_boxes: np.ndarray,
    dt_scores: np.ndarray,
    iou_thr: float,
) -> tuple[dict[int, int], dict[int, int]]:
    """COCO ``evaluateImg`` protocol for one (image, category) cell.

    Detections in descending score (ties: ascending dt id); each scans
    the unmatched gts in id-ascending order keeping the best IoU so far
    (the protocol's ``< best → continue`` loop: acceptance is
    ``iou ≥ iou_thr`` and the LAST gt attaining the max IoU wins exact
    ties). Returns (gt_id→dt_id, dt_id→gt_id) for matched boxes only.

    Note the engine's kernel breaks exact-IoU ties FIRST-max (argmax)
    and accepts strictly ``iou > t`` — parity fixtures therefore use
    boxes with distinct pairwise IoUs and thresholds off the
    achievable-IoU lattice, where both conventions coincide.
    """
    ious = xywh_iou_matrix(gt_boxes, dt_boxes)
    g_order = np.lexsort((gt_ids,))
    d_order = np.lexsort((dt_ids, -dt_scores))
    gt_taken = np.zeros(len(gt_ids), dtype=bool)
    gtm: dict[int, int] = {}
    dtm: dict[int, int] = {}
    for d in d_order:
        best = max(iou_thr, 1e-12)
        best_g = -1
        for g in g_order:
            if gt_taken[g]:
                continue
            if ious[g, d] < best:
                continue
            best = ious[g, d]
            best_g = g
        if best_g >= 0:
            gt_taken[best_g] = True
            gtm[int(gt_ids[best_g])] = int(dt_ids[d])
            dtm[int(dt_ids[d])] = int(gt_ids[best_g])
    return gtm, dtm


def accumulate_ap(
    dt_scores: np.ndarray,
    dt_matched: np.ndarray,
    n_gt: int,
    rec_thrs: np.ndarray | None = None,
    tiebreak_ids: np.ndarray | None = None,
) -> float:
    """COCO ``accumulate`` for one (category, iou threshold):
    score-descending cumulative TP/FP → precision/recall arrays →
    right-to-left monotone envelope → sample at the first index with
    recall ≥ r for each grid r (0 past the end) → mean."""
    if rec_thrs is None:
        # i/100 exactly (Python division), NOT np.linspace — linspace's
        # start + k*step arithmetic can differ by 1 ulp from k/100 and
        # flip a searchsorted on a recall value that lands on the grid
        rec_thrs = np.array([i / 100.0 for i in range(101)])
    if n_gt == 0:
        return float("nan")
    if tiebreak_ids is None:
        tiebreak_ids = np.arange(len(dt_scores))
    order = np.lexsort((tiebreak_ids, -dt_scores))
    tp = np.cumsum(dt_matched[order].astype(np.float64))
    fp = np.cumsum((~dt_matched[order]).astype(np.float64))
    rc = tp / n_gt
    pr = tp / np.maximum(tp + fp, 1e-12)
    for i in range(len(pr) - 1, 0, -1):
        if pr[i] > pr[i - 1]:
            pr[i - 1] = pr[i]
    q = np.zeros(len(rec_thrs))
    inds = np.searchsorted(rc, rec_thrs, side="left")
    for k, i in enumerate(inds):
        if i < len(pr):
            q[k] = pr[i]
    return float(q.mean())


def evaluate(
    gt: "list[dict]",
    dt: "list[dict]",
    iou_thrs: "list[float]",
) -> dict:
    """Full protocol over record dicts with keys
    ``id, image_id, category_id, box (xywh), score`` (score: dt only).

    Returns ``{"matches": {t: (gtm, dtm)}, "ap": {(category, t): ap}}``.
    """
    import collections

    by_cell_gt = collections.defaultdict(list)
    by_cell_dt = collections.defaultdict(list)
    for r in gt:
        by_cell_gt[(r["image_id"], r["category_id"])].append(r)
    for r in dt:
        by_cell_dt[(r["image_id"], r["category_id"])].append(r)
    cells = sorted(set(by_cell_gt) | set(by_cell_dt))
    cats = sorted({c for _, c in cells})

    out_matches: dict = {}
    ap: dict = {}
    for t in iou_thrs:
        gtm_all: dict[int, int] = {}
        dtm_all: dict[int, int] = {}
        for cell in cells:
            g = by_cell_gt.get(cell, [])
            d = by_cell_dt.get(cell, [])
            gtm, dtm = greedy_match_image(
                np.array([r["id"] for r in g], dtype=np.int64),
                np.array([r["box"] for r in g], dtype=np.float64).reshape(-1, 4),
                np.array([r["id"] for r in d], dtype=np.int64),
                np.array([r["box"] for r in d], dtype=np.float64).reshape(-1, 4),
                np.array([r["score"] for r in d], dtype=np.float64),
                t,
            )
            gtm_all.update(gtm)
            dtm_all.update(dtm)
        out_matches[t] = (gtm_all, dtm_all)
        for c in cats:
            cat_dt = [r for r in dt if r["category_id"] == c]
            scores = np.array([r["score"] for r in cat_dt])
            ids = np.array([r["id"] for r in cat_dt], dtype=np.int64)
            matched = np.array([r["id"] in dtm_all for r in cat_dt], dtype=bool)
            n_gt = sum(1 for r in gt if r["category_id"] == c)
            ap[(c, t)] = accumulate_ap(scores, matched, n_gt, tiebreak_ids=ids)
    return {"matches": out_matches, "ap": ap}
