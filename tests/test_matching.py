from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lours_spark.evaluation.matching import (
    compute_matches,
    greedy_match,
    iou_matrix,
)


def test_iou_matrix_known_values():
    gt = np.array([[0.0, 0.0, 10.0, 10.0]])
    pred = np.array([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 10.0, 10.0]])
    m = iou_matrix(gt, pred)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(50.0 / 150.0)


def test_iou_matrix_empty():
    assert iou_matrix(np.zeros((0, 4)), np.zeros((3, 4))).shape == (0, 3)


def test_greedy_match_prefers_confident_prediction():
    # one gt, two predictions both overlapping; higher confidence wins
    ious = np.array([[0.6, 0.9]])
    conf = np.array([0.9, 0.1])
    matches = greedy_match(ious, conf)
    assert matches == [(0, 0, 0.6)]


def test_greedy_match_one_to_one():
    ious = np.array([[0.9, 0.8], [0.85, 0.7]])
    conf = np.array([0.9, 0.8])
    matches = greedy_match(ious, conf)
    # pred0 takes gt0 (0.9); pred1 must take gt1 (0.7)
    assert sorted(matches) == [(0, 0, 0.9), (1, 1, 0.7)]


def test_compute_matches_full_outer(spark):
    gt = spark.createDataFrame(
        [
            (1, 10, 0, 0.0, 0.0, 10.0, 10.0),
            (2, 10, 0, 50.0, 50.0, 10.0, 10.0),
        ],
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double",
    )
    pred = spark.createDataFrame(
        [
            (100, 10, 0, 1.0, 0.0, 10.0, 10.0, 0.9),  # matches gt 1
            (101, 10, 0, 200.0, 200.0, 5.0, 5.0, 0.8),  # FP
        ],
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double, confidence double",
    )
    rows = compute_matches(gt, pred).collect()
    by_pred = {r["prediction_id"]: r for r in rows if r["prediction_id"]}
    assert by_pred[100]["groundtruth_id"] == 1
    assert by_pred[100]["iou"] > 0.8
    assert by_pred[101]["groundtruth_id"] is None  # FP row
    fn = [r for r in rows if r["prediction_id"] is None]
    assert len(fn) == 1 and fn[0]["groundtruth_id"] == 2  # unmatched gt


def test_self_match_is_perfect(tiny_dataset):
    ann = tiny_dataset.annotations
    matches = compute_matches(ann, ann)
    n = ann.count()
    perfect = matches.filter(
        F.col("prediction_id").isNotNull()
        & F.col("groundtruth_id").isNotNull()
        & (F.col("iou") > 0.999999)
    ).count()
    assert perfect == n


def _reference_greedy(ious, conf, min_iou=0.0):
    """Straight-line reimplementation of the reference semantics
    (confidence-descending, best free gt, ties to lowest index) used as
    an independent check of the vectorized kernel."""
    n_gt, n_pred = ious.shape
    order = sorted(range(n_pred), key=lambda p: (-conf[p], p))
    taken, out = set(), []
    for p in order:
        best_g, best = -1, min_iou
        for g in range(n_gt):
            if g in taken:
                continue
            if ious[g, p] > best:
                best_g, best = g, ious[g, p]
        if best_g >= 0:
            taken.add(best_g)
            out.append((best_g, p, float(best)))
    return out


def test_greedy_match_against_reference_random():
    rng = np.random.default_rng(123)
    for _ in range(200):
        n_gt = int(rng.integers(0, 8))
        n_pred = int(rng.integers(0, 8))
        ious = rng.random((n_gt, n_pred))
        # inject ties
        if n_gt and n_pred:
            ious[ious > 0.8] = 0.9
        conf = np.round(rng.random(n_pred), 1)  # tied confidences too
        assert greedy_match(ious, conf) == _reference_greedy(ious, conf)


def test_compute_matches_preserves_huge_ids(spark):
    """Annotation ids >= 2**53 survive the per-group kernel exactly:
    its tuple rows go int -> int64 arrow columns without a float64
    detour (ADVICE r3: the old path rounded such ids silently). A
    20x20 group (product > 256) routes to the per-group kernel."""
    base = 2**53
    n = 20
    gt_rows = [
        (base + 2 * i + 1, 5, 0, float(20 * i), 0.0, 10.0, 10.0)
        for i in range(n)
    ]
    pred_rows = [
        (base + 10_000 + 2 * i + 1, 5, 0, float(20 * i) + 1.0, 0.0, 10.0,
         10.0, 0.5 + i / 100)
        for i in range(n)
    ]
    gt = spark.createDataFrame(
        gt_rows,
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double",
    )
    pred = spark.createDataFrame(
        pred_rows,
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double, "
        "confidence double",
    )
    rows = compute_matches(gt, pred).collect()
    got_pred = {r["prediction_id"] for r in rows if r["prediction_id"] is not None}
    got_gt = {r["groundtruth_id"] for r in rows if r["groundtruth_id"] is not None}
    # odd offsets are NOT float64-representable around 2**53 — exact
    # equality proves ids never rode a float column
    assert got_pred == {r[0] for r in pred_rows}
    assert got_gt == {r[0] for r in gt_rows}
    matched = [r for r in rows if r["prediction_id"] and r["groundtruth_id"]]
    assert len(matched) == n


def _batch_from_groups(groups):
    """Build a kernel input batch dict sorted like compute_matches
    arranges partitions: (image_id, category_id, is_groundtruth, id)."""
    rows = []
    for (img, cat), (n_gt, n_pr, rng) in groups.items():
        for i in range(n_pr):  # predictions block first (is_gt False)
            rows.append((img, cat, 1_000_000 + img * 1000 + i, False,
                         rng.uniform(0, 80), rng.uniform(0, 80),
                         rng.uniform(5, 20), rng.uniform(5, 20),
                         rng.uniform(0.1, 1.0)))
        for i in range(n_gt):
            rows.append((img, cat, 2_000_000 + img * 1000 + i, True,
                         rng.uniform(0, 80), rng.uniform(0, 80),
                         rng.uniform(5, 20), rng.uniform(5, 20),
                         np.nan))
    rows.sort(key=lambda r: (r[0], r[1], r[3], r[2]))
    cols = list(zip(*rows))
    return {
        "image_id": np.array(cols[0], dtype=np.int64),
        "category_id": np.array(cols[1], dtype=np.int64),
        "id": np.array(cols[2], dtype=np.int64),
        "is_groundtruth": np.array(cols[3], dtype=bool),
        "box_x_min": np.array(cols[4], dtype=float),
        "box_y_min": np.array(cols[5], dtype=float),
        "box_width": np.array(cols[6], dtype=float),
        "box_height": np.array(cols[7], dtype=float),
        "confidence": np.array(cols[8], dtype=float),
    }


def test_skewed_group_routes_to_per_group_kernel(monkeypatch):
    """A big-product group (30x30 > 256 cap) must bypass the bulk
    shape-stacked path and run the per-group kernel, with output
    identical to greedy_match run standalone on that group."""
    import lours_spark.evaluation.matching as M

    rng = np.random.default_rng(5)
    groups = {(100, 0): (30, 30, rng)}
    for img in range(10):  # tiny groups around the monster
        groups[(img, 0)] = (2, 2, rng)
    batch = _batch_from_groups(groups)

    bulk_shapes = []
    orig_bulk = M._bulk_greedy_shape

    def spy(h_img, h_cat, ids, boxes, conf, ss, n_gt_s, n_pr_s, emit, min_iou):
        bulk_shapes.append((n_gt_s, n_pr_s))
        return orig_bulk(h_img, h_cat, ids, boxes, conf, ss, n_gt_s, n_pr_s,
                         emit, min_iou)

    monkeypatch.setattr(M, "_bulk_greedy_shape", spy)
    results = list(M._match_batches(iter([batch])))
    assert (30, 30) not in bulk_shapes  # monster went per-group

    # reconstruct the monster group's matches from the kernel output
    got = set()
    for arr, out in results:
        if arr is not None:
            for i in range(len(arr["image_id"])):
                if arr["image_id"][i] == 100:
                    got.add((arr["prediction_id"][i], arr["groundtruth_id"][i]))
        for t in out:
            if t[0] == 100:
                got.add((
                    np.nan if t[2] is None else float(t[2]),
                    np.nan if t[3] is None else float(t[3]),
                ))
    matched_got = {(int(p), int(g)) for p, g in got
                   if p == p and g == g}  # drop nan (FN/FP rows)

    # standalone reference on the same group
    sel = batch["image_id"] == 100
    is_gt = batch["is_groundtruth"][sel]
    boxes = np.column_stack([batch[c][sel] for c in
                             ("box_x_min", "box_y_min", "box_width", "box_height")])
    ids = batch["id"][sel]
    conf = batch["confidence"][sel]
    ious = iou_matrix(boxes[is_gt], boxes[~is_gt])
    ref = {(int(ids[~is_gt][p]), int(ids[is_gt][g]))
           for g, p, _ in greedy_match(ious, conf[~is_gt])}
    assert matched_got == ref
    assert len(matched_got) > 0


def test_compute_matches_skewed_identical_to_standalone(spark):
    """End-to-end skew: one monster image (300 gt + 300 pred) among
    200 tiny images — the distributed matcher's output for the monster
    group equals greedy_match run standalone on the same boxes."""
    rng = np.random.default_rng(13)

    def rows(img, n, id_base, jitter):
        return [
            (id_base + i, img, 0,
             float(rng.uniform(0, 500)) + jitter, float(rng.uniform(0, 500)),
             float(rng.uniform(5, 30)), float(rng.uniform(5, 30)),
             float(rng.uniform(0.1, 1.0)))
            for i in range(n)
        ]

    gt_rows, pred_rows = [], []
    gt_rows += rows(-1, 300, 0, 0.0)
    pred_rows += rows(-1, 300, 5_000_000, 0.0)
    for img in range(200):
        gt_rows += rows(img, 2, 10_000 + img * 10, 0.0)
        pred_rows += rows(img, 2, 6_000_000 + img * 10, 0.0)
    schema = (
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double, "
        "confidence double"
    )
    gt = spark.createDataFrame(gt_rows, schema).drop("confidence")
    pred = spark.createDataFrame(pred_rows, schema)
    matches = compute_matches(gt, pred).filter("image_id = -1").collect()
    got = {(r["prediction_id"], r["groundtruth_id"]) for r in matches
           if r["prediction_id"] is not None and r["groundtruth_id"] is not None}

    g = np.array([r[3:7] for r in gt_rows if r[1] == -1])
    p = np.array([r[3:7] for r in pred_rows if r[1] == -1])
    gids = np.array([r[0] for r in gt_rows if r[1] == -1])
    pids = np.array([r[0] for r in pred_rows if r[1] == -1])
    conf = np.array([r[7] for r in pred_rows if r[1] == -1])
    ref = {(int(pids[pi]), int(gids[gi]))
           for gi, pi, _ in greedy_match(iou_matrix(g, p), conf)}
    assert got == ref
    assert len(got) > 50  # dense canvas: plenty of true matches


def test_greedy_match_streaming_identical_to_matrix():
    """The O(n_gt)-memory streaming greedy produces IDENTICAL matches
    to the matrix form on random crowded groups (same elementwise
    arithmetic, same tie-breaks)."""
    from lours_spark.evaluation.matching import greedy_match_streaming

    rng = np.random.default_rng(21)
    for trial in range(5):
        n_gt, n_pr = rng.integers(1, 120, size=2)
        gt = rng.uniform(0, 100, size=(n_gt, 4))
        pr = rng.uniform(0, 100, size=(n_pr, 4))
        gt[:, 2:] = rng.uniform(1, 30, size=(n_gt, 2))
        pr[:, 2:] = rng.uniform(1, 30, size=(n_pr, 2))
        conf = rng.uniform(0, 1, size=n_pr)
        # duplicate some confidences to exercise tie-break parity
        conf[: n_pr // 3] = conf[0]
        ref = greedy_match(iou_matrix(gt, pr), conf)
        got = greedy_match_streaming(gt, pr, conf)
        assert got == ref
