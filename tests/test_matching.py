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
