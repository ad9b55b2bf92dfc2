from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.evaluation.confusion import confusion_counts, confusion_matrix_pivot
from lours_spark.evaluation.crowd import count_error_stats, per_image_counts
from lours_spark.evaluation.pr import evaluate_detections
from lours_spark.operators.windows import (
    average_precision,
    forward_fill,
    interpolated_precision,
    pr_curve,
    sessionize,
)


def test_pr_curve_simple(spark):
    # 4 predictions: TP TP FP TP by descending confidence
    df = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 1, 2), ("g", 0.7, 0, 3), ("g", 0.6, 1, 4)],
        "grp string, confidence double, is_tp int, pid long",
    )
    curve = pr_curve(df, ["grp"], "confidence", "is_tp", tie_break="pid")
    rows = sorted(curve.collect(), key=lambda r: -r["confidence"])
    assert [r["precision"] for r in rows] == pytest.approx([1.0, 1.0, 2 / 3, 3 / 4])
    assert [r["recall"] for r in rows] == pytest.approx([1 / 3, 2 / 3, 2 / 3, 1.0])


def test_interpolated_precision_monotone(spark):
    df = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 1, 2), ("g", 0.7, 0, 3), ("g", 0.6, 1, 4)],
        "grp string, confidence double, is_tp int, pid long",
    )
    curve = pr_curve(df, ["grp"], "confidence", "is_tp", tie_break="pid")
    interp = interpolated_precision(curve, ["grp"], "confidence")
    rows = sorted(interp.collect(), key=lambda r: -r["confidence"])
    vals = [r["precision_interp"] for r in rows]
    assert vals == sorted(vals, reverse=True)  # monotone non-increasing


def test_average_precision_perfect_detector(spark):
    df = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 1, 2)],
        "grp string, confidence double, is_tp int, pid long",
    )
    curve = pr_curve(df, ["grp"], "confidence", "is_tp", tie_break="pid")
    ap = average_precision(curve, ["grp"])
    assert ap.first()["average_precision"] == pytest.approx(1.0)


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, None), (1, 4, 20.0), (2, 1, None)],
        "uid long, seq long, v double",
    )
    out = forward_fill(df, ["uid"], [F.asc("seq")], "v", out_name="f")
    rows = {(r["uid"], r["seq"]): r["f"] for r in out.collect()}
    assert rows[(1, 2)] == 10.0 and rows[(1, 3)] == 10.0
    assert rows[(1, 4)] == 20.0
    assert rows[(2, 1)] is None


def test_sessionize_gap(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (2, 1, base + dt.timedelta(minutes=10)),  # same session
        (3, 1, base + dt.timedelta(minutes=70)),  # new session
        (4, 2, base),  # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, gap_seconds=1800)
    sess = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert sess[1] == sess[2] == 1
    assert sess[3] == 2
    assert sess[4] == 1


def test_confusion_counts_and_pivot(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", None)],
        "groundtruth_label string, prediction_label string",
    )
    counts = confusion_counts(df)
    m = {(r["groundtruth_label"], r["prediction_label"]): r for r in counts.collect()}
    assert m[("a", "a")]["count"] == 2
    assert m[("a", "a")]["share"] == pytest.approx(2 / 3)
    assert m[("b", "None")]["count"] == 1
    wide = confusion_matrix_pivot(counts)
    assert wide.count() == 2


def test_crowd_counts(spark):
    gt = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "id long, image_id long"
    )
    pred = spark.createDataFrame(
        [(10, 1, 0.9), (11, 1, 0.9), (12, 1, 0.9), (13, 3, 0.9)],
        "id long, image_id long, confidence double",
    )
    counts = per_image_counts(gt, pred)
    rows = {r["image_id"]: r for r in counts.collect()}
    assert rows[1]["error"] == 1  # 3 pred vs 2 gt
    assert rows[2]["error"] == -1  # 0 pred vs 1 gt
    assert rows[3]["error"] == 1  # 1 pred vs 0 gt
    stats = count_error_stats(counts).first()
    assert stats["mae"] == pytest.approx(1.0)
    assert stats["n_images"] == 3


def test_evaluate_detections_end_to_end(tiny_dataset):
    ann = tiny_dataset.annotations
    pred = ann.withColumn("id", F.col("id") + 100000).withColumn(
        "confidence", F.lit(0.9)
    )
    result = evaluate_detections(ann, pred)
    ap = {r["category_id"]: r["average_precision"] for r in result["ap"].collect()}
    # identical predictions → perfect AP per category
    for v in ap.values():
        assert v == pytest.approx(1.0)


def test_count_error_curve(spark):
    """Per-confidence error curve equals per-threshold recomputation
    (reference crowd_detection_evaluator.py:150-236 curves), in one
    prediction-table pass."""
    from lours_spark.evaluation.crowd import (
        count_error_curve,
        count_error_stats,
        per_image_counts,
    )

    gt = spark.createDataFrame(
        [(i, img) for i, img in enumerate([0, 0, 0, 1, 1, 2])],
        "id long, image_id long",
    )
    pred = spark.createDataFrame(
        [
            (10, 0, 0.9), (11, 0, 0.6), (12, 0, 0.3),
            (13, 1, 0.8), (14, 2, 0.5), (15, 3, 0.7),
        ],
        "id long, image_id long, confidence double",
    )
    thresholds = [0.25, 0.55, 0.85]
    curve = {
        r.confidence: (r.mae, r.rmse)
        for r in count_error_curve(gt, pred, thresholds).collect()
    }
    assert set(curve) == set(thresholds)
    for t in thresholds:
        ref = count_error_stats(per_image_counts(gt, pred, t)).collect()[0]
        assert curve[t] == (ref.mae, ref.rmse), t


def test_crowd_evaluator_facade(tiny_dataset):
    import pytest as _pytest

    from lours_spark.evaluation.detection_evaluator import (
        CrowdDetectionEvaluator,
    )

    preds = tiny_dataset.from_template(
        annotations=tiny_dataset.annotations.withColumn(
            "id", F.col("id") + 10_000
        ).withColumn("confidence", (F.col("id") % 10).cast("double") / 10.0)
    )
    ev = CrowdDetectionEvaluator(tiny_dataset, predictions=preds)
    stats, details = ev.compute_count_error(
        groups=(), confidence_index=(0.0, 0.5, 1.0)
    )
    rows = {r["confidence"]: r for r in stats.collect()}
    assert set(rows) == {0.0, 0.5, 1.0}
    # at threshold 0 every prediction counts → error 0 on every image
    assert rows[0.0]["mae"] == 0.0
    assert rows[0.5]["mae"] > 0.0
    assert all(r["model"] == "predictions" for r in stats.collect())
    assert details.count() == tiny_dataset.images.filter(
        F.col("id").isin(
            [r["image_id"] for r in tiny_dataset.annotations.select("image_id").distinct().collect()]
        )
    ).count()
    with _pytest.raises(NotImplementedError):
        ev.compute_normalized_precision_recall()


def test_evaluator_parquet_roundtrip(tiny_dataset, tmp_path, spark):
    import pytest as _pytest

    from lours_spark.evaluation.detection_evaluator import (
        CrowdDetectionEvaluator,
        DetectionEvaluator,
    )

    preds = tiny_dataset.from_template(
        annotations=tiny_dataset.annotations.withColumn(
            "id", F.col("id") + 50_000
        ).withColumn("confidence", F.lit(0.5))
    )
    ev = DetectionEvaluator(tiny_dataset, name="roundtrip", model_a=preds)
    out = str(tmp_path / "eval_pq")
    ev.to_parquet(out)
    back = DetectionEvaluator.from_parquet(spark, out)
    assert back.name == "roundtrip"
    assert list(back.predictions_dictionary) == ["model_a"]
    assert (
        back.predictions_dictionary["model_a"].len_annot() == preds.len_annot()
    )
    # class check mirrors the reference's __name__ guard
    with _pytest.raises(ValueError, match="DetectionEvaluator"):
        CrowdDetectionEvaluator.from_parquet(spark, out)
    # overwrite=False refuses to clobber
    with _pytest.raises(FileExistsError):
        ev.to_parquet(out)
    ev.to_parquet(out, overwrite=True)


def test_ap_both_routing_probe(spark, monkeypatch):
    """compute_precision_recall routes ap_both on the curve row-count
    probe: small frames → single-aggregation array path, frames past
    TINY_CURVE_ROWS → the distributed window/explode join. Both paths
    must return the same values, and the stats out-param must report
    the probe + chosen path (scale-evidence observability)."""
    from lours_spark.evaluation import evaluator as ev

    gt = spark.createDataFrame(
        [(i, i % 10, i % 2, 5.0 * (i % 6), 4.0 * (i % 5), 10.0, 8.0)
         for i in range(60)],
        "id long, image_id long, category_id int, box_x_min double,"
        " box_y_min double, box_width double, box_height double",
    )
    pred = gt.select(
        (F.col("id") + 1000).alias("id"), "image_id", "category_id",
        (F.col("box_x_min") + 1.0).alias("box_x_min"), "box_y_min",
        "box_width", "box_height",
        ((F.col("id") % 13) / 13.0).alias("confidence"),
    )
    s_small: dict = {}
    res_small = ev.compute_precision_recall(gt, pred, ious=[0.3], stats=s_small)
    small = {
        (r["category_id"], r["iou_threshold"]): (r["average_precision"], r["ap"])
        for r in res_small["ap_both"].collect()
    }
    assert s_small["ap_both_path"] == "array_fast"
    assert s_small["n_curve_rows"] > 0

    monkeypatch.setattr(ev, "TINY_CURVE_ROWS", 1)
    s_big: dict = {}
    res_big = ev.compute_precision_recall(gt, pred, ious=[0.3], stats=s_big)
    big = {
        (r["category_id"], r["iou_threshold"]): (r["average_precision"], r["ap"])
        for r in res_big["ap_both"].collect()
    }
    assert s_big["ap_both_path"] == "distributed_join"
    assert s_big["n_curve_rows"] == s_small["n_curve_rows"]
    assert set(big) == set(small)
    for k in small:
        assert big[k][0] == pytest.approx(small[k][0], abs=1e-9)
        assert big[k][1] == pytest.approx(small[k][1], abs=1e-9)


def test_average_precisions_both_matches_window_forms(spark):
    """The single-aggregation tiny-curve path (sorted-array fold +
    grid sampling as array expressions) must reproduce the distributed
    window/explode forms' AP values on the same curve frame."""
    import random

    from pyspark.sql import functions as F

    from lours_spark.evaluation.evaluator import (
        ap_at_recall_grid,
        average_precisions,
        average_precisions_both,
        compute_precision_recall,
    )

    rng = random.Random(3)
    gt = spark.createDataFrame(
        [
            (i, i % 50, i % 4, 10.0 * (i % 7), 8.0 * (i % 5), 20.0, 16.0)
            for i in range(400)
        ],
        "id long, image_id long, category_id int, box_x_min double,"
        " box_y_min double, box_width double, box_height double",
    )
    # i % 5 (vs the groundtruth's i % 4) makes category 4 a
    # zero-groundtruth group: its recall is NULL end-to-end, which the
    # window form's NULL-skipping F.sum turns into AP 0.0 — the fold
    # path must agree instead of null-propagating (ADVICE r4).
    pred = spark.createDataFrame(
        [
            (
                1000 + i,
                i % 50,
                i % 5,
                10.0 * (i % 7) + rng.uniform(-4, 4),
                8.0 * (i % 5) + rng.uniform(-4, 4),
                20.0,
                16.0,
                rng.random(),
            )
            for i in range(360)
        ],
        "id long, image_id long, category_id int, box_x_min double,"
        " box_y_min double, box_width double, box_height double,"
        " confidence double",
    )
    res = compute_precision_recall(gt, pred, ious=[0.3, 0.5])
    curves = res["curves"]
    keys = ["category_id", "iou_threshold"]
    want_ap = {
        tuple(r[k] for k in keys): r["average_precision"]
        for r in average_precisions(curves).collect()
    }
    want_grid = {
        tuple(r[k] for k in keys): r["ap"]
        for r in ap_at_recall_grid(curves).collect()
    }
    zero_gt = [k for k in want_ap if k[0] == 4]
    assert zero_gt, "category 4 must reach the curve frame with no GT"
    for k in zero_gt:
        assert want_ap[k] == pytest.approx(0.0, abs=1e-12)
        assert want_grid[k] == pytest.approx(0.0, abs=1e-12)
    got = average_precisions_both(curves).collect()
    assert len(got) == len(want_ap) > 0
    for r in got:
        k = tuple(r[x] for x in keys)
        assert r["average_precision"] == pytest.approx(want_ap[k], abs=1e-9), k
        assert r["ap"] == pytest.approx(want_grid[k], abs=1e-9), k
    # and the ap_both frame the evaluator returns is the same thing
    both = {
        tuple(r[x] for x in keys): (r["average_precision"], r["ap"])
        for r in res["ap_both"].collect()
    }
    for k, (a, g) in both.items():
        assert a == pytest.approx(want_ap[k], abs=1e-9)
        assert g == pytest.approx(want_grid[k], abs=1e-9)
