"""Precision-recall / AP computation over the matches table.

Re-expresses reference ``detection_evaluator.py:382-682``: join matches
back to groundtruth and predictions, sort by confidence, cumsum TP,
precision/recall per cut, AP per group — all window functions
(see ``operators/windows.py``) instead of pandas group-apply loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lours_spark.operators import windows as W


def precision_recall(
    matches: DataFrame,
    min_iou: float = 0.5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """PR curve per group (default: per category).

    A match row is a TP at threshold ``min_iou`` if it pairs a
    prediction with a groundtruth at IoU STRICTLY ABOVE min_iou — the
    reference's ``iou > min_iou`` convention (``util.py:233``), the
    same one ``evaluator.py`` uses, so the two public PR surfaces agree
    at threshold-exact IoUs (integer-coordinate boxes hit exactly 0.5
    routinely). Prediction rows without (good enough) groundtruth are
    FPs; groundtruth rows count toward the positives total (reference
    ``detection_evaluator.py:586-648``).

    >>> m = spark.createDataFrame(
    ...     [(1, 0, 100, 10, 0.8, 0.9),    # TP (iou > 0.5)
    ...      (1, 0, 101, None, None, 0.7), # FP
    ...      (1, 0, None, 11, None, None)],  # unmatched gt
    ...     "image_id long, category_id int, prediction_id long,"
    ...     " groundtruth_id long, iou double, confidence double")
    >>> out = precision_recall(m).orderBy(F.desc("confidence"))
    >>> [(r["precision"], r["recall"]) for r in out.collect()]
    [(1.0, 0.5), (0.5, 0.5)]
    """
    group_cols = group_cols or ["category_id"]
    preds = matches.filter(F.col("prediction_id").isNotNull()).withColumn(
        "is_tp",
        (F.col("groundtruth_id").isNotNull() & (F.col("iou") > min_iou)).cast(
            "int"
        ),
    )
    totals = (
        matches.filter(F.col("groundtruth_id").isNotNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("total_tp"))
    )
    curve = W.pr_curve(
        preds.join(totals, group_cols, "left").fillna({"total_tp": 0}),
        group_cols,
        confidence_col="confidence",
        is_tp_col="is_tp",
        total_positives_col="total_tp",
        tie_break="prediction_id",
    )
    return curve


def average_precision(
    pr: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """AP per group from a ``precision_recall`` frame."""
    group_cols = group_cols or ["category_id"]
    return W.average_precision(
        pr, group_cols, confidence_col="confidence", tie_break="prediction_id"
    )


def evaluate_detections(
    groundtruth: DataFrame,
    predictions: DataFrame,
    min_iou: float = 0.5,
) -> dict[str, DataFrame]:
    """End-to-end: matches → PR → AP (the reference evaluator's
    ``compute_precision_recall`` pipeline)."""
    from lours_spark.evaluation.matching import compute_matches

    matches = compute_matches(groundtruth, predictions)
    pr = precision_recall(matches, min_iou=min_iou)
    ap = average_precision(pr)
    return {"matches": matches, "pr": pr, "ap": ap}
