"""Crowd-counting error statistics.

Re-expresses reference ``crowd_detection_evaluator.py:24-236``: per-image
groundtruth counts vs prediction counts above a confidence threshold,
then error aggregates (MAE, RMSE, MRE, RMSRE, std, quantiles) — all
built-in Spark aggregations (``percentile`` exact when oracle parity is
needed, ``percentile_approx`` at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_image_counts(
    groundtruth: DataFrame,
    predictions: DataFrame,
    confidence_threshold: float = 0.5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """gt count ⟗ pred count per image (full outer, zero-filled —
    reference ``crowd_detection_evaluator.py:193``)."""
    group_cols = group_cols or []
    gt = groundtruth.groupBy("image_id", *group_cols).agg(
        F.count(F.lit(1)).alias("gt_count")
    )
    conf = (
        F.col("confidence")
        if "confidence" in predictions.columns
        else F.lit(1.0)
    )
    pred = (
        predictions.filter(conf >= confidence_threshold)
        .groupBy("image_id", *group_cols)
        .agg(F.count(F.lit(1)).alias("pred_count"))
    )
    return (
        gt.join(pred, ["image_id", *group_cols], "full_outer")
        .fillna({"gt_count": 0, "pred_count": 0})
        .withColumn("error", F.col("pred_count") - F.col("gt_count"))
    )


def count_error_stats(
    counts: DataFrame,
    group_cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact_quantiles: bool = True,
) -> DataFrame:
    """MAE / RMSE / MRE / RMSRE / std / quantiles of the count error
    (reference ``crowd_detection_evaluator.py:207-232``)."""
    group_cols = group_cols or []
    err = F.col("error").cast("double")
    rel = F.when(
        F.col("gt_count") > 0, err / F.col("gt_count")
    ).otherwise(F.lit(None))
    qfun = F.percentile if exact_quantiles else F.percentile_approx
    aggs = [
        F.count(F.lit(1)).alias("n_images"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(F.abs(rel)).alias("mre"),
        F.sqrt(F.avg(rel * rel)).alias("rmsre"),
        F.stddev_samp(err).alias("error_std"),
    ]
    for q in quantiles:
        aggs.append(qfun(err, F.lit(q)).alias(f"error_q{int(q * 100)}"))
    if group_cols:
        return counts.groupBy(*group_cols).agg(*aggs)
    return counts.agg(*aggs)
