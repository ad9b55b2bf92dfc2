"""Confusion matrix over matched labels.

Re-expresses reference ``util.py:359-388`` + grouped apply at
``detection_evaluator.py:371-378``, replacing sklearn with
``groupBy(gt,pred).count()`` and a row-normalizing window — one shuffle,
no driver-side matrix assembly (the pivot to wide form is an optional
driver step since the matrix is ≤ |labels|² cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_counts(
    pairs: DataFrame,
    gt_col: str = "groundtruth_label",
    pred_col: str = "prediction_label",
    none_label: str = "None",
    normalize: bool = True,
) -> DataFrame:
    """Long-form confusion matrix: (gt, pred, count[, share]).

    Unmatched rows are represented with the ``none_label`` class, which
    the reference places last (``util.py:377-380``); share = count /
    row-total over the true class.

    >>> df = spark.createDataFrame(
    ...     [("cat", "cat"), ("cat", "dog"), ("dog", None)],
    ...     "groundtruth_label string, prediction_label string")
    >>> out = confusion_counts(df).orderBy("groundtruth_label",
    ...                                    "prediction_label")
    >>> [(r["groundtruth_label"], r["prediction_label"], r["count"],
    ...   r["share"]) for r in out.collect()]
    [('cat', 'cat', 1, 0.5), ('cat', 'dog', 1, 0.5), ('dog', 'None', 1, 1.0)]
    """
    df = pairs.select(
        F.coalesce(F.col(gt_col), F.lit(none_label)).alias("groundtruth_label"),
        F.coalesce(F.col(pred_col), F.lit(none_label)).alias("prediction_label"),
    )
    counts = df.groupBy("groundtruth_label", "prediction_label").agg(
        F.count(F.lit(1)).alias("count")
    )
    if normalize:
        w = Window.partitionBy("groundtruth_label")
        counts = counts.withColumn(
            "share", F.col("count").cast("double") / F.sum("count").over(w)
        )
    return counts


def confusion_matrix_pivot(counts: DataFrame) -> DataFrame:
    """Wide (pivoted) form — one row per groundtruth label. Label spaces
    are small; the pivot's distinct-value scan is bounded."""
    return (
        counts.groupBy("groundtruth_label")
        .pivot("prediction_label")
        .sum("count")
        .na.fill(0)
    )
