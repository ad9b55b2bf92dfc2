"""Three-way dataset diff (left-only / right-only / common).

Re-expresses reference ``lours/utils/difftools.py:10-186``
(``Dataset.__sub__`` at ``dataset.py:2857-2861``): set operations on
image ids plus row-equality comparison where NaN == NaN.

Spark shape: a single full-outer join on ``id`` with per-column
null-safe equality (``<=>``) — one shuffle, fully parallel, instead of
the reference's driver-side index set algebra.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frame_diff(
    left: DataFrame, right: DataFrame, key: str = "id"
) -> DataFrame:
    """Tag every key as left_only / right_only / changed / common.

    Returns a DataFrame of (key, diff_status) using null-safe equality
    per shared column so NULL == NULL counts as equal (the reference's
    NaN==NaN semantics, ``difftools.py``).

    >>> l = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)],
    ...                           "id long, v string")
    >>> r = spark.createDataFrame([(2, "B"), (3, None), (4, "d")],
    ...                           "id long, v string")
    >>> out = frame_diff(l, r).orderBy("id")
    >>> [(row["id"], row["diff_status"]) for row in out.collect()]
    [(1, 'left_only'), (2, 'changed'), (3, 'common'), (4, 'right_only')]
    """
    shared = [c for c in left.columns if c in right.columns and c != key]
    # backtick-quote every reference: booleanized columns are FLAT
    # columns with dots in their names ("tags.a"), which an unquoted
    # f"l.{c}" would parse as a struct-field path
    l = left.select(key, *[left[f"`{c}`"] for c in shared]).alias("l")
    r = right.select(key, *[right[f"`{c}`"] for c in shared]).alias("r")
    joined = l.join(r, F.col(f"l.{key}") == F.col(f"r.{key}"), "full_outer")
    eq: Column = reduce(
        lambda acc, c: acc & F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`")),
        shared,
        F.lit(True),
    )
    status = (
        F.when(F.col(f"r.{key}").isNull(), F.lit("left_only"))
        .when(F.col(f"l.{key}").isNull(), F.lit("right_only"))
        .when(eq, F.lit("common"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key),
        status.alias("diff_status"),
    )


def dataset_diff(a, b) -> dict[str, DataFrame]:
    """Three-way diff of two SparkDatasets on the image table; images
    whose annotations changed are treated as changed (reference
    ``difftools.py``: annotations of changed images follow the image)."""
    img_status = frame_diff(a.images, b.images, key="id")

    # roll annotation-level changes up to the image: an image is changed
    # if its annotation multiset differs (compared on shared columns)
    shared = [
        c for c in a.annotations.columns if c in b.annotations.columns
    ]
    # dot-named (booleanized) columns need backticks; the rolled-up
    # hash aliases use an index so the alias itself stays dot-free
    def _ann_rollup(ann):
        return ann.select(*[ann[f"`{c}`"] for c in shared]).groupBy(
            "image_id"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.hash(F.col(f"`{c}`")).cast("long")).alias(f"h_{i}")
                for i, c in enumerate(shared)
                if c != "image_id"
            ],
        )

    la = _ann_rollup(a.annotations)
    lb = _ann_rollup(b.annotations)
    cols = [c for c in la.columns if c != "image_id"]
    ja = la.alias("la").join(
        lb.alias("lb"), F.col("la.image_id") == F.col("lb.image_id"), "full_outer"
    )
    ann_same = reduce(
        lambda acc, c: acc & F.col(f"la.{c}").eqNullSafe(F.col(f"lb.{c}")),
        cols,
        F.lit(True),
    )
    ann_status = ja.select(
        F.coalesce(F.col("la.image_id"), F.col("lb.image_id")).alias("id"),
        (~ann_same).alias("ann_changed"),
    )

    full = img_status.join(ann_status, "id", "left").withColumn(
        "diff_status",
        F.when(
            (F.col("diff_status") == "common")
            & F.coalesce(F.col("ann_changed"), F.lit(False)),
            F.lit("changed"),
        ).otherwise(F.col("diff_status")),
    ).select("id", "diff_status")

    def subset(df: DataFrame, statuses: list[str], source) -> DataFrame:
        keep = full.filter(F.col("diff_status").isin(statuses)).select("id")
        return df.join(keep, "id", "left_semi")

    return {
        "status": full,
        "left_only": subset(a.images, ["left_only"], a),
        "right_only": subset(b.images, ["right_only"], b),
        "common": subset(a.images, ["common"], a),
        "changed": subset(a.images.unionByName(
            b.images.join(a.images.select("id"), "id", "left_anti")
        ), ["changed"], a),
    }
