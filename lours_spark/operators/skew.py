"""Skew-mitigation utilities.

AQE's skew-join splitting handles most runtime skew; these helpers
cover the two shapes AQE cannot: aggregation hot keys (a single
reducer receiving a heavy-hitter group) and broadcast-side explosion.

``salted_aggregate`` is the classic two-phase shape: partial aggregate
on (key, salt) — spreading a hot key over ``salt_buckets`` reducers —
then final aggregate on key. Works for any algebraic aggregate
expressed as (partial, merge) pairs; the common count/sum/min/max are
provided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported algebraic aggregates: name → (partial fn, merge fn)
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is a list of (agg_name, column, output_alias) with
    agg_name in {count, sum, min, max}. A heavy-hitter group key is
    spread over ``salt_buckets`` partial groups before the final
    merge, so no single reducer sees the whole hot key.

    >>> df = spark.createDataFrame(
    ...     [("hot", 1.0)] * 50 + [("cold", 2.0)], "k string, v double")
    >>> out = salted_aggregate(df, ["k"], [("count", "v", "n"),
    ...                                    ("sum", "v", "s")])
    >>> sorted((r["k"], r["n"], r["s"]) for r in out.collect())
    [('cold', 1, 2.0), ('hot', 50, 50.0)]
    """
    salted = df.withColumn(
        "__salt", (F.rand() * salt_buckets).cast("int")
    )
    partials = []
    finals = []
    for name, col, alias in aggs:
        if name not in _ALGEBRAIC:
            raise ValueError(
                f"unsupported aggregate {name!r}; use one of {sorted(_ALGEBRAIC)}"
            )
        partial_fn, merge_fn = _ALGEBRAIC[name]
        partials.append(partial_fn(F.col(col)).alias(f"__p_{alias}"))
        finals.append(merge_fn(F.col(f"__p_{alias}")).alias(alias))
    stage1 = df_groupby = salted.groupBy(*group_cols, "__salt").agg(*partials)
    return stage1.groupBy(*group_cols).agg(*finals)


def top_keys(
    df: DataFrame, key_cols: list[str], n: int = 100
) -> DataFrame:
    """The heavy hitters: key frequencies, descending — the input to a
    decision to salt, broadcast, or isolate a key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(n)
    )
