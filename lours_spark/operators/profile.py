"""Table profiling: the first pass a pipeline runs on an unfamiliar
dump — per-column counts, null rates, range, moments, exact/approx
quantiles and distinct counts, long-form (one row per column) so the
report is join-able and diffable between dumps.

Spark shape: ONE aggregation over the table computes every metric for
every profiled column (a single wide agg — map-side partial, one
exchange of one row); the long form is produced by unpivoting the
1-row wide result with a literal explode, which costs nothing. Exact
``percentile`` keeps the gate oracle-checkable; pass
``approximate=True`` to swap in ``percentile_approx`` /
``approx_count_distinct`` for the 100 TB run (same output schema,
bounded memory regardless of cardinality).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quantiles the profile reports
_QS = (0.5, 0.9, 0.99)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Long-form numeric profile: one row per column with
    ``(column, n, n_null, distinct, min, max, mean, p50, p90, p99)``.

    ``columns`` defaults to every numeric column. ``approximate``
    swaps exact percentile/countDistinct for their sketch forms —
    the scale setting (exact percentile materializes per-group value
    multisets; the sketches are fixed-size).

    >>> df = spark.createDataFrame([(1, 2.0), (2, None), (3, 4.0)],
    ...                            "k long, v double")
    >>> r = {row["column"]: row for row in profile_table(df).collect()}
    >>> (r["v"]["n"], r["v"]["n_null"], r["v"]["min"], r["v"]["max"])
    (2, 1, 2.0, 4.0)
    """
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "double", "float", "short", "decimal", "byte")
    }
    cols = [c for c in (columns or sorted(numeric)) if c in numeric]
    if not cols:
        raise ValueError("no numeric columns to profile")

    def q(c: str, p: float):
        if approximate:
            return F.percentile_approx(F.col(c), p)
        return F.percentile(F.col(c), p)

    def nd(c: str):
        if approximate:
            return F.approx_count_distinct(F.col(c))
        return F.countDistinct(F.col(c))

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__{c}__n"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nnull"),
            nd(c).cast("long").alias(f"__{c}__distinct"),
            F.min(F.col(c)).cast("double").alias(f"__{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"__{c}__max"),
            F.avg(F.col(c)).alias(f"__{c}__mean"),
            *[
                q(c, p).cast("double").alias(f"__{c}__p{int(p * 100)}")
                for p in _QS
            ],
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__{c}__n").cast("long").alias("n"),
                F.col(f"__{c}__nnull").cast("long").alias("n_null"),
                F.col(f"__{c}__distinct").alias("distinct"),
                F.col(f"__{c}__min").alias("min"),
                F.col(f"__{c}__max").alias("max"),
                F.col(f"__{c}__mean").alias("mean"),
                *[
                    F.col(f"__{c}__p{int(p * 100)}").alias(f"p{int(p * 100)}")
                    for p in _QS
                ],
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("__r")).select("__r.*")
