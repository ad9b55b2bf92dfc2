"""Pivot / unpivot of list columns ("booleanize" / "debooleanize").

Re-expresses reference ``lours/utils/column_booleanizer.py``:
``booleanize`` (``:7-95``) explodes an array column into one boolean
column per domain value named ``{col}.{value}``; ``debooleanize``
(``:204-256``) gathers them back into a sorted value array;
``broadcast_booleanization`` (``:98-160``) reconciles two frames before
a merge by filling missing bool columns with False.

Spark shape: ``array_contains`` per domain value — a narrow projection,
no explode, no shuffle. Domain discovery when not supplied is one
``explode → distinct`` aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_domain(df: DataFrame, column: str) -> list[str]:
    """Union of list values across the table (reference
    ``column_booleanizer.py:41-55`` domain-from-data path)."""
    rows = (
        df.select(F.explode_outer(F.col(f"`{column}`")).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .collect()
    )
    return sorted(r["v"] for r in rows)


def booleanize(
    df: DataFrame,
    column: str,
    domain: list[str] | None = None,
    drop_source: bool = True,
) -> tuple[DataFrame, list[str]]:
    """Expand array column → one bool column per domain value, columns
    named ``{column}.{value}`` (backtick-safe in Spark).

    >>> df = spark.createDataFrame([(1, ["a", "c"]), (2, ["b"])],
    ...                            "id long, tags array<string>")
    >>> out, domain = booleanize(df, "tags", domain=["a", "b", "c"])
    >>> sorted(out.columns)
    ['id', 'tags.a', 'tags.b', 'tags.c']
    >>> r = {row["id"]: (row["tags.a"], row["tags.b"], row["tags.c"])
    ...      for row in out.collect()}
    >>> r[1], r[2]
    ((True, False, True), (False, True, False))
    """
    domain = domain if domain is not None else discover_domain(df, column)
    out = df
    for v in domain:
        out = out.withColumn(
            f"{column}.{v}",
            # backticks: a flattened dot-NAMED source column (caipy
            # nested enums) must not be parsed as a struct path
            F.coalesce(
                F.array_contains(F.col(f"`{column}`"), v), F.lit(False)
            ),
        )
    if drop_source:
        out = out.drop(column)
    return out, domain


def debooleanize(
    df: DataFrame,
    prefix: str,
    drop_bool_columns: bool = True,
) -> DataFrame:
    """Inverse: gather ``prefix.*`` bool columns into a sorted array of
    the true values (reference ``column_booleanizer.py:204-256``).

    >>> df = spark.createDataFrame([(1, ["c", "a"])],
    ...                            "id long, tags array<string>")
    >>> out, dom = booleanize(df, "tags", domain=["a", "b", "c"])
    >>> debooleanize(out, "tags").first()["tags"]
    ['a', 'c']
    """
    bool_cols = get_bool_columns(df, prefix)
    if not bool_cols:
        raise ValueError(f"no booleanized columns with prefix {prefix!r}")
    values = F.filter(
        F.array(
            *[
                F.when(F.col(f"`{c}`"), F.lit(c[len(prefix) + 1 :]))
                for c in bool_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    out = df.withColumn(prefix, F.array_sort(values))
    if drop_bool_columns:
        out = out.drop(*bool_cols)
    return out


def get_bool_columns(df: DataFrame, prefix: str) -> list[str]:
    """Columns named ``prefix.*`` with boolean type (reference
    ``column_booleanizer.py:163-201``)."""
    return sorted(
        f.name
        for f in df.schema.fields
        if f.name.startswith(prefix + ".") and f.dataType.typeName() == "boolean"
    )


def broadcast_booleanization(
    a: DataFrame, b: DataFrame, prefix: str
) -> tuple[DataFrame, DataFrame]:
    """Pre-merge reconciliation: each side gains the other's missing
    ``prefix.*`` bool columns as False (reference
    ``column_booleanizer.py:98-160``)."""
    ca, cb = set(get_bool_columns(a, prefix)), set(get_bool_columns(b, prefix))
    for c in sorted(cb - ca):
        a = a.withColumn(c, F.lit(False))
    for c in sorted(ca - cb):
        b = b.withColumn(c, F.lit(False))
    return a, b
