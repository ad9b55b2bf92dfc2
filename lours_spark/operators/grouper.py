"""Group specification system: plain, parent-table, and binned groups.

Re-expresses reference ``lours/utils/grouper.py:13-361``:

- a group is a plain column, a column fetched from the parent (image)
  table via the FK (``grouper.py:252-257``), or a ``ContinuousGroup``
  that bins a numeric column (pd.cut/qcut semantics: equal-width or
  quantile bins, optional log spacing — ``grouper.py:106-187``);
- bin labels are the interval midpoint (what the splitter consumes,
  ``dataset_splitter.py:382-384``).

Spark shape: parent-table groups are an equi-join (broadcast-eligible);
equal-width bins are one min/max agg + a ``width_bucket`` expression;
quantile bins use ``approxQuantile`` (driver gets B+1 edges, rows get a
``when``-ladder / width_bucket on edges). Binning a 100 TB column costs
one agg + one narrow projection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ContinuousGroup:
    """Binned numeric group spec (reference ``grouper.py:106``)."""

    column: str
    bins: int = 10
    qcut: bool = False  # quantile bins instead of equal-width
    log: bool = False  # log-spaced edges
    label: str = "mid"  # "mid" interval midpoint | "left" | "right"


def bin_edges(
    df: DataFrame, spec: ContinuousGroup, relative_error: float = 1e-4
) -> list[float]:
    """Compute bin edges: quantile (approxQuantile) or equal-width
    (min/max agg, optionally in log space).

    >>> df = spark.createDataFrame([(float(v),) for v in range(11)],
    ...                            "x double")
    >>> bin_edges(df, ContinuousGroup("x", bins=2))
    [0.0, 5.0, 10.0]
    """
    if spec.qcut:
        qs = [i / spec.bins for i in range(spec.bins + 1)]
        edges = df.approxQuantile(spec.column, qs, relative_error)
    else:
        row = df.agg(
            F.min(spec.column).alias("lo"), F.max(spec.column).alias("hi")
        ).collect()[0]
        lo, hi = float(row["lo"]), float(row["hi"])
        if spec.log:
            if lo <= 0:
                raise ValueError("log bins need a strictly positive column")
            llo, lhi = math.log10(lo), math.log10(hi)
            edges = [
                10 ** (llo + (lhi - llo) * i / spec.bins)
                for i in range(spec.bins + 1)
            ]
        else:
            edges = [
                lo + (hi - lo) * i / spec.bins for i in range(spec.bins + 1)
            ]
    # dedupe degenerate edges (constant columns / repeated quantiles)
    out = [edges[0]]
    for e in edges[1:]:
        if e > out[-1]:
            out.append(e)
    return out


def bin_column(edges: list[float], spec: ContinuousGroup) -> Column:
    """The binning expression: a when-ladder over explicit edges with
    pd.cut(+include_lowest) semantics — right-closed intervals
    ``(e_i, e_{i+1}]``, the first interval closed on both ends
    ``[e_0, e_1]`` — and out-of-range → NULL. A value landing exactly
    on an interior edge therefore falls in the LOWER bin, matching the
    reference's ``pandas.cut`` (reference ``grouper.py:106-187``).

    >>> df = spark.createDataFrame([(0.0,), (4.9,), (5.0,), (10.0,), (11.0,)],
    ...                            "x double")
    >>> spec = ContinuousGroup("x", bins=2, label="mid")
    >>> col = bin_column([0.0, 5.0, 10.0], spec)
    >>> [r["b"] for r in df.select(col.alias("b")).collect()]
    [2.5, 2.5, 2.5, 7.5, None]
    """
    c = F.col(spec.column).cast("double")
    # width_bucket assumes uniform spacing; explicit (possibly
    # non-uniform) edges take a when-ladder — bins are few by design
    expr = None
    n = len(edges) - 1
    for i in range(n):
        lo_ok = c >= edges[i] if i == 0 else c > edges[i]
        cond = lo_ok & (c <= edges[i + 1])
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    idx = expr.otherwise(F.lit(None))

    labels = {
        "mid": [(edges[i] + edges[i + 1]) / 2 for i in range(n)],
        "left": edges[:-1],
        "right": edges[1:],
    }[spec.label]
    lab = None
    for i, v in enumerate(labels):
        lab = F.when(idx == i, v) if lab is None else lab.when(idx == i, v)
    return lab.otherwise(F.lit(None))


def group_relational_data(
    annotations: DataFrame,
    groups: list,
    images: DataFrame | None = None,
) -> tuple[DataFrame, list[str]]:
    """Resolve group specs into concrete columns on the annotation
    table (reference ``group_relational_data`` ``grouper.py:311``).

    Strings name columns — looked up on annotations first, then on the
    parent image table (joined in via the FK, broadcast-eligible);
    ContinuousGroup specs become binned label columns.
    """
    df = annotations
    out_cols: list[str] = []
    joined_parent = False
    for g in groups:
        if isinstance(g, ContinuousGroup):
            src_df = df
            if g.column not in df.columns:
                if images is None or g.column not in images.columns:
                    raise ValueError(f"unknown group column {g.column!r}")
                if not joined_parent:
                    df = _join_parent(df, images)
                    joined_parent = True
            edges = bin_edges(df, g)
            name = f"{g.column}_bin"
            df = df.withColumn(name, bin_column(edges, g))
            out_cols.append(name)
        elif isinstance(g, str):
            if g in df.columns:
                out_cols.append(g)
            elif images is not None and g in images.columns:
                if not joined_parent:
                    df = _join_parent(df, images)
                    joined_parent = True
                out_cols.append(g)
            else:
                raise ValueError(f"unknown group column {g!r}")
        else:
            raise TypeError(f"bad group spec: {g!r}")
    return df, out_cols


def _join_parent(annotations: DataFrame, images: DataFrame) -> DataFrame:
    extra = [
        c for c in images.columns if c != "id" and c not in annotations.columns
    ]
    parent = images.select(F.col("id").alias("__pid"), *extra)
    return annotations.join(
        parent, annotations.image_id == F.col("__pid"), "left"
    ).drop("__pid")
