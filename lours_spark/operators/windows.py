"""Window-shaped computations (the reference's pandas cumsum idioms).

Re-expresses the cumulative/scan patterns of the evaluation subsystem
(reference ``lours/evaluation/detection/util.py``):

- confidence-descending TP cumsum (``util.py:233-234``),
- monotone precision envelope (``util.py:271`` —
  ``np.maximum.accumulate`` reversed),
- AP via Δrecall (``util.py:316-321``),
- forward-fill onto a grid (``util.py:293-298``, ``:353-355``),
- sessionization (gap-based), the streaming-adjacent batch idiom.

All are single-pass ``pyspark.sql.Window`` scans: one shuffle on the
partition keys, then sorted in-partition evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    agg_col: Column,
    out_name: str = "cumsum",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_name, F.sum(agg_col).over(w))


def pr_curve(
    df: DataFrame,
    group_cols: list[str],
    confidence_col: str,
    is_tp_col: str,
    total_positives_col: str | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Precision/recall at every confidence cut, per group.

    Rows ordered by confidence descending;
    ``precision = cum_tp / rank``, ``recall = cum_tp / total_tp`` —
    the reference's cumsum construction (``util.py:225-240``).

    >>> df = spark.createDataFrame(
    ...     [("c", 0.9, 1), ("c", 0.7, 0), ("c", 0.5, 1)],
    ...     "g string, conf double, tp int")
    >>> out = pr_curve(df, ["g"], "conf", "tp").orderBy(F.desc("conf"))
    >>> [(r["precision"], r["recall"]) for r in out.collect()]
    [(1.0, 0.5), (0.5, 0.5), (0.6666666666666666, 1.0)]
    """
    order = [F.desc(confidence_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    out = (
        df.withColumn("cum_tp", F.sum(F.col(is_tp_col).cast("long")).over(w))
        .withColumn("rank", F.count(F.lit(1)).over(w))
        .withColumn(
            "total_tp",
            F.col(total_positives_col)
            if total_positives_col
            else F.sum(F.col(is_tp_col).cast("long")).over(w_all),
        )
        .withColumn("precision", F.col("cum_tp").cast("double") / F.col("rank"))
        .withColumn(
            "recall",
            F.when(
                F.col("total_tp") > 0,
                F.col("cum_tp").cast("double") / F.col("total_tp"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out


def collapse_confidence_ties(
    df: DataFrame,
    group_cols: list[str],
    confidence_col: str,
    tie_break: str | None = None,
) -> DataFrame:
    """Keep only the LAST row of each equal-confidence run — the
    reference's distinct-confidence collapse on the PR curve
    (``util.py:228-230`` via shifted comparison): at a tied confidence
    only the final cumulative point is a real operating point. Pass the
    SAME tie_break used to build the curve so "last" is well-defined."""
    order = [F.desc(confidence_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    nxt = F.lead(confidence_col).over(w)
    return df.withColumn("__next_conf", nxt).filter(
        F.col("__next_conf").isNull()
        | (F.col("__next_conf") != F.col(confidence_col))
    ).drop("__next_conf")


def interpolated_precision(
    df: DataFrame, group_cols: list[str], confidence_col: str
) -> DataFrame:
    """Monotone precision envelope: running max of precision from the
    low-confidence end (reference ``util.py:271``)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc(confidence_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("precision_interp", F.max("precision").over(w))


def average_precision(
    df: DataFrame,
    group_cols: list[str],
    recall_col: str = "recall",
    precision_col: str = "precision",
    confidence_col: str = "confidence",
    tie_break: str | None = None,
) -> DataFrame:
    """AP = Σ precision · Δrecall over the confidence-descending curve
    (reference ``util.py:302-321``), via ``lag``.

    Pass the SAME ``tie_break`` used to build the curve: without it the
    lag order is nondeterministic under tied confidences and AP varies
    run to run. (Collapsing ties first with
    ``collapse_confidence_ties`` is equivalent and also supported.)
    """
    order = [F.desc(confidence_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    delta = F.col(recall_col) - F.coalesce(
        F.lag(recall_col).over(w), F.lit(0.0)
    )
    return (
        df.withColumn("__d", delta)
        .groupBy(*group_cols)
        .agg(F.sum(F.col(precision_col) * F.col("__d")).alias("average_precision"))
    )


def forward_fill(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value_col: str,
    out_name: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward (reference's reindex+ffill onto
    a confidence grid, ``util.py:353-355``).

    >>> df = spark.createDataFrame(
    ...     [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0), ("a", 4, None)],
    ...     "g string, t long, v double")
    >>> out = forward_fill(df, ["g"], [F.col("t")], "v")
    >>> [r["v"] for r in out.orderBy("t").collect()]
    [10.0, 10.0, 30.0, 30.0]
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_name or value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def rolling_aggregate(
    df: DataFrame,
    by,
    ts_col: str,
    value_col: str,
    window: float,
    aggs: tuple[str, ...] = ("count", "sum", "min", "max"),
    prefix: str = "roll_",
) -> DataFrame:
    """Sliding time-window aggregates per key: for every row, the
    aggregate of ``value_col`` over rows of the same key whose event
    time lies in ``[t - window, t]`` (window in seconds for timestamp
    columns, column units otherwise). The time-series staple — "events
    in the last 24h per user" — that a groupBy cannot express (every
    row anchors its OWN window).

    A RANGE window frame, not ROWS: rows sharing one event time are
    frame peers and always aggregate together, so no tie-break is
    needed and the result is deterministic regardless of partitioning.

    Scale shape: ONE hash exchange on ``by`` + per-key sort, all
    aggregates evaluated in the same single window pass (Spark fuses
    same-frame window functions into one WindowExec). No self-join —
    the naive ``l JOIN r ON key AND r.t BETWEEN l.t-W AND l.t``
    materializes the pair blow-up this operator exists to avoid.

    >>> df = spark.createDataFrame(
    ...     [(1, 100, 1.0), (1, 150, 2.0), (1, 400, 4.0)],
    ...     "k long, t long, v double")
    >>> out = rolling_aggregate(df, "k", "t", "v", window=100)
    >>> [(r["t"], r["roll_count"], r["roll_sum"]) for r in
    ...  out.orderBy("t").collect()]
    [(100, 1, 1.0), (150, 2, 3.0), (400, 1, 4.0)]
    """
    from pyspark.sql.types import TimestampType

    keys = [by] if isinstance(by, str) else list(by)
    if isinstance(df.schema[ts_col].dataType, TimestampType):
        key = F.unix_micros(F.col(ts_col))
        span = int(window * 1_000_000)
    else:
        key = F.col(ts_col)
        # rangeBetween only accepts integer bounds; an integral float
        # (window=100.0) converts losslessly, a fractional one on an
        # integer event-time column cannot be expressed — fail with a
        # clear error instead of the opaque plan-build crash
        span = int(window)
        if span != window:
            raise ValueError(
                f"fractional window {window!r} on a numeric event-time "
                "column: rangeBetween takes integer bounds — rescale "
                f"the column (e.g. millis) or pass an integral window"
            )
    w = (
        Window.partitionBy(*keys)
        .orderBy(key)
        .rangeBetween(-span, Window.currentRow)
    )
    fns = {
        "count": lambda c: F.count(c),
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "mean": lambda c: F.avg(c),
    }
    unknown = [a for a in aggs if a not in fns]
    if unknown:
        raise ValueError(f"unsupported aggs: {unknown}")
    return df.withColumns(
        {f"{prefix}{a}": fns[a](F.col(value_col)).over(w) for a in aggs}
    )


def resample_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    grid: list[float],
) -> DataFrame:
    """Count-above-threshold curve on a fixed grid (reference
    ``resample_count`` ``util.py:324-356``: descending cumulative count
    reindexed+ffilled onto a confidence grid — equivalently, for each
    grid point t: #rows with value ≥ t).

    Implemented as one conditional aggregation per grid point (all in a
    single groupBy pass, codegen'd) then unpivoted — no join, no
    per-threshold scan. The window+as-of formulation is equivalent but
    costs a sort; this shape is the 100 TB-friendly one.

    >>> df = spark.createDataFrame(
    ...     [("a", 1.0), ("a", 2.5), ("a", 4.0)], "g string, v double")
    >>> out = resample_count(df, ["g"], "v", [0.0, 2.0, 4.0])
    >>> [(r["threshold"], r["count_at_least"])
    ...  for r in out.orderBy("threshold").collect()]
    [(0.0, 3), (2.0, 2), (4.0, 1)]
    """
    aggs = [
        F.count(F.when(F.col(value_col) >= t, 1)).alias(f"__c_{i}")
        for i, t in enumerate(grid)
    ]
    wide = df.groupBy(*group_cols).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"__c_{i}").alias("count_at_least"),
            )
            for i, t in enumerate(grid)
        ]
    )
    return (
        wide.select(*group_cols, F.explode(pairs).alias("__p"))
        .select(
            *group_cols,
            F.col("__p.threshold").alias("threshold"),
            F.col("__p.count_at_least").alias("count_at_least"),
        )
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_break: str | None = None,
) -> DataFrame:
    """Gap-based session ids: a new session starts when the previous
    event of the same user is more than ``gap_seconds`` older. Batch
    twin of the Structured Streaming session-window operator.

    Gap arithmetic is done in exact integer microseconds
    (``unix_micros``), never truncated/rounded seconds, so boundary
    decisions are deterministic and engine-independent. Pass
    ``tie_break`` (a unique column) so the ordering is a total order —
    required whenever two events of one user share a timestamp.

    >>> import datetime as dt
    >>> t0 = dt.datetime(2024, 1, 1)
    >>> df = spark.createDataFrame(
    ...     [(1, t0), (1, t0 + dt.timedelta(seconds=10)),
    ...      (1, t0 + dt.timedelta(seconds=2000))],
    ...     "user_id long, ts timestamp")
    >>> out = sessionize(df, gap_seconds=1800).orderBy("ts")
    >>> [r["session_seq"] for r in out.collect()]
    [1, 1, 2]
    """
    order = [F.asc(ts_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(int(gap_seconds) * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", new_session).withColumn(
        "session_seq", F.sum("__new").over(w_cum)
    ).drop("__new")
