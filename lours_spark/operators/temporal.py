"""Temporal joins: as-of (point-in-time) join and banded range join.

Two operators Spark's join syntax lacks but time-series / feature-store
pipelines need constantly (pandas ``merge_asof``; the reference library
has no temporal layer — this is part of the beyond-reference extension,
like ``operators/windows.py``'s forward_fill):

- :func:`asof_join` — for each left row, the single most recent right
  row at-or-before it (or at-or-after, ``direction="forward"``) per
  key, optionally bounded by a tolerance. NOT expressible as an
  equi-join; a naive theta-join + row_number explodes the pair space.
  Implemented as the union-tag trick: tag both sides, ONE hash
  exchange on the key, one per-key sort, and a running
  ``last(payload, ignorenulls=True)`` window — the matched payload
  rides along inline, so there is no second join to recombine. Cost
  at 100 TB: exactly the shuffle+sort a sort-merge join would pay,
  with zero pair blow-up and no Python.

- :func:`range_join` — all (left, right) pairs within a time band
  ``[lower, upper]`` per key. A naive ``ON l.k = r.k AND r.t BETWEEN
  ...`` degenerates to BroadcastNestedLoop / per-key cross products;
  instead right rows are bucketed by band width and left rows probe
  their (at most two) covering buckets — an equi-join on
  (key, bucket) that Catalyst shuffles or broadcasts like any other,
  then an exact band filter. Output is bounded by the true pair count
  plus the filtered neighbor-bucket candidates (≤2x scan).

Timestamps are compared in epoch MICROseconds (``unix_micros``);
numeric event-time columns are compared as-is, and ``tolerance`` /
``lower`` / ``upper`` are then in the column's own units (seconds for
timestamps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_RESERVED = ("__ak", "__side", "__r", "__p", "__bucket", "__lk", "__rk")


def _order_key(df: DataFrame, ts_col: str) -> Column:
    """Epoch-micros sort key for timestamps, the raw column otherwise."""
    if isinstance(df.schema[ts_col].dataType, TimestampType):
        return F.unix_micros(F.col(ts_col))
    return F.col(ts_col)


def _scale_bound(df: DataFrame, ts_col: str, bound: float) -> float:
    """tolerance/lower/upper in column units → sort-key units."""
    if isinstance(df.schema[ts_col].dataType, TimestampType):
        return float(bound) * 1_000_000.0
    return float(bound)


def _check_ts_kinds(left, left_ts, right, right_ts):
    """Both event-time columns must be the same KIND (timestamp vs
    numeric): a timestamp side compares in epoch micros while a
    numeric side compares raw — mixing them would silently join values
    six orders of magnitude apart."""
    lk = isinstance(left.schema[left_ts].dataType, TimestampType)
    rk = isinstance(right.schema[right_ts].dataType, TimestampType)
    if lk != rk:
        raise TypeError(
            f"event-time type mismatch: {left_ts} is "
            f"{left.schema[left_ts].dataType}, {right_ts} is "
            f"{right.schema[right_ts].dataType} — cast one side first"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by,
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    tolerance: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time join: every left row gains the payload of the
    single nearest right row in ``direction`` per ``by`` key —
    at-or-before (``"backward"``, the feature-store lookup) or
    at-or-after (``"forward"``). Unmatched left rows keep NULL payload
    (left-outer semantics, like pandas ``merge_asof``).

    ``tolerance`` (seconds for timestamp columns, column units
    otherwise) bounds the match age: a backward match older than
    ``left_ts - tolerance`` (resp. forward match beyond
    ``left_ts + tolerance``) is nulled out.

    Right rows with NULL event time are dropped; left rows with NULL
    event time survive unmatched. Ties — several right rows sharing
    one event time — resolve to the LARGEST payload struct (field
    order = right column order), a total order, so results are
    deterministic across partitionings and engines; right payload
    columns must therefore be orderable types (no maps).

    Returns all left columns plus every non-key right column renamed
    with ``suffix`` (including ``right_ts`` — the matched event time).

    Scale shape: one hash exchange on ``by`` + one per-key sort
    (window), payload carried inline — no recombination join, no pair
    explosion, no Python. A single very hot key serializes its
    window; pre-filter or split such keys upstream.

    >>> trades = spark.createDataFrame(
    ...     [(1, 10, "A"), (1, 25, "B")], "user long, t long, trade string")
    >>> quotes = spark.createDataFrame(
    ...     [(1, 8, 1.0), (1, 10, 2.0), (1, 30, 9.0)],
    ...     "user long, t long, px double")
    >>> [tuple(r) for r in asof_join(trades, quotes, "user", "t")
    ...  .orderBy("t").select("trade", "t_r", "px_r").collect()]
    [('A', 10, 2.0), ('B', 10, 2.0)]
    >>> asof_join(trades, quotes, "user", "t", direction="forward",
    ...     tolerance=3).orderBy("t").select("px_r").collect()
    [Row(px_r=2.0), Row(px_r=None)]
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_ts = left_ts if right_ts is None else right_ts
    keys = [by] if isinstance(by, str) else list(by)
    payload = [c for c in right.columns if c not in keys]
    clash = [f"{c}{suffix}" for c in payload if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")
    bad = [c for c in (*left.columns, *right.columns) if c in _RESERVED]
    if bad:
        raise ValueError(f"reserved column names in input: {bad}")
    _check_ts_kinds(left, left_ts, right, right_ts)

    l2 = left.select(
        "*",
        _order_key(left, left_ts).alias("__ak"),
        F.lit(1).alias("__side"),
    )
    # NULL-key right rows can never equal a left key (SQL join
    # semantics — Window.partitionBy would otherwise group NULLs
    # together and match them); NULL-key LEFT rows then sit alone in
    # the NULL partition and correctly get no match
    r_keys_ok = right
    for kcol in keys:
        r_keys_ok = r_keys_ok.filter(F.col(kcol).isNotNull())
    r2 = r_keys_ok.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        _order_key(right, right_ts).alias("__ak"),
        F.lit(0).alias("__side"),
        F.struct(
            _order_key(right, right_ts).alias("__rk"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        ).alias("__r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    # right rows sort before left at equal time (inclusive match);
    # nulls first in BOTH directions so a null-time left row sees no
    # right rows; equal-time right rows resolve to max payload struct
    order = (
        [F.asc_nulls_first("__ak")]
        if direction == "backward"
        else [F.desc_nulls_first("__ak")]
    ) + [F.asc("__side"), F.asc_nulls_first("__r")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # window over the FULL union (right rows must be in frame), then
    # keep the left rows
    picked = u.select(
        *left.columns,
        F.col("__ak"),
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__p"),
    ).filter(F.col("__side") == 1)

    valid = F.col("__p").isNotNull()
    if tolerance is not None:
        tol = _scale_bound(left, left_ts, tolerance)
        age = (
            F.col("__ak") - F.col("__p.__rk")
            if direction == "backward"
            else F.col("__p.__rk") - F.col("__ak")
        )
        valid = valid & (age <= tol)
    return picked.select(
        *left.columns,
        *[
            F.when(valid, F.col(f"__p.{c}{suffix}")).alias(f"{c}{suffix}")
            for c in payload
        ],
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    *,
    within: float | None = None,
) -> DataFrame:
    """Sequential conversion funnel: for each ``by`` key, the earliest
    completion of ``steps`` in order — step 1 anchors at the key's
    FIRST step-1 event; each later step matches its earliest
    at-or-after event of the right type, optionally within ``within``
    (seconds for timestamps) of the previous step. The product-
    analytics staple ("signup → click → purchase inside 7 days").

    Returns one row per key that performed step 1:
    ``by, step_1_ts .. step_k_ts, steps_completed`` — later columns
    NULL once the chain breaks (greedy earliest-match semantics, the
    standard funnel definition; ties at one timestamp count, distinct
    type frames keep a single event from matching twice). Steps must
    be DISTINCT types: a repeated step would match the previous
    step's own event (at-or-after is inclusive), so it is rejected.

    Built by composing k-1 forward :func:`asof_join` passes, each ONE
    hash exchange on the key over an already-filtered event-type
    frame — no self-join, no pair explosion; cost is k window scans.

    >>> e = spark.createDataFrame(
    ...     [(1, 10, "a"), (1, 20, "b"), (1, 90, "c"),
    ...      (2, 10, "a"), (2, 5, "b")],
    ...     "user_id long, ts long, event_type string")
    >>> rows = funnel(e, ["a", "b", "c"], within=60).orderBy("user_id")
    >>> [tuple(r) for r in rows.collect()]
    [(1, 10, 20, None, 2), (2, 10, None, None, 1)]
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct types: {steps}")

    def leg(i: int) -> DataFrame:
        return events.filter(F.col(type_col) == steps[i]).select(
            F.col(by), F.col(ts_col)
        )

    cur = leg(0).groupBy(by).agg(F.min(ts_col).alias("step_1_ts"))
    for i in range(1, len(steps)):
        prev = f"step_{i}_ts"
        this = f"step_{i + 1}_ts"
        cur = asof_join(
            cur.withColumnRenamed(prev, "__anchor"),
            leg(i).withColumnRenamed(ts_col, "__t"),
            by,
            "__anchor",
            "__t",
            direction="forward",
            tolerance=within,
            suffix="_m",
        ).select(
            *[c for c in cur.columns if c != prev],
            F.col("__anchor").alias(prev),
            F.col("__t_m").alias(this),
        )
    order = [f"step_{i + 1}_ts" for i in range(len(steps))]
    completed = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in order
    )
    return cur.select(by, *order, completed.alias("steps_completed"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    by,
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    lower: float,
    upper: float,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with equal ``by`` key and right event
    time inside ``[left_ts + lower, left_ts + upper]`` (bounds in
    seconds for timestamps, column units otherwise; ``lower`` is
    usually negative). Inner-join semantics: unmatched rows vanish.

    Scale shape: right rows land in buckets of the band width; each
    left row probes its at most TWO covering buckets (explode of a
    2-element array — the only fan-out, bounded and constant), then an
    equi-join on (key, bucket) + exact band filter. Catalyst treats
    the bucket join like any equi-join — broadcast when small, shuffle
    otherwise — where the naive inequality join falls back to
    per-key cross products.

    >>> a = spark.createDataFrame([(1, 100, "x")], "k long, t long, a string")
    >>> b = spark.createDataFrame(
    ...     [(1, 95, "p"), (1, 160, "q"), (2, 100, "z")],
    ...     "k long, t long, b string")
    >>> sorted((r["b_r"], r["t_r"]) for r in
    ...        range_join(a, b, "k", "t", lower=-10, upper=60).collect())
    [('p', 95), ('q', 160)]
    """
    if not upper > lower:
        raise ValueError(f"need upper > lower, got [{lower}, {upper}]")
    right_ts = left_ts if right_ts is None else right_ts
    keys = [by] if isinstance(by, str) else list(by)
    payload = [c for c in right.columns if c not in keys]
    clash = [f"{c}{suffix}" for c in payload if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")
    bad = [c for c in (*left.columns, *right.columns) if c in _RESERVED]
    if bad:
        raise ValueError(f"reserved column names in input: {bad}")
    _check_ts_kinds(left, left_ts, right, right_ts)

    lo = _scale_bound(left, left_ts, lower)
    hi = _scale_bound(left, left_ts, upper)
    width = hi - lo

    lk = _order_key(left, left_ts)
    rk = _order_key(right, right_ts)
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.floor(rk / width).alias("__bucket"),
        rk.alias("__rk"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l2 = (
        left.filter(F.col(left_ts).isNotNull())
        .withColumn("__lk", lk)
        .withColumn(
            "__bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor((F.col("__lk") + F.lit(lo)) / width),
                        F.floor((F.col("__lk") + F.lit(hi)) / width),
                    )
                )
            ),
        )
    )
    return (
        l2.join(r2, [*keys, "__bucket"])
        .filter(
            F.col("__rk").between(
                F.col("__lk") + F.lit(lo), F.col("__lk") + F.lit(hi)
            )
        )
        .select(
            *left.columns, *[f"{c}{suffix}" for c in payload]
        )
    )
