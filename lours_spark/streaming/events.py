"""Structured Streaming pipelines over the events stream.

The reference has no streaming (its closest thing is a watch-folder CLI
re-exporter, ``lours/cli/caipy_to_fiftyone.py:27-262``); these are the
Spark-native streaming twins of the batch event operators in
``operators/windows.py`` — same logical queries, declared on
``readStream`` so Catalyst runs them incrementally:

- windowed rollup with a watermark for late data;
- streaming sessionization (session_window);
- the watch-folder semantic itself: a file-source stream over a
  directory of parquet/json drops.

All are testable offline with ``trigger(availableNow=True)`` + the
memory sink (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over a drop directory (the watch-folder
    semantic, Spark-native)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window rollup with late-data watermark — the streaming
    twin of ``suite.q_hourly_rollup``. State is bounded by the
    watermark: windows older than it are finalized and evicted.

    Offline end-to-end (file source → availableNow → memory sink):

    >>> import datetime as dt, os, tempfile
    >>> src, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    >>> t0 = dt.datetime(2024, 1, 1, 12, 10)
    >>> spark.createDataFrame(
    ...     [(1, t0, 7, "click", 2.0, "{}"),
    ...      (2, t0.replace(minute=50), 7, "click", 3.0, "{}")],
    ...     schema=EVENTS_SCHEMA).write.parquet(os.path.join(src, "d"))
    >>> stream = read_event_stream(spark, os.path.join(src, "d"))
    >>> run_available_now(hourly_rollup_stream(stream), "doc_rollup", ckpt)
    >>> spark.table("doc_rollup").select("n_events", "sum_value").first()
    Row(n_events=2, sum_value=5.0)
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users_approx",
        )
    )


def session_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session aggregation via ``session_window`` — the
    streaming twin of ``operators.windows.sessionize``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_event_stream(
    events: DataFrame,
    key_cols: "list[str] | None" = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators/dedup.exact_duplicates`` for at-least-once sources
    (replayed files, Kafka redeliveries): keep the first occurrence of
    each key, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark window are dropped, state for older keys is evicted, so
    the operator runs forever at constant memory)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running totals (event count, value sum) carried across
    micro-batches in explicit group state — the escape hatch for
    aggregations Structured Streaming's built-ins can't express
    (the reference has no streaming; this is the Spark-native pattern
    for its eager incremental recomputes)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def asof_enrich_stream(
    stream: DataFrame,
    static_dim: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Streaming point-in-time enrichment: every stream row gains the
    most recent ``static_dim`` row at-or-before its event time per
    ``by`` key — the feature-store as-of lookup applied during ingest.

    Structured Streaming cannot run the batch union-tag window
    (``operators/temporal.asof_join``) — event-time windows over a
    stream need watermark-bounded aggregation, and an unbounded as-of
    isn't one — so this takes the broadcast regime instead: the static
    side is collected ONCE, sorted by (time, payload) so equal-time
    rows resolve to the max payload (the batch operator's exact
    tie-break), broadcast, and each Arrow micro-batch merges against
    it in vectorized pandas (``merge_asof``). The static side must
    therefore fit in memory — the feature-table regime; for two big
    frames use the batch operator.

    Unmatched or null-time rows keep NULL payload; ``tolerance``
    (seconds for timestamps) bounds the match age exactly as in the
    batch twin.
    """
    import pandas as pd

    keys = [by]
    payload = [c for c in static_dim.columns if c not in keys]
    clash = [
        f"{c}{suffix}" for c in payload if f"{c}{suffix}" in stream.columns
    ]
    if clash:
        raise ValueError(f"suffixed static columns collide: {clash}")

    # na_position="first": Spark's struct max (the batch twin's
    # equal-time tie-break) orders NULL payload values FIRST, so a
    # NULL-bearing row loses the tie — pandas' default NaN-last sort
    # would instead make it win. Matching the sort keeps batch and
    # streaming twins bit-identical on equal-timestamp ties. (Remaining
    # caveat: pandas compares mixed-TYPE object columns by python
    # ordering, which has no Spark analog — same-typed payload columns,
    # the practical case, are exact.)
    static_pdf = (
        static_dim.filter(F.col(right_ts).isNotNull())
        .toPandas()
        .sort_values([right_ts] + [c for c in payload if c != right_ts],
                     kind="stable", na_position="first")
        .reset_index(drop=True)
    )
    is_ts = isinstance(stream.schema[left_ts].dataType, T.TimestampType)
    tol = (
        None
        if tolerance is None
        else (pd.Timedelta(seconds=tolerance) if is_ts else tolerance)
    )
    # suffix the payload columns ONCE before broadcasting: renaming in
    # the executor kernel copied the whole static frame per task —
    # for a feature table near the memory limit that doubles peak
    # memory on every micro-batch task for nothing
    static_pdf = static_pdf.rename(
        columns={c: f"{c}{suffix}" for c in payload}
    )
    b_static = stream.sparkSession.sparkContext.broadcast(static_pdf)

    out_schema = T.StructType(
        list(stream.schema.fields)
        + [
            T.StructField(f"{f.name}{suffix}", f.dataType)
            for f in static_dim.schema.fields
            if f.name not in keys
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def enrich(batches):
        right = b_static.value
        for pdf in batches:
            if not len(pdf):
                continue
            ok = pdf[pdf[left_ts].notna()].sort_values(left_ts, kind="stable")
            parts = []
            if len(ok):
                parts.append(
                    pd.merge_asof(
                        ok,
                        right,
                        left_on=left_ts,
                        right_on=f"{right_ts}{suffix}"
                        if right_ts in payload
                        else right_ts,
                        by=by,
                        direction="backward",
                        tolerance=tol,
                    )
                )
            bad = pdf[pdf[left_ts].isna()]
            if len(bad):
                parts.append(bad)
            yield pd.concat(parts, ignore_index=True).reindex(
                columns=out_cols
            )

    return stream.mapInPandas(enrich, out_schema)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain everything currently available into the in-memory sink
    (offline/test execution mode; table name = ``query_name``).

    ``output_mode="append"`` emits only watermark-finalized windows —
    the mode that exercises late-data DROP semantics (in complete mode
    a watermark bounds nothing)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
