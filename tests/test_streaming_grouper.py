from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.operators.appender import (
    AnnotationAppender,
    add_detection_annotation,
)
from lours_spark.operators.grouper import (
    ContinuousGroup,
    bin_edges,
    group_relational_data,
)


def test_streaming_hourly_rollup(spark, tmp_path):
    import datetime as dt

    from lours_spark.streaming.events import (
        hourly_rollup_stream,
        read_event_stream,
        run_available_now,
    )

    base = dt.datetime(2024, 1, 1, 10, 15)
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 1, "click", 2.0, "{}"),
        (3, base + dt.timedelta(hours=1), 2, "view", 3.0, "{}"),
    ]
    src = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    data_dir = str(tmp_path / "stream_in")
    src.write.parquet(data_dir)

    stream = read_event_stream(spark, data_dir)
    assert stream.isStreaming
    rollup = hourly_rollup_stream(stream)
    run_available_now(rollup, "rollup_test", str(tmp_path / "ckpt"))
    out = {
        (r["hour"].hour, r["event_type"]): r["n_events"]
        for r in spark.table("rollup_test").collect()
    }
    assert out[(10, "click")] == 2
    assert out[(11, "view")] == 1


def test_streaming_curation_operators_unchanged(spark, tmp_path):
    """The curation operators are stateless column transforms, so the
    SAME functions run over a Structured Streaming source untouched —
    unified batch/stream: pii_signals + quality/language columns on a
    file stream, drained with availableNow."""
    from pyspark.sql import functions as F

    from lours_spark.functions.text import language_id, quality_score
    from lours_spark.operators.pii import pii_signals, redact_pii

    rows = [
        (1, "the quick brown fox and the lazy dog went to the market"),
        (2, "email me at a@b.co from 10.1.2.3"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    data_dir = str(tmp_path / "docs_in")
    src.write.parquet(data_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(data_dir)
    )
    assert stream.isStreaming
    out = pii_signals(stream).join(
        stream.select(
            "doc_id",
            language_id(F.col("text")).alias("lang_pred"),
            quality_score(F.col("text")).alias("quality"),
            redact_pii(F.col("text")).alias("redacted"),
        ),
        "doc_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curation_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.table("curation_stream").collect()}
    assert got[1]["n_email"] == 0 and got[1]["lang_pred"] == "en"
    assert got[2]["n_email"] == 1 and got[2]["n_ipv4"] == 1
    assert got[2]["redacted"] == "email me at [EMAIL] from [IP]"


def test_streaming_sessions(spark, tmp_path):
    import datetime as dt

    from lours_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        session_stream,
    )

    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (3, base + dt.timedelta(hours=3), 1, "click", 1.0, "{}"),
    ]
    src = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    data_dir = str(tmp_path / "sess_in")
    src.write.parquet(data_dir)
    sessions = session_stream(read_event_stream(spark, data_dir))
    run_available_now(sessions, "session_test", str(tmp_path / "ckpt2"))
    rows = spark.table("session_test").collect()
    assert len(rows) == 2  # two sessions for user 1
    assert sorted(r["n_events"] for r in rows) == [1, 2]


def test_add_detection_annotation(tiny_dataset):
    n0 = tiny_dataset.annotations.count()
    max_id = tiny_dataset.annotations.agg(F.max("id")).collect()[0][0]
    out = add_detection_annotation(
        tiny_dataset,
        image_id=[0, 1],
        category_id=1,  # scalar broadcast over 2 rows
        bbox=[[1.0, 2.0, 10.0, 10.0], [3.0, 4.0, 5.0, 5.0]],
        confidence=0.5,
    )
    assert out.annotations.count() == n0 + 2
    new_rows = out.annotations.filter(F.col("id") > max_id).collect()
    assert len(new_rows) == 2
    assert all(r["category_id"] == 1 for r in new_rows)
    assert all(r["confidence"] == 0.5 for r in new_rows)
    assert {r["area"] for r in new_rows} == {100.0, 25.0}
    assert all(r["category_str"] == "car" for r in new_rows)


def test_annotation_appender_context(tiny_dataset):
    n0 = tiny_dataset.annotations.count()
    with AnnotationAppender(tiny_dataset) as app:
        app.append(image_id=0, category_id=2, bbox=[1.0, 1.0, 5.0, 5.0])
        app.append(image_id=1, category_id=7, bbox=[2.0, 2.0, 6.0, 6.0])
    assert app.result.annotations.count() == n0 + 2
    assert app.result.check()["duplicate_annotation_ids"] == 0


def test_bin_edges_and_groups(spark):
    df = spark.range(1000).select(
        F.col("id").cast("long").alias("image_id"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    spec = ContinuousGroup("v", bins=4)
    edges = bin_edges(df, spec)
    assert edges[0] == 0.0 and edges[-1] == 99.0
    out, cols = group_relational_data(df, [spec])
    assert cols == ["v_bin"]
    labels = {r["v_bin"] for r in out.select("v_bin").distinct().collect()}
    assert len(labels) == 4  # four midpoints


def test_bin_column_matches_pandas_cut(spark):
    """Interior-edge values must land in the LOWER bin — pd.cut is
    right-closed and the reference bins with pandas.cut (ADVICE r4)."""
    import pandas as pd

    from lours_spark.operators.grouper import bin_column

    edges = [0.0, 5.0, 10.0, 15.0]
    vals = [0.0, 2.5, 5.0, 5.1, 10.0, 14.9, 15.0, 16.0, -1.0]
    # labels=False → integer bin codes; pandas nudges the first
    # breakpoint for include_lowest, so mids are computed from the
    # unadjusted edges rather than taken off the Interval objects
    codes = pd.cut(pd.Series(vals), bins=edges, include_lowest=True, labels=False)
    want = [
        None if pd.isna(c) else (edges[int(c)] + edges[int(c) + 1]) / 2
        for c in codes
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    spec = ContinuousGroup("x", bins=3, label="mid")
    got = [
        r["b"]
        for r in df.select(bin_column(edges, spec).alias("b")).collect()
    ]
    assert got == [None if w is None else pytest.approx(float(w)) for w in want]


def test_qcut_bins(spark):
    df = spark.range(1000).select((F.col("id") % 10).cast("double").alias("v"))
    spec = ContinuousGroup("v", bins=2, qcut=True)
    edges = bin_edges(df, spec)
    assert len(edges) >= 2


def test_parent_table_group(tiny_dataset):
    out, cols = group_relational_data(
        tiny_dataset.annotations,
        ["camera_id"],  # lives on the image table
        images=tiny_dataset.images,
    )
    assert cols == ["camera_id"]
    assert out.filter(F.col("camera_id").isNull()).count() == 0
    assert out.count() == tiny_dataset.annotations.count()


def test_group_with_continuous_parent(tiny_dataset):
    out, cols = group_relational_data(
        tiny_dataset.annotations,
        [ContinuousGroup("box_width", bins=3), "camera_id"],
        images=tiny_dataset.images,
    )
    assert set(cols) == {"box_width_bin", "camera_id"}


def test_stateful_user_totals_across_batches(spark, tmp_path):
    import datetime as dt

    from lours_spark.streaming.events import (
        read_event_stream,
        stateful_user_totals,
    )

    base = dt.datetime(2024, 1, 1)
    # two files → two micro-batches with maxFilesPerTrigger=1; state
    # must carry user 1's count across them
    spark.createDataFrame(
        [(1, base, 1, "click", 1.0, "{}"), (2, base, 2, "view", 2.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "in" / "f1"))
    spark.createDataFrame(
        [(3, base, 1, "click", 5.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "in" / "f2"))

    stream = read_event_stream(spark, str(tmp_path / "in" / "*"))
    stream = stream.repartition(2, "user_id")
    totals = stateful_user_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("user_totals").collect()
    # last update per user wins
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (2, 6.0)
    assert latest[2] == (1, 2.0)


def test_caipy_watcher_incremental(spark, tmp_path):
    """Streaming twin of the reference CLI watcher: new caipy files are
    picked up incrementally and exactly once across restarts."""
    import json as _json

    from lours_spark.streaming.caipy_watch import watch_caipy

    d = tmp_path / "ds" / "Annotations" / "train"
    d.mkdir(parents=True)

    def doc(i):
        return {
            "image": {"id": i, "file_name": f"{i}.jpg", "width": 10, "height": 10},
            "annotations": [
                {"id": i * 10, "category_id": 1, "bbox": [1.0, 1.0, 2.0, 2.0]}
            ],
        }

    (d / "0.json").write_text(_json.dumps(doc(0)))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = watch_caipy(spark, str(tmp_path / "ds"), out, ckpt, available_now=True)
    q.awaitTermination()
    assert spark.read.parquet(out + "/images").count() == 1

    # second batch: only the NEW file is processed (checkpointed source)
    (d / "1.json").write_text(_json.dumps(doc(1)))
    q = watch_caipy(spark, str(tmp_path / "ds"), out, ckpt, available_now=True)
    q.awaitTermination()
    imgs = spark.read.parquet(out + "/images")
    assert imgs.count() == 2
    assert {r.id for r in imgs.collect()} == {0, 1}
    anns = spark.read.parquet(out + "/annotations")
    assert {r.id for r in anns.collect()} == {0, 10}
    assert {r.split for r in anns.collect()} == {"train"}


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append-mode rollup across two availableNow drains of one
    checkpointed query: a window is finalized once the watermark passes
    its end; an event arriving after that is DROPPED, not merged — the
    bounded-state guarantee that makes the rollup runnable forever at
    scale. (File sink: the memory sink cannot resume a checkpoint.)"""
    import datetime as dt

    from lours_spark.streaming.events import (
        hourly_rollup_stream,
        read_event_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    base = dt.datetime(2024, 1, 1, 10, 15)
    data_dir = tmp_path / "late_in"
    data_dir.mkdir()
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def drain():
        q = (
            hourly_rollup_stream(
                read_event_stream(spark, str(data_dir / "*"))
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["hour"].hour, r["event_type"]): r["n_events"]
            for r in spark.read.parquet(out_dir).collect()
        }

    # batch 1: two clicks in [10, 11) + one view at 14:00 that pushes
    # the watermark (2h) to 12:00, finalizing the 10-11 window
    spark.createDataFrame(
        [
            (1, base, 1, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=10), 1, "click", 2.0, "{}"),
            (3, base.replace(hour=14, minute=0), 2, "view", 3.0, "{}"),
        ],
        schema,
    ).write.parquet(str(data_dir / "f1"))
    r1 = drain()
    assert r1[(10, "click")] == 2  # finalized with exactly the on-time rows
    assert (14, "view") not in r1  # its window is still open

    # batch 2: a LATE click at 10:40 (behind the 12:00 watermark —
    # must be dropped) + a 17:00 click that finalizes the 14-15 window
    spark.createDataFrame(
        [
            (4, base.replace(minute=40), 1, "click", 9.0, "{}"),
            (5, base.replace(hour=17, minute=0), 1, "click", 1.0, "{}"),
        ],
        schema,
    ).write.parquet(str(data_dir / "f2"))
    r2 = drain()
    # the closed window neither re-emits nor absorbs the late event
    assert r2[(10, "click")] == 2
    assert r2[(14, "view")] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed event ids inside the watermark window are dropped —
    at-least-once sources become effectively-once downstream."""
    import datetime as dt

    from lours_spark.streaming.events import (
        dedup_event_stream,
        read_event_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    base = dt.datetime(2024, 1, 1, 10, 0)
    data_dir = tmp_path / "dedup_in"
    data_dir.mkdir()
    # event 1 delivered twice (redelivery), event 2 once
    spark.createDataFrame(
        [
            (1, base, 1, "click", 1.0, "{}"),
            (1, base, 1, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=1), 1, "view", 2.0, "{}"),
        ],
        schema,
    ).write.parquet(str(data_dir / "f1"))
    out = dedup_event_stream(read_event_stream(spark, str(data_dir / "*")))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("dedup_stream").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_streaming_document_curation_cross_batch_dedup(spark, tmp_path):
    """The incremental-ingestion twin: two parquet drops processed
    exactly once each; a doc whose text already arrived in drop 1 is
    dropped in drop 2 (cross-batch fingerprint state), quality filter
    and PII redaction apply per batch, and a restarted stream with the
    same checkpoint reprocesses nothing."""
    import os

    from lours_spark.streaming.documents import (
        curate_document_stream,
        read_document_stream,
    )

    good = ("word " * 30).strip() + " the and is contact"
    rows1 = [
        (1, good + " one x@y.example.com", "en", "web", 100),
        (2, "short", "en", "web", 5),  # fails the quality floor
        (3, good + " three", "en", "web", 100),
    ]
    rows2 = [
        (4, good + " one x@y.example.com", "en", "web", 100),  # dup of 1
        (5, good + " five", "en", "web", 100),
        # same text as doc 1 EXCEPT the email address: raw-text
        # fingerprints differ, so BOTH survive (dedup runs before
        # redaction — batch-pipeline parity; fingerprinting redacted
        # text would merge them)
        (6, good + " one a@b.example.com", "en", "web", 100),
    ]
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def drop(rows, name):
        # one PLAIN parquet file at the drop-dir top level (the file
        # source does not walk nested spark-output directories)
        import glob
        import shutil

        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, name + ".parquet"))

    out_dir = str(tmp_path / "curated_out")

    def run(_name):
        # real parquet sink + fixed checkpoint: restart recovery and
        # exactly-once delivery are part of what's under test (the
        # memory sink does not support checkpoint recovery)
        stream = read_document_stream(spark, drop_dir)
        curated = curate_document_stream(stream, quality_min_score=0.5)
        q = (
            curated.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).collect()

    drop(rows1, "batch1")
    got1 = run("cur1")
    assert sorted(r["doc_id"] for r in got1) == [1, 3]
    assert all("x@y.example.com" not in r["text"] for r in got1)
    assert any("[EMAIL]" in r["text"] for r in got1)

    drop(rows2, "batch2")
    got2 = run("cur2")
    # cumulative sink gains ONLY the new drop's survivors: doc 4's
    # text was already seen in batch 1 (cross-batch dedup state);
    # doc 6 differs from doc 1 only in its PII and survives
    assert sorted(r["doc_id"] for r in got2) == [1, 3, 5, 6]

    # exactly-once: nothing new in the drop dir → nothing re-emitted
    got3 = run("cur3")
    assert sorted(r["doc_id"] for r in got3) == [1, 3, 5, 6]


def test_streaming_document_dedup_bounded_state(spark, tmp_path):
    """ts_col + dedup_within switches to dropDuplicatesWithinWatermark:
    duplicates inside the window are still caught, and the plan carries
    the watermark (bounded state for infinite ingest)."""
    import datetime as dt
    import glob
    import os
    import shutil

    from lours_spark.streaming.documents import curate_document_stream

    base = dt.datetime(2024, 1, 1, 12, 0)
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, ts timestamp"
    )
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    rows = [
        (1, "alpha beta gamma", "en", "web", 20, base),
        (2, "alpha beta gamma", "en", "web", 20, base + dt.timedelta(minutes=5)),
        (3, "something else entirely", "en", "web", 25, base),
    ]
    stage = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
    shutil.move(
        glob.glob(stage + "/part-*.parquet")[0],
        os.path.join(drop_dir, "b1.parquet"),
    )
    stream = spark.readStream.schema(schema).parquet(drop_dir)
    curated = curate_document_stream(
        stream, redact=False, ts_col="ts", dedup_within="1 hour"
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("bounded_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.table("bounded_dedup").collect()
    )
    assert got in ([1, 3], [2, 3])  # one survivor per fingerprint
    analyzed = curated._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in analyzed  # state is watermark-bounded


def test_streaming_asof_enrich_matches_batch(spark, tmp_path):
    """asof_enrich_stream (broadcast merge_asof per micro-batch) must
    produce exactly the batch asof_join's answer — including the
    max-payload tie-break and the tolerance null-out."""
    import datetime as dt

    from lours_spark.operators.temporal import asof_join
    from lours_spark.streaming.events import (
        asof_enrich_stream,
        read_event_stream,
        run_available_now,
    )

    base = dt.datetime(2024, 1, 1, 10, 0)

    def at(minutes):
        return base + dt.timedelta(minutes=minutes)

    clicks = [
        (1, at(30), 1, "click", 0.0, "{}"),
        (2, at(90), 1, "click", 0.0, "{}"),
        (3, at(10), 2, "click", 0.0, "{}"),   # before any purchase
        (4, at(300), 1, "click", 0.0, "{}"),  # beyond tolerance
        (5, at(40), 2, "click", 0.0, "{}"),   # hits the NULL-payload tie
    ]
    stream_src = spark.createDataFrame(
        clicks,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    data_dir = str(tmp_path / "asof_in")
    stream_src.write.parquet(data_dir)

    purchases = spark.createDataFrame(
        [
            (1, at(30), 5.0),   # equal-time match for click 1
            (1, at(30), 9.0),   # tie → max payload must win
            (1, at(60), 2.0),
            (2, at(20), 7.0),
            (2, at(20), None),  # NULL-payload tie: struct max sorts
                                # NULLs FIRST, so 7.0 must win in BOTH
                                # twins (pandas na_position="first")
        ],
        "user_id long, ts timestamp, value double",
    )

    enriched = asof_enrich_stream(
        read_event_stream(spark, data_dir),
        purchases,
        "user_id",
        tolerance=3600,
    )
    assert enriched.isStreaming
    run_available_now(enriched, "asof_enrich_test", str(tmp_path / "ck"),
                      output_mode="append")
    got = {
        r["event_id"]: (r["ts_r"], r["value_r"])
        for r in spark.table("asof_enrich_test").collect()
    }

    batch = asof_join(
        stream_src, purchases, "user_id", "ts", tolerance=3600
    )
    want = {r["event_id"]: (r["ts_r"], r["value_r"]) for r in batch.collect()}
    assert got == want
    assert got[1] == (at(30), 9.0)   # tie broke to max payload
    assert got[2] == (at(60), 2.0)
    assert got[3] == (None, None)    # nothing at-or-before
    assert got[4] == (None, None)    # 240 min > 1h tolerance
    assert got[5] == (at(20), 7.0)   # NULL payload loses the tie


def test_streaming_neardup_miner_matches_batch(spark, tmp_path):
    """mine_neardup_stream: per-drop incremental LSH mining against the
    accumulated parquet index. Union of per-batch pair outputs equals
    the one-shot batch minhash_lsh_pairs over everything ingested, a
    restarted stream with the same checkpoint mines a NEW drop against
    the full prior index (and reprocesses nothing), and the index dir
    is batch-additive."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from lours_spark.operators.dedup import minhash_lsh_pairs
    from lours_spark.streaming.documents import (
        mine_neardup_stream,
        read_document_stream,
    )

    base = "quick brown fox jumps over the lazy dog near the river bank "
    def text(i):
        if i % 4 == 3:  # near-dup of doc i-3 (possibly cross-drop)
            return base + f"variant {i - 3} tail common words here"
        return base + f"unique {i} " + (f"filler {i} ") * 3

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)

    def drop(ids, name):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            [(i, text(i), "en", "web", 10) for i in ids], schema
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, name + ".parquet"))

    drop(range(0, 12), "d1")
    drop(range(12, 24), "d2")

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(drop_dir)
        )
        q = mine_neardup_stream(
            stream, index_dir, pairs_dir, ckpt, jaccard_threshold=0.3
        )
        q.awaitTermination()

    run()
    batches = sorted(glob.glob(pairs_dir + "/batch-*"))
    assert len(batches) == 2  # one per drop (maxFilesPerTrigger=1)

    def mined():
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.read.parquet(*sorted(
                glob.glob(pairs_dir + "/batch-*"))).collect()
        }

    def full(n):
        docs = spark.createDataFrame(
            [(i, text(i), "en", "web", 10) for i in range(n)], schema
        )
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                docs, jaccard_threshold=0.3).collect()
        }

    assert mined() == full(24)

    # restart with a NEW drop containing a near-dup of a drop-1 doc
    # (doc 27 duplicates doc 24 — in-drop — and doc 3's family text is
    # extended by using ids ≥24 whose %4==3 members mirror earlier ids)
    drop(range(24, 32), "d3")
    run()
    assert len(glob.glob(pairs_dir + "/batch-*")) == 3
    assert mined() == full(32)
    # index is batch-additive: one dir per processed batch
    assert len(glob.glob(index_dir + "/batch-*")) == 3


def test_streaming_neardup_miner_backfill_index(spark, tmp_path):
    """A backfilled corpus index (build_minhash_index output written
    under index_dir with a NON-batch name) counts as prior state: the
    stream's first batch mines against it, so a drop near-duplicating a
    backfilled doc is caught."""
    import glob
    import os
    import shutil

    from lours_spark.operators.dedup import build_minhash_index
    from lours_spark.streaming.documents import mine_neardup_stream

    base = "quick brown fox jumps over the lazy dog near the river bank "
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    backfill_docs = spark.createDataFrame(
        [(i, base + f"unique {i} " + f"filler {i} " * 3, "en", "web", 10)
         for i in range(100, 107)],
        schema,
    )
    index_dir = str(tmp_path / "index")
    build_minhash_index(backfill_docs).write.parquet(
        os.path.join(index_dir, "backfill")
    )

    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    stage = str(tmp_path / "stage")
    spark.createDataFrame(
        [(200, base + "variant 104 tail common words here"
          + " unique 104 filler 104 filler 104", "en", "web", 10),
         # near-dup of backfilled 104 (same trick as the main test)
         (201, base + "unique 104 filler 104 filler 104 filler 104",
          "en", "web", 10),
         (202, base + "totally other thing entirely", "en", "web", 10)],
        schema,
    ).coalesce(1).write.parquet(stage)
    shutil.move(
        glob.glob(stage + "/part-*.parquet")[0],
        os.path.join(drop_dir, "d1.parquet"),
    )

    pairs_dir = str(tmp_path / "pairs")
    stream = (
        spark.readStream.format("parquet").schema(schema).load(drop_dir)
    )
    q = mine_neardup_stream(
        stream, index_dir, pairs_dir, str(tmp_path / "ckpt"),
        jaccard_threshold=0.3,
    )
    q.awaitTermination()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            *glob.glob(pairs_dir + "/batch-*")).collect()
    }
    # 201 is a direct near-dup of backfilled 104 (cross: index × drop)
    assert (104, 201) in got, got


def test_prior_index_dirs_compaction_rules():
    """Pure selection logic: the latest compact dir supersedes the
    batch dirs it folded and older compacts (crash leftovers between a
    compaction's write and deletes are not double-counted), backfills
    always count, and a compact bound past the replaying batch fails
    loud."""
    import pytest as _pt

    from lours_spark.streaming.documents import _prior_index_dirs

    dirs = [
        "/idx/backfill",
        "/idx/batch-000000",
        "/idx/batch-000001",  # folded into compact-000002, not yet deleted
        "/idx/compact-000002",
        "/idx/batch-000002",
        "/idx/batch-000003",
    ]
    got = _prior_index_dirs(dirs, 3)
    assert got == sorted(
        ["/idx/backfill", "/idx/compact-000002", "/idx/batch-000002"]
    )
    # an older compact leftover is superseded by the newer one
    got2 = _prior_index_dirs(dirs + ["/idx/compact-000001"], 3)
    assert got2 == got
    # no compact dirs: plain batch-window selection
    got3 = _prior_index_dirs(
        ["/idx/batch-000000", "/idx/batch-000001", "/idx/batch-000002"], 2
    )
    assert got3 == ["/idx/batch-000000", "/idx/batch-000001"]
    # compact bound beyond the replaying batch: loud
    with _pt.raises(RuntimeError, match="compaction bound"):
        _prior_index_dirs(dirs, 1)


def test_streaming_neardup_miner_with_compaction(spark, tmp_path):
    """mine → compact (automated via compact_every) → continue mining
    across a restart: the mined pair set is IDENTICAL to the one-shot
    batch run, batch index dirs fold away, and a rerun of a committed
    compaction only cleans up — never rewrites (VERDICT r7 item 3)."""
    import glob
    import os
    import shutil

    from lours_spark.operators.dedup import minhash_lsh_pairs
    from lours_spark.streaming.documents import (
        compact_neardup_index,
        mine_neardup_stream,
    )

    base = "quick brown fox jumps over the lazy dog near the river bank "

    def text(i):
        if i % 4 == 3:
            return base + f"variant {i - 3} tail common words here"
        return base + f"unique {i} " + (f"filler {i} ") * 3

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)

    def drop(ids, name):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            [(i, text(i), "en", "web", 10) for i in ids], schema
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, name + ".parquet"))

    for b in range(4):
        drop(range(8 * b, 8 * b + 8), f"d{b}")

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(drop_dir)
        )
        q = mine_neardup_stream(
            stream, index_dir, pairs_dir, ckpt, jaccard_threshold=0.3,
            compact_every=2,
        )
        q.awaitTermination()

    run()
    # batches 0-3 ran; compaction fired at batch 2 (folds 0,1)
    names = sorted(os.path.basename(p) for p in glob.glob(index_dir + "/*"))
    assert "compact-000002" in names
    assert "batch-000000" not in names and "batch-000001" not in names
    assert {"batch-000002", "batch-000003"} <= set(names)

    def mined():
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.read.parquet(
                *sorted(glob.glob(pairs_dir + "/batch-*"))).collect()
        }

    def full(n):
        docs = spark.createDataFrame(
            [(i, text(i), "en", "web", 10) for i in range(n)], schema
        )
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
        }

    assert mined() == full(32)

    # restart with a new drop → batch 4 mines against compact + batch
    # dirs, then compaction folds everything below 4
    drop(range(32, 40), "d4")
    run()
    assert mined() == full(40)
    names = sorted(os.path.basename(p) for p in glob.glob(index_dir + "/*"))
    assert "compact-000004" in names and "compact-000002" not in names
    assert names == ["batch-000004", "compact-000004"]

    # rerun of an already-committed compaction: pure cleanup, no
    # rewrite — plant a superseded leftover and re-invoke
    leftover = os.path.join(index_dir, "batch-000003")
    os.makedirs(leftover)
    open(os.path.join(leftover, "stale.parquet"), "w").close()
    before = spark.read.parquet(os.path.join(index_dir, "compact-000004"))
    n_before = before.count()
    folded = compact_neardup_index(spark, index_dir, upto_batch_id=4)
    assert folded == 1  # the leftover was deleted, nothing rewritten
    assert not os.path.exists(leftover)
    assert spark.read.parquet(
        os.path.join(index_dir, "compact-000004")).count() == n_before

    # the full index (compact + live batch dirs) equals one clean
    # build over everything ingested, row-for-row
    from lours_spark.operators.dedup import build_minhash_index

    all_docs = spark.createDataFrame(
        [(i, text(i), "en", "web", 10) for i in range(40)], schema
    )
    expect_ids = {r["__id"] for r in build_minhash_index(all_docs).select("__id").collect()}
    got_ids = {
        r["__id"]
        for r in spark.read.parquet(
            os.path.join(index_dir, "compact-000004"),
            os.path.join(index_dir, "batch-000004"),
        ).select("__id").collect()
    }
    assert got_ids == expect_ids


def test_streaming_miner_capped_ledger_and_star(spark, tmp_path):
    """Review r9: a capped streaming miner must persist the
    skipped-bucket ledger (dropped-batch-%06d beside the pair dirs —
    no silent caps on the path where the guard matters most), and
    star mode keeps the indexed mega-family absorbing new members via
    hub pairs. Also: star without a cap fails at CALL time."""
    import glob
    import os
    import shutil

    import pytest as _pt

    from lours_spark.streaming.documents import mine_neardup_stream

    boiler = "subscribe newsletter terms of service apply footer " * 3

    def text(i):
        return boiler if i % 2 == 0 else (
            f"unique {i} words " + f"filler {i} " * 4
        )

    schema = "doc_id long, text string"
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)

    def drop(ids, name):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            [(i, text(i)) for i in ids], schema
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, name + ".parquet"))

    drop(range(0, 20), "d0")    # 10 boilerplate docs
    drop(range(20, 40), "d1")   # 10 more join the indexed family

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(drop_dir)
    )
    with _pt.raises(ValueError, match="max_bucket_size"):
        mine_neardup_stream(
            stream, str(tmp_path / "i0"), str(tmp_path / "p0"),
            str(tmp_path / "c0"), oversize="star",
        )

    pairs_dir = str(tmp_path / "pairs")
    q = mine_neardup_stream(
        stream, str(tmp_path / "index"), pairs_dir,
        str(tmp_path / "ckpt"), jaccard_threshold=0.5,
        max_bucket_size=5, oversize="star",
    )
    q.awaitTermination()

    # ledger dirs exist per batch and report the family bucket; the
    # batch-* pair glob is unaffected by the dropped-* siblings
    dropped_dirs = sorted(glob.glob(pairs_dir + "/dropped-batch-*"))
    assert len(dropped_dirs) == 2
    ledger = spark.read.parquet(*dropped_dirs)
    assert set(ledger.columns) == {"band", "band_key", "bucket_size"}
    assert ledger.count() > 0
    assert ledger.agg({"bucket_size": "max"}).first()[0] >= 10

    mined = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            *sorted(glob.glob(pairs_dir + "/batch-*"))
        ).collect()
    }
    fam = {p for p in mined if p[0] % 2 == 0 and p[1] % 2 == 0}
    # batch 0: family (10 members > cap) stars to hub 0; batch 1: the
    # 10 new members attach to the same indexed hub — ONE family
    assert fam == {(0, i) for i in range(2, 40, 2)}


def test_caipy_watcher_rejects_legacy_flat_output(spark, tmp_path):
    """A pre-round-7 append-mode output root (flat part files at the
    top of images/) fails fast instead of corrupting partition
    discovery when batch=<id> dirs land beside them (ADVICE r7)."""
    import os

    import pytest as _pt

    from lours_spark.streaming.caipy_watch import watch_caipy

    out = tmp_path / "out"
    (out / "images").mkdir(parents=True)
    (out / "images" / "part-00000-legacy.parquet").write_bytes(b"x")
    with _pt.raises(ValueError, match="legacy"):
        watch_caipy(
            spark, str(tmp_path / "root"), str(out),
            str(tmp_path / "ckpt"),
        )


def test_uncommitted_compact_dir_never_supersedes(spark, tmp_path):
    """A compaction that died mid-write (compact dir present, no
    _SUCCESS) must not supersede the batch dirs it failed to fold:
    prior-state selection strips it, and the next compaction deletes
    the garbage and refolds from the still-present inputs."""
    import os

    from lours_spark.streaming.documents import (
        _drop_uncommitted_compacts,
        _prior_index_dirs,
        compact_neardup_index,
    )

    idx = tmp_path / "idx"
    for name, committed in (
        ("batch-000000", True),
        ("batch-000001", True),
        ("compact-000002", False),  # crashed mid-write: no _SUCCESS
    ):
        d = idx / name
        d.mkdir(parents=True)
        if committed:
            spark.range(2).write.mode("overwrite").parquet(str(d))

    paths = sorted(str(idx / n) for n in os.listdir(idx))
    kept = _drop_uncommitted_compacts(spark, paths)
    assert str(idx / "compact-000002") not in kept
    prior = _prior_index_dirs(kept, 2)
    assert prior == sorted(
        [str(idx / "batch-000000"), str(idx / "batch-000001")]
    )

    # rerun of the compaction: reads the intact batch dirs, replaces
    # the garbage dir with a committed one, total rows preserved
    folded = compact_neardup_index(spark, str(idx), upto_batch_id=2)
    assert folded == 2
    out = idx / "compact-000002"
    assert (out / "_SUCCESS").exists()
    assert spark.read.parquet(str(out)).count() == 4
    assert not (idx / "batch-000000").exists()


def test_compaction_skips_batches_already_folded(spark, tmp_path):
    """A prior compaction that committed but crashed before its
    deletes leaves batch dirs BELOW the compact bound on disk. A later
    (e.g. manual) compaction must read the compact dir OR those stale
    batches — never both — or every row they share is duplicated into
    the new compact dir and the incremental miner's joins multiply."""
    import os

    from lours_spark.streaming.documents import compact_neardup_index

    idx = tmp_path / "idx"

    def write(name, lo, hi):
        spark.range(lo, hi).write.mode("overwrite").parquet(
            str(idx / name)
        )

    # compact-000002 folded batches 0,1 (rows 0..3) but its delete
    # phase crashed, so batch-000000/000001 survive beside it
    write("batch-000000", 0, 2)
    write("batch-000001", 2, 4)
    write("compact-000002", 0, 4)
    write("batch-000002", 4, 6)
    write("batch-000003", 6, 8)

    folded = compact_neardup_index(spark, str(idx), upto_batch_id=4)
    assert folded == 5  # everything below the bound is swept away
    names = sorted(os.listdir(idx))
    assert names == ["compact-000004"]
    rows = sorted(
        r["id"] for r in spark.read.parquet(str(idx / "compact-000004")).collect()
    )
    assert rows == list(range(8))  # each id exactly once — no doubling


def test_streaming_classifier_parity(spark):
    """The stateless UDF twin replays classifier_score's arithmetic
    exactly: same md5 bucket hashing, same mean-weight + bias sigmoid,
    on messy tokenization edges (multiple spaces, empty text,
    single-word docs)."""
    from lours_spark.operators.quality import (
        classifier_score,
        train_ngram_classifier,
    )
    from lours_spark.streaming.documents import _classifier_score_udf
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [(1, "good clean prose article", 1), (2, "fine words here", 1),
         (3, "buy spam pills now", 0), (4, "casino spam click", 0)],
        "doc_id long, text string, label int",
    )
    w, b = train_ngram_classifier(train, "label", num_buckets=256, seed=7)

    docs = spark.createDataFrame(
        [(1, "a  clean   prose article"), (2, "spam  pills"),
         (3, ""), (4, "word"), (5, "  padded   edges  ")],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: r["score"]
        for r in classifier_score(docs, w, b, num_buckets=256, seed=7).collect()
    }
    udf = _classifier_score_udf(w, b, 256, 7)
    stream_like = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", udf(F.col("text")).alias("s")).collect()
    }
    for k in batch:
        assert abs(batch[k] - stream_like[k]) < 1e-9, (k, batch[k], stream_like[k])


def test_streaming_boilerplate_and_classifier_stages(spark, tmp_path):
    """curate_document_stream with the two frozen-artifact stages: the
    offline boilerplate ledger strips the shared footer from every
    arriving doc (byte-equal to the batch operator's rebuild), and the
    classifier filter drops spam-shaped docs before dedup."""
    import glob
    import os
    import shutil

    from lours_spark.operators.dedup import (
        boilerplate_paragraph_hashes,
        remove_boilerplate_paragraphs,
    )
    from lours_spark.operators.quality import train_ngram_classifier
    from lours_spark.streaming.documents import curate_document_stream

    footer = "SHARED FOOTER ALL RIGHTS RESERVED"
    good = "a reasonable prose paragraph with words"
    spam = "buy cheap pills casino click now"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [(i, f"{good} v{i}\n\n{footer}", "en", "web", 1) for i in range(6)]
    rows += [(100 + i, f"{spam} d{i}\n\n{footer}", "en", "web", 1)
             for i in range(6)]
    corpus = spark.createDataFrame(rows, schema)

    # offline artifacts: boilerplate ledger + trained classifier
    boiler = boilerplate_paragraph_hashes(corpus, max_doc_share=0.5)
    labeled = corpus.withColumn(
        "label", (~corpus.text.contains("pills")).cast("int")
    )
    w, b = train_ngram_classifier(labeled, "label", num_buckets=512, seed=3)

    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    stage = str(tmp_path / "stage")
    corpus.coalesce(1).write.parquet(stage)
    shutil.move(
        glob.glob(stage + "/part-*.parquet")[0],
        os.path.join(drop_dir, "b1.parquet"),
    )
    stream = spark.readStream.schema(schema).parquet(drop_dir)
    curated = curate_document_stream(
        stream, redact=False,
        boilerplate_hashes=boiler,
        classifier_weights=w, classifier_bias=b,
        classifier_min_score=0.5, classifier_num_buckets=512, seed=3,
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("r8_stages")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r["text"] for r in spark.table("r8_stages").collect()}
    assert set(got) == set(range(6))  # spam gone, good docs survive
    # stripped text byte-equals the batch operator's rebuild
    batch_text = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_paragraphs(
            corpus, max_doc_share=0.5
        ).collect()
    }
    for i in range(6):
        assert got[i] == batch_text[i]

    import pytest as _pt

    with _pt.raises(ValueError, match="classifier_weights"):
        curate_document_stream(stream, classifier_min_score=0.5)


def test_streaming_boilerplate_regex_sep_parity(spark):
    """F.split treats sep as a regex; the streaming strip UDF must
    too, or a metacharacter sep silently strips nothing (ledger hashes
    computed over regex-split paragraphs would never match)."""
    from pyspark.sql import functions as F

    from lours_spark.operators.dedup import (
        boilerplate_paragraph_hashes,
        remove_boilerplate_paragraphs,
    )
    from lours_spark.streaming.documents import _strip_paragraphs_udf

    sep = r"\n{2,}"  # two OR MORE newlines — a real regex
    rows = [(i, f"FOOT\n\n\nbody {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ledger = boilerplate_paragraph_hashes(df, sep=sep, max_doc_frequency=3)
    batch = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_paragraphs(
            df, sep=sep, max_doc_frequency=3, key="hash",
            include_counts=False,
        ).collect()
    }
    udf = _strip_paragraphs_udf(ledger, sep)
    stream_like = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", udf(F.col("text")).alias("t")).collect()
    }
    assert stream_like == batch
    assert all("FOOT" not in t for t in stream_like.values())


def test_curation_classifier_misconfig_fails_loud(spark):
    """A trained model without a threshold (or vice versa) raises in
    BOTH pipelines instead of silently skipping the cut."""
    import pytest as _pt

    from lours_spark.operators.quality import train_ngram_classifier
    from lours_spark.pipeline import CurationConfig, curate_documents
    from lours_spark.streaming.documents import curate_document_stream

    docs = spark.createDataFrame(
        [(1, "good words", 1), (2, "spam words", 0)],
        "doc_id long, text string, label int",
    )
    w, b = train_ngram_classifier(docs, "label", num_buckets=64)
    with _pt.raises(ValueError, match="set together"):
        curate_documents(
            docs, CurationConfig(classifier_weights=w, classifier_bias=b)
        )
    with _pt.raises(ValueError, match="set together"):
        curate_document_stream(docs, classifier_weights=w)


def test_streaming_embedding_neardup_miner(spark, tmp_path):
    """The embedding miner on the shared exactly-once skeleton: mined
    pair set across micro-batches equals the one-shot LSH run over
    everything ingested; compaction folds index batch dirs; a restart
    with a new drop continues against the accumulated index."""
    import glob
    import os
    import shutil

    import numpy as np

    from lours_spark.operators.dedup import embedding_near_duplicates
    from lours_spark.streaming.documents import (
        mine_embedding_neardup_stream,
    )

    rng = np.random.default_rng(5)

    def vec(i):
        if i % 4 == 3:
            v = vec.base + rng.normal(0, 0.01, 16)
        else:
            v = rng.normal(0, 1, 16)
            vec.base = v
        return [float(x) for x in (v / np.linalg.norm(v))]

    vec.base = None
    all_rows = [(i, vec(i)) for i in range(32)]
    schema = "vec_id long, embedding array<float>"
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)

    def drop(rows, name):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        shutil.move(
            glob.glob(stage + "/part-*.parquet")[0],
            os.path.join(drop_dir, name + ".parquet"),
        )

    for b in range(3):
        drop(all_rows[8 * b:8 * b + 8], f"d{b}")

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    L, r = 8, 10

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(drop_dir)
        )
        q = mine_embedding_neardup_stream(
            stream, index_dir, pairs_dir, ckpt,
            threshold=0.9, num_tables=L, planes_per_table=r,
            compact_every=2,
        )
        q.awaitTermination()

    run()
    names = sorted(os.path.basename(p) for p in glob.glob(index_dir + "/*"))
    assert "compact-000002" in names and "batch-000000" not in names

    def mined():
        return {
            (p["id_a"], p["id_b"], round(p["cosine"], 9))
            for p in spark.read.parquet(
                *sorted(glob.glob(pairs_dir + "/batch-*"))).collect()
        }

    def one_shot(n):
        df = spark.createDataFrame(all_rows[:n], schema)
        return {
            (p["id_a"], p["id_b"], round(p["cosine"], 9))
            for p in embedding_near_duplicates(
                df, threshold=0.9, num_tables=L, planes_per_table=r
            ).collect()
        }

    assert mined() == one_shot(24) and len(mined()) > 0

    # restart with one more drop: mines against compact + batch dirs
    drop(all_rows[24:32], "d3")
    run()
    assert mined() == one_shot(32)


def test_jsonl_drops_curate_stream_parity(spark, tmp_path):
    """End-to-end over JSONL drops (the LLM-corpus interchange path):
    write_jsonl drops -> read_document_stream(fmt='json') ->
    curate_document_stream -> parquet sink, asserted row-identical to
    the batch curation of read_jsonl over the same files."""
    import os

    from lours_spark.io.jsonl import read_jsonl, write_jsonl
    from lours_spark.streaming.documents import (
        curate_document_stream,
        read_document_stream,
    )

    drop_dir = str(tmp_path / "jl_drops")
    os.makedirs(drop_dir)
    docs = spark.createDataFrame(
        [
            (i, ("good text with plenty of words here " * 3) + f"doc {i}"
             if i % 3 else "x", "en", "web", 100 + i)
            for i in range(60)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # two drops, plain jsonl (the file stream source lists *.json)
    write_jsonl(docs.filter("doc_id < 30"), drop_dir + "/d0",
                compression=None, num_shards=1)
    write_jsonl(docs.filter("doc_id >= 30"), drop_dir + "/d1",
                compression=None, num_shards=1)

    stream = read_document_stream(spark, drop_dir + "/*/", fmt="json")
    out_dir = str(tmp_path / "jl_out")
    q = (
        curate_document_stream(stream, quality_min_score=0.5)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "jl_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["doc_id"]
        for r in curate_document_stream(
            read_jsonl(spark, drop_dir), quality_min_score=0.5
        ).collect()
    }
    assert streamed == batch
    assert 0 < len(streamed) < 60  # the quality filter actually bit
