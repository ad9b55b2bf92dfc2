"""Incremental corpus ingestion: the streaming twin of
``lours_spark.pipeline.curate_documents``.

A 100 TB corpus is not built in one batch — crawl drops land in a
directory (or a Kafka topic) continuously, and the curation pipeline
must process each increment exactly once while holding only bounded
state. Structured Streaming gives all of that for free when the
stages are expressed right:

- the stateless stages (quality percentile is NOT stateless — see
  below — but PII redaction, hash sampling, per-shard mixture rates
  against a FROZEN weights frame are) apply unchanged to the stream;
- exact dedup becomes ``dropDuplicates`` on the text fingerprint:
  state = one row per distinct fingerprint seen, exactly the
  cross-batch "have I ingested this before" semantic an incremental
  build needs. That state grows one row per distinct document forever;
  when the stream carries a trusted event-time column, pass
  ``ts_col`` + ``dedup_within`` to switch to
  ``dropDuplicatesWithinWatermark`` — duplicates are only caught
  within the window, but state is evicted past the watermark
  (bounded-state for infinite ingest);
- stages run in the SAME order as the batch pipeline (gopher rules,
  then dedup on RAW text, then the quality filter, then redaction) so
  both modes keep the same duplicate GROUPS: fingerprinting redacted
  text would merge docs that differ only in their PII, and deduping
  before the rule cut would let a gopher-doomed doc claim a
  fingerprint its surviving batch-side duplicate holds. One honest
  WITHIN-group divergence remains: ``dropDuplicates`` keeps each
  fingerprint's FIRST-ARRIVING doc while the batch pipeline keeps the
  MIN-ID one — the surviving groups match, the representative id can
  differ when a lower id arrives in a later batch;
- the per-language quality PERCENTILE of the batch pipeline is a
  corpus-wide rank — meaningless over an unbounded stream — so the
  streaming twin takes an absolute ``quality_min_score`` instead,
  typically calibrated offline from the batch percentile (the honest
  divergence between the two modes, stated rather than hidden);
- file-source checkpointing makes delivery exactly-once per file:
  a restarted stream reprocesses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over a directory of document drops."""
    return (
        spark.readStream.format(fmt)
        .schema(DOCUMENTS_SCHEMA)
        .load(path)
    )


def curate_document_stream(
    docs: DataFrame,
    gopher: "dict | None" = None,
    quality_min_score: "float | None" = None,
    dedup_exact: bool = True,
    redact: bool = True,
    mixture_weights: "DataFrame | None" = None,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    ts_col: "str | None" = None,
    dedup_within: "str | None" = None,
) -> DataFrame:
    """Apply the curation chain to a streaming document frame (see
    module docstring for how each batch stage maps). Returns the
    curated stream, ready for ``writeStream`` with a checkpoint.

    ``mixture_weights``: a STATIC (batch) weights frame from
    :func:`operators.sampling.mixture_weights`, computed offline on
    the corpus so far and broadcast against every micro-batch — rates
    must be frozen for the stream to stay deterministic.

    ``gopher``: threshold overrides for the (stateless, streaming-safe)
    Gopher rule filter; ``None`` skips it, matching the batch
    pipeline's opt-in stage.

    ``ts_col`` + ``dedup_within`` (e.g. ``"30 days"``): bounded dedup
    state via ``dropDuplicatesWithinWatermark`` — see module
    docstring for the trade-off.
    """
    out = docs

    if gopher is not None:
        from lours_spark.operators.quality import filter_gopher

        # stateless codegen'd projection — streaming-safe as-is, and
        # BEFORE dedup like the batch pipeline: gopher-cut docs must
        # not claim a fingerprint (batch drops doc A via gopher first,
        # then dedup keeps its surviving duplicate B; deduping first
        # would keep A, drop B, then gopher would kill A — nothing
        # survives where batch keeps B)
        out = filter_gopher(out, id_col, text_col, **gopher)

    if dedup_exact:
        from lours_spark.functions.text import fingerprint

        # cross-batch keep-first on the RAW text, BEFORE the quality
        # filter and redaction — same stage order as
        # pipeline.curate_documents (see module docstring for why the
        # order is semantic)
        out = out.withColumn("__fp", fingerprint(F.col(text_col)))
        if ts_col is not None and dedup_within is not None:
            out = out.withWatermark(
                ts_col, dedup_within
            ).dropDuplicatesWithinWatermark(["__fp"])
        else:
            out = out.dropDuplicates(["__fp"])
        out = out.drop("__fp")

    if quality_min_score is not None:
        from lours_spark.functions.text import quality_score

        out = out.filter(
            quality_score(F.col(text_col)) >= quality_min_score
        )

    if redact:
        from lours_spark.operators.pii import redact_pii

        out = out.withColumn(text_col, redact_pii(F.col(text_col)))

    if mixture_weights is not None:
        from lours_spark.operators.sampling import apply_mixture

        out = apply_mixture(
            out, mixture_weights, shard_col=lang_col, id_col=id_col,
            seed=seed,
        )

    return out


def mine_neardup_stream(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    hash_fn: str = "md5",
    query_name: str = "neardup_miner",
    available_now: bool = True,
):
    """Streaming twin of ``operators.dedup.minhash_lsh_pairs_incremental``:
    per micro-batch, mine the batch's documents against the ACCUMULATED
    corpus index, land the batch's near-dup pairs as
    ``<pairs_dir>/batch-%06d/`` parquet, and append the batch's index
    rows as ``<index_dir>/batch-%06d/``. The union of all pair batches
    equals the one-shot ``minhash_lsh_pairs`` over everything ingested
    (each cross-batch pair is found exactly once — by the batch that
    ingested its LATER side; parity-tested).

    Exactly-once WITHOUT a transaction log, the
    :func:`io.webdataset.write_webdataset_stream` recipe: both writes
    are deterministic functions of (batch content, prior index) and
    land in directories derived from the replay-stable ``batch_id``;
    a recovery replay of batch N reads index dirs ``< N`` only — the
    exact pre-N state, even when N's own dirs half-exist from the
    crashed attempt — and overwrites N's dirs with identical content.

    State is the parquet index itself (per-doc shingles + signature):
    bounded by corpus size, durable, shared with BATCH incremental
    mining (``build_minhash_index`` writes the same schema) — a
    backfilled corpus and a live stream can feed one index.

    ``available_now`` (default True) drains the CURRENT backlog and
    terminates — the batch-job-style invocation the tests use; pass
    False for a continuously-running miner over a live drop directory
    (the caller owns the query lifecycle either way).

    Returns the started ``StreamingQuery`` (caller awaits/stops)."""
    import os
    import re

    from lours_spark.operators.dedup import minhash_lsh_pairs_incremental

    def _list_index_dirs(spark) -> list:
        """Child paths of ``index_dir`` via the Hadoop FileSystem API —
        works on any scheme the cluster can read (s3a://, hdfs://,
        file://); a driver-local ``glob`` would silently return nothing
        for remote stores and every batch would mine only against
        itself."""
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = path.getFileSystem(hconf)
        if not fs.exists(path):
            return []
        return sorted(
            str(st.getPath().toString())
            for st in fs.listStatus(path)
            if st.isDirectory()
        )

    def mine_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # prior state = every index dir EXCEPT this batch's own (a
        # crashed attempt may have half-written it) and any later
        # batch-NNNNNN. The match anchors on the WHOLE basename, so a
        # backfill named e.g. "corpus-batch-3" is NOT mistaken for a
        # stream batch dir: non-batch-named dirs (a backfilled corpus
        # index written with build_minhash_index) always count — a
        # backfill and a live stream share one index_dir.
        prior = []
        for p in _list_index_dirs(spark):
            m = re.fullmatch(r"batch-(\d+)", os.path.basename(p.rstrip("/")))
            if m and int(m.group(1)) >= batch_id:
                continue
            prior.append(p)
        if prior:
            index = spark.read.parquet(*prior)
        else:
            from lours_spark.operators.dedup import build_minhash_index

            index = build_minhash_index(
                batch_df.limit(0), id_col, text_col, k, num_hashes,
                hash_fn=hash_fn,
            )
        pairs, new_idx = minhash_lsh_pairs_incremental(
            batch_df,
            index,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
            hash_fn=hash_fn,
        )
        tag = f"batch-{batch_id:06d}"
        pairs.write.mode("overwrite").parquet(os.path.join(pairs_dir, tag))
        new_idx.write.mode("overwrite").parquet(os.path.join(index_dir, tag))
        # the operator caches the new batch's signature frame so the
        # pair mining and the index write share one shingle pass; drop
        # it now or a long-lived stream accumulates a cached frame per
        # micro-batch
        new_idx.unpersist()

    writer = (
        stream.writeStream.foreachBatch(mine_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
