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
- stages run in the SAME order as the batch pipeline (dedup on RAW
  text, then the quality filter, then redaction) so both modes keep
  the same survivors: fingerprinting redacted text would merge docs
  that differ only in their PII, and filtering before dedup would
  let a later high-quality duplicate survive where batch drops the
  group;
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

    if dedup_exact:
        from lours_spark.functions.text import fingerprint

        # cross-batch keep-first on the RAW text, BEFORE filtering and
        # redaction — same stage order as pipeline.curate_documents
        # (see module docstring for why the order is semantic)
        out = out.withColumn("__fp", fingerprint(F.col(text_col)))
        if ts_col is not None and dedup_within is not None:
            out = out.withWatermark(
                ts_col, dedup_within
            ).dropDuplicatesWithinWatermark(["__fp"])
        else:
            out = out.dropDuplicates(["__fp"])
        out = out.drop("__fp")

    if gopher is not None:
        from lours_spark.operators.quality import filter_gopher

        # stateless codegen'd projection — streaming-safe as-is, and
        # batch-parity with pipeline.curate_documents' gopher stage
        out = filter_gopher(out, id_col, text_col, **gopher)

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
