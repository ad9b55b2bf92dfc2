"""End-to-end corpus curation: the operators composed the way a
pretraining data pipeline actually runs them.

The reference library has no equivalent (it curates detection
datasets); this is the Spark-native composition of this repo's
beyond-reference curation layer into ONE lazy plan per stage chain:

    raw documents
      → decontaminate (benchmark n-gram overlap, broadcast join)
      → boilerplate paragraph removal (corpus-frequency anti-join —
        BEFORE the quality stages, so nav menus/footers don't distort
        their signals)
      → Gopher rule filter (zero-shuffle codegen'd projection)
      → quality-classifier filter (hashed n-gram log-odds score vs a
        threshold, broadcast weights — the DCLM-style model cut after
        the rule cut)
      → exact dedup (keep-first by fingerprint)
      → quality percentile filter (per-language cume_dist)
      → PII redaction (codegen'd regexp, no shuffle)
      → domain-mixture subsample (seeded md5 rates, no shuffle)
      → sequence packing (concat-and-chunk, one shuffle per shard key)

Every stage is deterministic for a given seed — re-running the
pipeline on the same input yields byte-identical output, which is
what makes corpus builds auditable and resumable. Stages are all
optional; ``None`` config skips a stage entirely (no plan nodes
added).

Scale shape: stages compose into a handful of Spark jobs — the
filters and redaction are pure column expressions that fuse into
whichever shuffle follows them; the only exchanges are the dedup
fingerprint window, the mixture's |shards|-row aggregate, and the
packer's shard partition. Nothing collects the corpus to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    """Knobs for :func:`curate_documents`; ``None`` disables a stage.

    ``gopher``: threshold overrides for the Gopher rule filter (an
    empty dict applies the paper defaults); ``None`` skips the stage.
    ``quality_min_pct``: drop the bottom fraction of each language by
    quality score (cume_dist, singletons survive).
    ``mixture_targets``: target token share per ``lang`` shard, e.g.
    ``{"en": 0.5, "zh": 0.5}`` (no-upsampling rates in expectation).
    ``pack_budget``: tokens per packed training window.
    ``stages_run`` is filled in by :func:`curate_documents` with the
    stages that actually executed, in order.
    """

    benchmark: "DataFrame | None" = None
    #: paragraphs appearing in more than this share of documents are
    #: removed from EVERY document (remove_boilerplate_paragraphs);
    #: None skips the stage
    boilerplate_max_doc_share: "float | None" = None
    gopher: "dict | None" = None
    #: (weights DataFrame, bias) from train_ngram_classifier plus the
    #: minimum sigmoid score to keep; all three must be set together.
    #: num_buckets/seed/bigrams must match the training call — the
    #: weights frame carries a stamp and the pipeline fails loud on a
    #: mismatch (scoring with different hashing params degenerates to
    #: near-constant sigmoid(bias)).
    classifier_weights: "DataFrame | None" = None
    classifier_bias: "float | None" = None
    classifier_min_score: "float | None" = None
    classifier_num_buckets: int = 1 << 18
    #: hashing seed for scoring; None = fall back to ``seed`` (the
    #: pre-round-9 behavior, which silently coupled the two)
    classifier_seed: "int | str | None" = None
    classifier_bigrams: bool = True
    dedup_exact: bool = True
    quality_min_pct: "float | None" = 0.2
    #: False (default): exact per-group cume_dist window — deterministic,
    #: but a full sort of every language group (the pipeline re-widens
    #: the survivors afterwards, see curate_documents). True: the
    #: operator's tie-calibrated approx_percentile threshold mode —
    #: two fixed-memory aggregations + a broadcast-joined filter, never
    #: a group sort. The trade is three corpus passes (each evaluating
    #: the upstream text expressions) against zero sorts: at bench
    #: scale exact+re-widen wins (~14s vs ~37s at 500k docs); the
    #: approx shape is for billion-row languages where any single-group
    #: sort is the wall. Kept COUNT lands on target even with heavily
    #: tied (quantized) scores; which tied boundary docs survive is
    #: hash-chosen, and the sketch merge is not partition-order
    #: canonical, so determinism weakens to "per partitioning" here.
    quality_approximate: bool = False
    redact_pii: bool = True
    mixture_targets: "dict[str, float] | None" = None
    pack_budget: "int | None" = None
    seed: int = 0
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    shard_col: str = "source"
    stages_run: list = field(default_factory=list)


def curate_documents(docs: DataFrame, config: CurationConfig) -> DataFrame:
    """Run the curation chain of the module docstring over ``docs``.

    Returns the curated document frame — or, when
    ``config.pack_budget`` is set, the packed window frame from
    :func:`operators.packing.pack_chunked` (one row per document ×
    window it lands in).

    >>> from lours_spark.pipeline import CurationConfig, curate_documents
    >>> docs = spark.createDataFrame(
    ...     [(i, f"unique body {i} " + "tok " * 30, "en", "web")
    ...      for i in range(8)] +
    ...     [(8, "unique body 0 " + "tok " * 30, "en", "web")],
    ...     "doc_id long, text string, lang string, source string")
    >>> cfg = CurationConfig(quality_min_pct=None, pack_budget=16)
    >>> out = curate_documents(docs, cfg)
    >>> cfg.stages_run
    ['dedup_exact', 'redact_pii', 'pack']
    >>> out.select("doc_id").distinct().count()  # doc 8 = dup of doc 0
    8
    >>> from pyspark.sql import functions as F
    >>> out.agg(  # each doc-slice fits the window budget
    ...     F.max(F.col("tok_to") - F.col("tok_from"))
    ... ).first()[0] <= 16
    True
    """
    cfg = config
    # track stages in a LOCAL list and publish once at the end: a
    # clear()-then-append on the caller's config would clobber a
    # sibling pipeline sharing the object and erase the previous run's
    # log the moment a new run STARTS (ADVICE r7). The config's
    # stages_run is therefore "the per-most-recent COMPLETED call".
    stages_run: list = []
    id_col, text_col = cfg.id_col, cfg.text_col
    out = docs

    if cfg.benchmark is not None:
        from lours_spark.operators.decontaminate import decontaminate

        out = decontaminate(
            out, cfg.benchmark, id_col=id_col, text_col=text_col
        )
        stages_run.append("decontaminate")

    if cfg.boilerplate_max_doc_share is not None:
        from lours_spark.operators.dedup import (
            remove_boilerplate_paragraphs,
        )

        # rebuild text with over-threshold paragraphs stripped, then
        # re-attach the non-text columns by id (the operator returns
        # only (id, text) — the join is doc-grain, and the downstream
        # dedup window re-partitions anyway). include_counts=False
        # skips the per-doc paragraph-count aggregation the pipeline
        # would only throw away, and guarantees one output row per
        # input id (NULL text included), so the inner join drops
        # nothing. Ids must be unique here, as everywhere in the chain
        # (reset-index upstream otherwise).
        rebuilt = remove_boilerplate_paragraphs(
            out, id_col=id_col, text_col=text_col,
            max_doc_share=cfg.boilerplate_max_doc_share,
            key="hash", include_counts=False,
        ).select(id_col, F.col("text").alias("__bp_text"))
        out = (
            out.drop(text_col)
            .join(rebuilt, id_col)
            .withColumnRenamed("__bp_text", text_col)
        )
        stages_run.append("boilerplate")

    if cfg.gopher is not None:
        from lours_spark.operators.quality import filter_gopher

        # rule-based cut FIRST: it is a zero-shuffle codegen'd
        # projection, so running it before the dedup window shrinks
        # everything downstream for free
        out = filter_gopher(out, id_col, text_col, **cfg.gopher)
        stages_run.append("gopher")

    from lours_spark.operators.quality import require_classifier_knobs

    clf_seed = cfg.classifier_seed if cfg.classifier_seed is not None else cfg.seed
    require_classifier_knobs(
        cfg.classifier_weights, cfg.classifier_bias,
        cfg.classifier_min_score,
        num_buckets=cfg.classifier_num_buckets, seed=clf_seed,
        bigrams=cfg.classifier_bigrams,
    )
    if cfg.classifier_min_score is not None:
        from lours_spark.operators.quality import classifier_score
        keep = classifier_score(
            out, cfg.classifier_weights, cfg.classifier_bias,
            id_col=id_col, text_col=text_col,
            num_buckets=cfg.classifier_num_buckets, seed=clf_seed,
            bigrams=cfg.classifier_bigrams,
        ).filter(F.col("score") >= cfg.classifier_min_score)
        out = out.join(keep.select(id_col), id_col, "left_semi")
        stages_run.append("classifier_filter")

    if cfg.dedup_exact:
        from lours_spark.functions.text import fingerprint

        # keep-first by fingerprint: the min id of each
        # normalized-text group survives (same rule as
        # operators.dedup.exact_duplicates, which returns the summary
        # frame rather than the surviving documents)
        w_min = F.min(F.col(id_col)).over(Window.partitionBy("__fp"))
        out = (
            out.withColumn("__fp", fingerprint(F.col(text_col)))
            .withColumn("__keep", F.col(id_col) == w_min)
            .filter("__keep")
            .drop("__fp", "__keep")
        )
        stages_run.append("dedup_exact")

    if cfg.quality_min_pct is not None:
        from lours_spark.functions.text import quality_score
        from lours_spark.operators.quality import filter_quality_percentile

        out = filter_quality_percentile(
            out,
            quality_score(F.col(text_col)),
            cfg.quality_min_pct,
            group_col=cfg.lang_col,
            id_col=id_col,
            approximate=cfg.quality_approximate,
        ).drop("q_pct")
        stages_run.append("quality_filter")
        if not cfg.quality_approximate and (
            cfg.redact_pii
            or cfg.mixture_targets is not None
            or cfg.pack_budget is not None
        ):
            # the percentile window leaves the corpus hash-partitioned
            # by LANGUAGE — a handful of partitions — and every
            # downstream column expression (PII regexp chains,
            # tokenization for the packer) inherits that near-serial
            # parallelism: measured 5-task stages doing the pipeline's
            # heaviest per-row work on a 32-core box (ablation at the
            # 100x replica). One round-robin exchange of the SURVIVORS
            # (the filtered minority, narrow rows) buys the cluster
            # back; output values are unaffected (row-wise stages +
            # the packer re-partitions on its own key).
            out = out.repartition(
                out.sparkSession.sparkContext.defaultParallelism
            )

    if cfg.redact_pii:
        from lours_spark.operators.pii import redact_pii

        out = out.withColumn(text_col, redact_pii(F.col(text_col)))
        stages_run.append("redact_pii")

    if cfg.mixture_targets is not None:
        from lours_spark.operators.sampling import (
            apply_mixture,
            mixture_weights,
        )

        from lours_spark.functions.text import token_count

        weights = mixture_weights(
            out, cfg.mixture_targets, shard_col=cfg.lang_col,
            token_col=token_count(F.col(text_col)),
        )
        out = apply_mixture(
            out, weights, shard_col=cfg.lang_col, id_col=id_col,
            seed=cfg.seed,
        )
        stages_run.append("mixture")

    if cfg.pack_budget is not None:
        from lours_spark.operators.packing import pack_chunked

        out = pack_chunked(
            out, budget=cfg.pack_budget, id_col=id_col,
            shard_col=cfg.shard_col,
        )
        stages_run.append("pack")

    cfg.stages_run = stages_run
    return out
