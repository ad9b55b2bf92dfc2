"""Benchmark decontamination — flag/remove training documents that
overlap an evaluation set.

The standard LLM-pipeline guard (n-gram collision against held-out
benchmarks, as popularized by GPT-3/PaLM data cards): a training
document is contaminated when it shares ≥ ``min_overlap`` word
``k``-gram shingles with any benchmark document.

Spark shape: both sides reduce to DISTINCT shingle sets (the same
``word_shingles`` expression the dedup family uses — evaluated
JVM-side, one explode each). The membership test is an equi-join on
the shingle string; the benchmark side is the small one by
construction, so it broadcasts — the training corpus is never
shuffled, only its exploded shingles stream through the join and
collapse back with one groupBy(doc). At 100 TB that is: scan + explode
+ broadcast-hash-join + partial-agg — no wide shuffle of document
text anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lours_spark.functions import text as TX
from lours_spark.functions.text import word_shingles


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document count of distinct word ``k``-grams shared with the
    benchmark corpus — ``(id_col, overlap)``, only docs with ≥1 hit.

    ``broadcast_benchmark=False`` falls back to a shuffle join for the
    rare huge-benchmark case.

    >>> docs = spark.createDataFrame(
    ...     [(1, "the quick brown fox jumps"), (2, "totally unrelated words")],
    ...     "doc_id long, text string")
    >>> bench = spark.createDataFrame(
    ...     [("the quick brown fox",)], "text string")
    >>> [(r["doc_id"], r["overlap"]) for r in benchmark_overlap(
    ...     docs, bench).collect()]
    [(1, 2)]
    """
    from lours_spark.operators.dedup import _widen

    # widen first: the shingle HOF is the CPU-dense part and would run
    # on the scan's single task for a one-file corpus (no-op when the
    # input is already wider than the shuffle width)
    d = _widen(docs).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k)).alias("__sh"),
    )
    b = benchmark.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("__sh")
    ).distinct()
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        d.join(b, "__sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop contaminated documents: left-anti join against the flagged
    id set from :func:`benchmark_overlap`."""
    hits = benchmark_overlap(docs, benchmark, id_col, text_col, k).filter(
        F.col("overlap") >= min_overlap
    )
    return docs.join(hits.select(id_col), id_col, "left_anti")


def remove_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """SURGICAL decontamination: every ``window``-token span of a
    training document that appears anywhere in the benchmark corpus is
    removed — overlapping windows cover shared regions longer than
    ``window`` — and the document is rebuilt from its surviving tokens
    (single-space re-join, the signal's token granularity). Unlike
    :func:`decontaminate` (drop the whole document), this keeps the
    clean remainder — the right trade when the contamination is a
    quoted benchmark snippet inside an otherwise useful document.
    Cross-corpus counterpart of
    :func:`lours_spark.operators.dedup.remove_dup_spans` (which
    removes within-corpus repeats, keeping a canonical copy; here
    there is no canonical copy — ANY benchmark hit is removed).

    Returns ``(id_col, n_tokens_before, n_tokens_removed, text)``;
    docs shorter than ``window`` tokens pass through.

    Spark shape: the corpus explodes to |tokens| window rows once; the
    benchmark reduces to its DISTINCT window set (small by
    construction → broadcast, like :func:`benchmark_overlap`; pass
    ``broadcast_benchmark=False`` for a shuffle join). Covered
    positions collapse per doc and the rebuild is pure column
    expressions — the corpus text is never shuffled.

    >>> docs = spark.createDataFrame(
    ...     [(1, "intro text the quick brown fox outro")],
    ...     "doc_id long, text string")
    >>> bench = spark.createDataFrame(
    ...     [("the quick brown fox",)], "text string")
    >>> remove_contaminated_spans(
    ...     docs, bench, window=4).first()["text"]
    'intro text outro'
    """
    toks = F.coalesce(
        TX.tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    n_w = n - (window - 1)
    # sequence(1, n<1) descends — branch explicitly (see remove_dup_spans)
    positions = F.when(n_w >= 1, F.sequence(F.lit(1), n_w)).otherwise(
        F.array().cast("array<int>")
    )
    wnds = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                positions,
                lambda i: F.struct(
                    i.alias("__pos"),
                    F.concat_ws(
                        " ", F.slice(F.col("__toks"), i, window)
                    ).alias("__span"),
                ),
            )
        ).alias("__w"),
    ).select(
        id_col,
        F.col("__w.__pos").alias("__pos"),
        F.col("__w.__span").alias("__span"),
    )
    btoks = F.coalesce(
        TX.tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    bbase = benchmark.select(btoks.alias("__bt"))
    bn_w = F.size("__bt") - (window - 1)
    bpositions = F.when(bn_w >= 1, F.sequence(F.lit(1), bn_w)).otherwise(
        F.array().cast("array<int>")
    )
    bspans = (
        bbase.select(
            F.explode(
                F.transform(
                    bpositions,
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__bt"), i, window)
                    ),
                )
            ).alias("__span")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bspans = F.broadcast(bspans)
    covered_starts = (
        wnds.join(bspans, "__span")
        .groupBy(id_col)
        .agg(F.collect_list("__pos").alias("__starts"))
    )
    joined = base.join(covered_starts, id_col, "left")
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (window - 1)),
            )
        )
    )
    kept_pos = F.when(
        n >= 1, F.array_except(F.sequence(F.lit(1), n), covered)
    ).otherwise(F.array().cast("array<int>"))
    rebuilt = F.array_join(
        F.transform(kept_pos, lambda p: F.element_at(F.col("__toks"), p)),
        " ",
    )
    return joined.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens_before"),
        F.size(covered).cast("long").alias("n_tokens_removed"),
        rebuilt.alias("text"),
    )
