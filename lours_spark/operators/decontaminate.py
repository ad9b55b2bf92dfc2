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
    d = docs.select(
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
