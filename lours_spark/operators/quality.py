"""Repetition-based document quality signals (Gopher §A1.1 /
RefinedWeb-style filters) for training-data curation.

Per document:

- ``n_words`` — whitespace token count;
- ``top_word_count`` — occurrences of the most frequent word (a high
  share of one token marks boilerplate/spam);
- ``top_bigram_count`` — occurrences of the most frequent word bigram;
- ``dup_trigram_excess`` — total trigrams minus distinct trigrams
  (repeated-passage mass; 0 for clean text).

Spark shape: two explode → groupBy chains (words, bigrams) with
map-side partial aggregation — the shuffle carries (doc, gram, count)
partials, never document text — plus one pure-expression column for
the trigram excess (``word_shingles`` is already distinct; the excess
is arithmetic on sizes, zero extra shuffle). "Most frequent" needs
only ``max(count)``, not the gram itself, so no tie-break enters the
result and the whole thing stays order-free deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lours_spark.functions.text import _bind, tokens, word_shingles


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics (see module docstring).

    >>> df = spark.createDataFrame(
    ...     [(1, "spam spam spam spam"), (2, "four distinct words here")],
    ...     "doc_id long, text string")
    >>> rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    >>> rows[1]["top_word_count"], rows[2]["top_word_count"]
    (4, 1)
    >>> rows[1]["dup_trigram_excess"]  # 2 total trigrams, 1 distinct
    1
    """
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        toks.alias("__w"),
        # total trigrams - distinct trigrams, 0 below 3 words
        F.when(
            F.size(toks) >= 3,
            F.size(toks)
            - F.lit(2)
            - F.size(word_shingles(F.col(text_col), 3)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_trigram_excess"),
    )
    words = base.select(
        id_col, "dup_trigram_excess", F.explode("__w").alias("__word")
    )
    word_stats = (
        words.groupBy(id_col, "dup_trigram_excess", "__word")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col, "dup_trigram_excess")
        .agg(
            F.sum("__n").alias("n_words"),
            F.max("__n").alias("top_word_count"),
        )
    )
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            _bind(
                F.col("__w"),
                # guard: sequence(1, 0) would run DESCENDING in Spark,
                # fabricating bigrams for 1-word docs
                lambda w: F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(w, i), F.element_at(w, i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("__bg"),
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col)
        .agg(F.max("__n").alias("top_bigram_count"))
    )
    return (
        word_stats.join(bigram_stats, id_col, "left")
        .select(
            id_col,
            "n_words",
            "top_word_count",
            F.coalesce("top_bigram_count", F.lit(0)).cast("long").alias(
                "top_bigram_count"
            ),
            "dup_trigram_excess",
        )
    )


def quality_percentile(
    df: DataFrame,
    score_col,
    group_col: str | None = None,
    id_col: str = "doc_id",
    pct_col: str = "q_pct",
) -> DataFrame:
    """Percentile position of each document's quality score within its
    group (``cume_dist`` ∈ (0, 1]: the fraction of the group at or
    below this document — the empirical CDF). The standard form of
    "drop the bottom X% per language" — an absolute score threshold
    over-prunes low-resource languages whose score distribution sits
    lower, a per-group percentile doesn't.

    cume_dist, NOT percent_rank: percent_rank is (rank−1)/(n−1), which
    pins every singleton group to 0.0 — a one-document language would
    be dropped by ANY positive threshold, the exact failure mode this
    operator exists to avoid. cume_dist gives the singleton 1.0 and a
    two-doc group {0.5, 1.0}, so "drop the bottom half" does what it
    says at every group size.

    ``score_col`` may be a column name or a Column expression (e.g.
    ``functions.text.quality_score(F.col("text"))``). Ordering ties
    break by ``id_col`` so the percentile is a total order —
    deterministic across engines and partitionings.

    Scale shape: one hash exchange on ``group_col`` + a per-group
    window; no global sort. With ``group_col=None`` the window IS a
    single partition — fine for reporting frames, wrong for a 100 TB
    corpus (group first, or quantile-bucket via approx thresholds).

    >>> df = spark.createDataFrame(
    ...     [(1, "en", 0.5), (2, "en", 1.0), (3, "en", 0.0)],
    ...     "doc_id long, lang string, q double")
    >>> sorted((r["doc_id"], round(r["q_pct"], 6)) for r in
    ...        quality_percentile(df, "q", "lang").collect())
    [(1, 0.666667), (2, 1.0), (3, 0.333333)]
    """
    from pyspark.sql import Window

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    parts = [group_col] if group_col is not None else []
    w = Window.partitionBy(*parts).orderBy(
        F.asc("__qp_score"), F.asc(id_col)
    )
    return (
        df.withColumn("__qp_score", score)
        .withColumn(pct_col, F.cume_dist().over(w))
        .drop("__qp_score")
    )


def filter_quality_percentile(
    df: DataFrame,
    score_col,
    min_pct: float,
    group_col: str | None = None,
    id_col: str = "doc_id",
    pct_col: str = "q_pct",
) -> DataFrame:
    """Drop the bottom ``min_pct`` fraction of each group by quality:
    keep documents whose cume_dist exceeds ``min_pct`` (see
    :func:`quality_percentile`). Strict ``>`` so ``min_pct=0.5`` on a
    two-doc group keeps exactly the better one, and a singleton group
    (cume_dist 1.0) survives any ``min_pct < 1``."""
    return quality_percentile(
        df, score_col, group_col, id_col=id_col, pct_col=pct_col
    ).filter(F.col(pct_col) > min_pct)
