"""Corpus-scale vocabulary statistics: word frequencies and BPE-style
adjacent-pair merge statistics.

Training a tokenizer on a 100 TB corpus starts with exactly two
aggregations: the word-frequency table, and — per BPE iteration — the
count of each adjacent symbol pair weighted by the frequency of the
words containing it (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", the counting step of Algorithm 1).
Both are classic map-side-combinable groupBys, which is what makes the
pass feasible at scale:

- ``word_counts``: one exchange carrying one row per DISTINCT word per
  map partition (partial aggregation collapses repeats before the
  shuffle — the corpus text itself never rides the wire).
- ``merge_pair_stats``: pairs explode from the DISTINCT-word frame,
  not the corpus, so a 10⁹-occurrence word costs one row times its
  character length; the second exchange carries one row per distinct
  (pair) per map partition. Candidate volume is Σ(len(w)−1) over
  DISTINCT words — corpus-size independent.

The full training loop (:func:`train_bpe`) is the textbook algorithm
over the COLLECTED word-frequency table: after the one corpus pass,
everything is vocabulary-bounded (a 100 TB web corpus has ~10⁷-10⁸
distinct words after ``min_count`` pruning — megabytes, not
terabytes), so the merge iterations are a driver-side numpy-free loop
exactly like the reference implementations, with the corpus-sized work
confined to the single distributed ``word_counts`` pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lours_spark.functions import text as TX

#: fail-loud ceiling on the word table :func:`train_bpe` collects to
#: the driver. A web crawl's distinct-"word" long tail (typos, URLs,
#: binary junk) is corpus-sized, not vocabulary-sized — with
#: ``min_count=1`` the collect would OOM the driver with no
#: diagnostic. 5M rows ≈ low hundreds of MB of segment state, well
#: inside a normal driver; raise via the ``max_vocab_words`` argument
#: when you know your vocabulary (same pattern as
#: ``similarity.MAX_COLLECTED_QUERIES``).
MAX_VOCAB_WORDS = 5_000_000


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus word-frequency table: (word, n) per distinct lowercase
    whitespace token, ``n >= min_count``.

    >>> df = spark.createDataFrame(
    ...     [(1, "to be or not to be"), (2, "be fast")],
    ...     "doc_id long, text string")
    >>> rows = sorted((r["word"], r["n"]) for r in word_counts(df).collect())
    >>> rows
    [('be', 3), ('fast', 1), ('not', 1), ('or', 1), ('to', 2)]
    """
    out = (
        df.select(F.explode(TX.tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def merge_pair_stats(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """BPE first-iteration merge statistics: every adjacent character
    pair inside a word, counted across the corpus weighted by word
    frequency. Output: (pair, pair_count, n_words) where ``pair_count``
    is the total number of adjacent occurrences corpus-wide (a word
    containing the pair twice contributes twice per occurrence of the
    word) and ``n_words`` is the number of distinct words containing
    the pair. ``top_n`` keeps the highest-count pairs (ties broken by
    pair value — deterministic; compiles to TakeOrderedAndProject, no
    global sort).

    The highest-``pair_count`` row is exactly the first merge a BPE
    trainer would perform on this corpus.

    >>> df = spark.createDataFrame([(1, "aaa aa ab")], "doc_id long, text string")
    >>> rows = {r["pair"]: (r["pair_count"], r["n_words"])
    ...         for r in merge_pair_stats(df).collect()}
    >>> rows["aa"]  # 'aaa' has it at pos 1 and 2, 'aa' once
    (3, 2)
    >>> rows["ab"]
    (1, 1)
    """
    wc = word_counts(df, text_col=text_col)
    # pairs fan out from DISTINCT words only; sequence() in Spark is
    # DESCENDING when start > stop, so words shorter than 2 chars are
    # cut before the transform rather than relying on an empty range
    pairs = (
        wc.filter(F.length("word") >= 2)
        .select(
            "word",
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
    )
    stats = pairs.groupBy("pair").agg(
        F.sum("n").alias("pair_count"),
        F.count_distinct("word").alias("n_words"),
    )
    if min_count > 1:
        stats = stats.filter(F.col("pair_count") >= min_count)
    if top_n is not None:
        stats = stats.orderBy(
            F.col("pair_count").desc(), F.col("pair")
        ).limit(top_n)
    return stats


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    end_of_word: str = "</w>",
    max_vocab_words: "int | None" = None,
) -> "list[tuple[str, str]]":
    """Train ``num_merges`` BPE merges on the corpus (Sennrich et al.
    2016, Algorithm 1) and return them in merge order.

    One distributed pass (:func:`word_counts`) reduces the corpus to
    its word-frequency table; the merge loop then runs driver-side over
    that VOCABULARY-BOUNDED table (prune noise words with ``min_count``
    — after pruning, a web-scale vocabulary is megabytes). Each word is
    a symbol sequence ending in ``end_of_word``; every iteration merges
    the most frequent adjacent symbol pair (ties broken
    lexicographically — deterministic across runs and partitionings
    because the word table is a hash-exact aggregation).

    Incremental pair-count maintenance: only words CONTAINING the
    merged pair are re-segmented, and the global pair counter is
    adjusted by their delta — the classic inverted-index trick that
    makes the loop O(affected words) per merge instead of O(vocab).

    ``max_vocab_words`` (default :data:`MAX_VOCAB_WORDS`) is the
    fail-loud ceiling on the collected word table — a LIMIT-probe, so
    the over-cap case never ships more than cap+1 rows to the driver.
    On crawl-shaped text with ``min_count=1`` the distinct-"word" tail
    is corpus-sized; the error message says which knobs prune it.

    >>> df = spark.createDataFrame(
    ...     [(1, "low low low low low lower lower newest newest"),
    ...      (2, "newest newest newest newest widest widest widest")],
    ...     "doc_id long, text string")
    >>> merges = train_bpe(df, num_merges=4)
    >>> merges[0]
    ('e', 's')
    >>> merges[1]
    ('es', 't')
    >>> merges[2]
    ('est', '</w>')
    >>> merges[3]
    ('l', 'o')
    """
    from collections import Counter, defaultdict

    cap = MAX_VOCAB_WORDS if max_vocab_words is None else int(max_vocab_words)
    rows = (
        word_counts(df, text_col=text_col, min_count=min_count)
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        raise ValueError(
            "train_bpe collects the distinct-word frequency table to "
            f"the driver; more than {cap} distinct words found (after "
            f"min_count={min_count}). On crawl-shaped text the word "
            "tail (typos, URLs, binary junk) is corpus-sized — raise "
            "min_count to prune it (min_count>=2 typically cuts the "
            "tail by orders of magnitude), or pass a larger "
            "max_vocab_words if the driver can genuinely hold the "
            "table."
        )
    # symbol sequences per word + global pair counts + inverted index
    segs: dict[str, list[str]] = {}
    freqs: dict[str, int] = {}
    pair_counts: Counter = Counter()
    words_with: defaultdict = defaultdict(set)
    for r in rows:
        w, n = r["word"], r["n"]
        seq = list(w) + [end_of_word]
        segs[w], freqs[w] = seq, n
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] += n
            words_with[(a, b)].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(words_with[best]):
            seq, n = segs[w], freqs[w]
            # retract this word's pair contributions, re-segment, re-add
            for p in zip(seq, seq[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                words_with[p].discard(w)
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            segs[w] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += n
                words_with[p].add(w)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Segment every document with a trained merge list (appends
    ``out_col``: array of subword strings). The merge table is tiny and
    rides the UDF closure (broadcast by Spark's task serializer);
    segmentation is an Arrow-batched pandas UDF — per-word results are
    memoized per batch, so cost scales with DISTINCT words per batch,
    not tokens.

    >>> df = spark.createDataFrame([(1, "low lowest")], "doc_id long, text string")
    >>> out = apply_bpe(df, [("l", "o"), ("lo", "w")]).collect()[0]["bpe_tokens"]
    >>> out
    ['low', '</w>', 'low', 'e', 's', 't', '</w>']
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str, cache: dict) -> "list[str]":
        if w in cache:
            return cache[w]
        seq = list(w) + [end_of_word]
        while len(seq) > 1:
            pairs = [(ranks.get((a, b)), i) for i, (a, b) in
                     enumerate(zip(seq, seq[1:])) if (a, b) in ranks]
            if not pairs:
                break
            _, i = min(pairs)
            seq = seq[:i] + [seq[i] + seq[i + 1]] + seq[i + 2:]
        cache[w] = seq
        return seq

    # no inline type hints: ``from __future__ import annotations``
    # stringifies them, which breaks pandas_udf signature inference
    def _segment(texts):
        cache: dict = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    _segment.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    segment = pandas_udf(_segment, "array<string>")
    return df.withColumn(out_col, segment(F.col(text_col)))
