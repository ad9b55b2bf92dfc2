"""Text-analysis column functions for training-data pipelines.

All JVM-side Catalyst expressions (no Python UDFs): tokenization,
language-ID heuristic, quality scoring, token counting, shingling, and
md5-based numeric hashing (the portable primitive under MinHash /
SimHash / fingerprinting — md5 is bit-identical across engines, which
keeps every one of these operators oracle-checkable).

Scale notes: everything is a narrow per-row transformation — no
shuffle; shingle explosion multiplies rows ~(tokens-k) per doc, so
downstream joins should aggregate (minhash) before shuffling where
possible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit md5-prefix hash: stays inside a signed 64-bit long.
_HEX_DIGITS = 15

#: tiny stopword lists for the language-ID heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "es", "por", "con"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization to a lowercase word array."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def resolve_token_col(token_col, text_col: str = "text") -> Column:
    """Shared token-count column resolution for the packing/mixture
    operators: ``None`` → whitespace :func:`token_count` of
    ``text_col``; a name → that column; a Column → itself. Always cast
    to long.

    >>> from pyspark.sql import Column
    >>> isinstance(resolve_token_col(None), Column)
    True
    >>> isinstance(resolve_token_col("n_tok"), Column)
    True
    """
    if token_col is None:
        return token_count(F.col(text_col)).cast("long")
    if isinstance(token_col, str):
        return F.col(token_col).cast("long")
    return token_col.cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count.

    >>> df = spark.createDataFrame([("The quick  brown fox",)], ["text"])
    >>> df.select(token_count(F.col("text")).alias("n")).first()["n"]
    4
    """
    return F.size(tokens(text))


def md5_long(value: Column, seed: int | str = 0) -> Column:
    """Deterministic 60-bit hash: ``conv(substr(md5(seed:value),1,15),16,10)``.

    Portable across engines (DuckDB replicates md5 exactly), unlike
    xxhash64/murmur which are engine-specific — this is what makes the
    MinHash/SimHash operators oracle-checkable.
    """
    seeded = F.concat(F.lit(f"{seed}:"), value)
    return F.conv(F.substring(F.md5(seeded), 1, _HEX_DIGITS), 16, 10).cast("long")


def _bind(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``fn`` as a lambda
    variable. Higher-order functions are interpreted (no codegen
    subexpression elimination) and CollapseProject inlines projection
    expressions, so a repeated subtree like ``split(text)`` re-runs per
    reference — wrapping it in a single-element array transform makes
    it a bound variable instead."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a document (tokens evaluated
    once via lambda binding — see ``_bind``).

    >>> df = spark.createDataFrame([("a b c d",)], ["text"])
    >>> df.select(word_shingles(F.col("text")).alias("s")).first()["s"]
    ['a b c', 'b c d']
    """

    def build(w: Column) -> Column:
        n = F.size(w)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
        # degenerate docs shorter than k words → single shingle
        return F.array_distinct(
            F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", w)))
        )

    return _bind(tokens(text), build)


def minhash_signature(shingles: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash signature: per seed, min md5-hash over the shingle set.

    Computed as ``array_min(transform(...))`` — stays inside codegen,
    no explode, no shuffle; the signature reduces each document to
    ``num_hashes`` longs before any join happens (the scale path).
    """
    def _hasher(seed: int):
        # NB: capture via factory — pyspark inspects lambda arity, so a
        # default-arg capture would be misread as the (value, index) form
        return lambda s: md5_long(s, seed)

    return [
        F.array_min(F.transform(shingles, _hasher(i))) for i in range(num_hashes)
    ]


def simhash(tokens_col: Column, bits: int = 16) -> Column:
    """SimHash over a token array: for each bit, sum ±1 weighted by
    token-hash bit, then pack the sign bits into a long."""
    h = F.transform(tokens_col, lambda t: md5_long(t, "simhash"))

    def step(acc: Column, x: Column) -> Column:
        # one pass over the hashes, all bit counters updated together
        return F.array(
            *[
                F.element_at(acc, b + 1)
                + F.when(
                    F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
                for b in range(bits)
            ]
        )

    votes = F.aggregate(
        h, F.array(*[F.lit(0).cast("long")] * bits), step
    )

    def pack(vs: Column) -> Column:
        out = F.lit(0).cast("long")
        for b in range(bits):
            out = out + F.when(
                F.element_at(vs, b + 1) > 0, F.lit(2**b).cast("long")
            ).otherwise(0)
        return out

    return _bind(votes, pack)


def language_id(text: Column) -> Column:
    """n-gram/stopword language heuristic: count stopword hits per
    language, pick the argmax (ties broken by language code order).

    >>> df = spark.createDataFrame(
    ...     [("the cat and the dog were here",),
    ...      ("el perro es una de las cosas que",)], ["text"])
    >>> [r["l"] for r in df.select(language_id(F.col("text")).alias("l")).collect()]
    ['en', 'es']
    """
    w = tokens(text)
    scores = [
        (
            lang,
            F.size(
                F.array_intersect(
                    F.array_distinct(w), F.array(*[F.lit(s) for s in sw])
                )
            ),
        )
        for lang, sw in sorted(LANG_STOPWORDS.items())
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("unknown")
    for lang, s in reversed(scores):
        result = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(
            result
        )
    return result


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: mean of
    length-in-range, low-punctuation-ratio and stopword-presence signals
    (the shape of reference-free quality filters in LLM data pipelines)."""
    n = F.length(text)
    n_punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(1.0))
    toks = tokens(text)
    n_tok = F.size(toks)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]]),
        )
    )
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(
        (n_tok > 0) & (stop_hits >= 1), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / 3.0


def normalize_text(text: Column, lowercase: bool = True) -> Column:
    """Canonical text normalization before fingerprinting / dedup:
    strip C0/C1 control characters (except the whitespace ones, which
    the next step absorbs), collapse every whitespace run to one
    space, trim, and optionally lowercase. A pure codegen'd
    ``regexp_replace`` chain — no UDF — and the patterns are in the
    Java-regex ∩ RE2 subset, so other engines (DuckDB oracle included)
    reproduce it byte-for-byte. NULL passes through as NULL.

    Normalizing first is what makes hash-based dedup effective:
    ``fingerprint``/MinHash treat ``"A  b"`` and ``"a b"`` as distinct
    documents without it.

    >>> df = spark.createDataFrame(
    ...     [(" The\\tQuick\\x01  brown FOX \\n",)], ["t"])
    >>> df.select(normalize_text(F.col("t")).alias("n")).first()["n"]
    'the quick brown fox'
    """
    out = F.regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    out = F.trim(F.regexp_replace(out, "\\s+", " "))
    return F.lower(out) if lowercase else out


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the CCNet-style gibberish detector: natural prose
    sits ~4–4.5 bits, base64/hex blobs and key-mash spam push past 5,
    single-char spam collapses toward 0.

    Pure column expressions: split-to-chars, SORTED distinct alphabet
    (sorting fixes the floating-point summation ORDER, which is what
    makes the value bit-reproducible across engines and partitionings
    — ``array_distinct`` order is first-occurrence, not stable across
    implementations), then one ``aggregate`` accumulating
    ``-p*log2(p)``. Per-doc cost is |alphabet| x |doc| filter scans —
    alphabets are small (<100) — with no shuffle, no explode, no
    Python. Empty/NULL-ish docs yield 0.0.

    >>> df = spark.createDataFrame([("aaaa", "abab", "abcd")], ["a", "b", "c"])
    >>> r = df.select(*[F.round(char_entropy(F.col(c)), 6).alias(c)
    ...                 for c in "abc"]).first()
    >>> (r["a"], r["b"], r["c"])
    (0.0, 1.0, 2.0)
    """

    def build(chars: Column) -> Column:
        n = F.size(chars)
        alphabet = F.array_sort(F.array_distinct(chars))
        ent = F.aggregate(
            alphabet,
            F.lit(0.0),
            lambda acc, c: acc
            - _bind(
                F.size(F.filter(chars, lambda x: x == c)) / n,
                lambda p: p * F.log2(p),
            ),
        )
        return F.when(n > 0, ent).otherwise(F.lit(0.0))

    # split('') yields a trailing '' element in Spark — drop empties so
    # the alphabet holds only real characters
    return _bind(
        F.filter(F.split(text, ""), lambda x: x != F.lit("")), build
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — catches token-permutation near-duplicates.

    >>> df = spark.createDataFrame(
    ...     [("the quick brown fox", "fox brown QUICK the", "another doc")],
    ...     ["a", "b", "c"])
    >>> r = df.select(*[fingerprint(F.col(c)).alias(c) for c in "abc"]).first()
    >>> r["a"] == r["b"], r["a"] == r["c"]
    (True, False)
    """
    normalized = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(normalized)
