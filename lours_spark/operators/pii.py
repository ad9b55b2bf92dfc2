"""PII detection / redaction over text columns.

The standard curation pass an LLM training-data pipeline runs before
anything else ships: find personally-identifying strings (emails, IPv4
addresses, phone numbers) and either count them (for filtering docs
above a PII density threshold) or rewrite them to placeholder tokens.

Spark shape: pure column expressions — ``regexp_count`` /
``regexp_replace`` run JVM-side inside whole-stage codegen, so the scan
is one pass over the text column with no Python, no UDF, no shuffle.
The patterns deliberately use only syntax shared by Java regex and RE2
(character classes, bounded repetition, non-capturing groups, ``\\b``)
so the same expressions run verbatim on other engines — which is also
what makes the DuckDB oracle an exact twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern table: name -> (regex, replacement token). Order matters for
#: redaction: emails first (their dotted domains would otherwise be
#: visible to the looser patterns), then IPs, then phones.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "ipv4": (
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
    "phone": (
        r"\+\d{7,15}|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        "[PHONE]",
    ),
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts as columns (long)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token,
    applied in the declared pattern order.

    >>> df = spark.createDataFrame(
    ...     [("mail bob@example.com from 10.0.0.1",)], "text string")
    >>> df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
    'mail [EMAIL] from [IP]'
    """
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """Per-document PII report: one row per document with a count per
    PII kind and (optionally) the redacted text length — the columns a
    filtering pass needs to drop or clean documents, computed in a
    single codegen'd projection."""
    counts = pii_counts(F.col(text_col))
    cols = [F.col(id_col)] + [
        c.alias(f"n_{name}") for name, c in counts.items()
    ]
    if redact:
        cols.append(
            F.length(redact_pii(F.col(text_col))).cast("long").alias("redacted_len")
        )
    return df.select(*cols)


def filter_pii_dense(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_total_pii: int = 0,
) -> DataFrame:
    """Documents whose total PII match count is within the threshold
    (the drop-the-rest filtering pass). Predicate-only: pushes down to
    the scan like any other filter.

    >>> df = spark.createDataFrame(
    ...     [(1, "clean text"), (2, "leak: a@b.io")], "doc_id long, text string")
    >>> [r["doc_id"] for r in filter_pii_dense(df).collect()]
    [1]
    """
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.filter(total <= max_total_pii)
