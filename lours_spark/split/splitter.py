"""Split assignment operators.

Re-expresses reference ``lours/dataset/split/dataset_splitter.py``:

- ``simple_split`` (``:154-233``): random split honoring already-
  assigned rows → seeded ``rand()`` + a cumulative-share ``when``
  ladder; residual target shares computed from one counts agg;
- ``hash_split``: the deterministic, engine-portable variant (a
  Knuth-multiplicative hash of the id) — THE splitter to use at 100 TB:
  stable under retries/recomputation, no RNG state, reproducible across
  engines (and therefore oracle-checkable);
- balanced split: see ``balanced.py`` (distributed histograms + driver
  greedy assignment over atomic chunks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant (2^32 / golden ratio)
_KNUTH = 2654435761
_M32 = 2**32


def hash_fraction(id_col: Column) -> Column:
    """Deterministic uniform [0,1) fraction from a non-negative integer
    id — identical arithmetic in any engine: ((id * K) mod 2^32) / 2^32.

    >>> df = spark.createDataFrame([(0,), (1,), (2**62,)], "id long")
    >>> got = [r["f"] for r in
    ...        df.select(hash_fraction(F.col("id")).alias("f")).collect()]
    >>> got == [((i * _KNUTH) % _M32) / _M32 for i in (0, 1, 2**62)]
    True

    A naive 64-bit ``id * K`` silently wraps negative for id ≳ 3.47e9
    (2^63 / K), which would funnel every such row into the first split —
    exactly the scale this splitter is advertised for. Instead of paying
    a DECIMAL(38,0) multiply on every row, reduce ``a = id mod 2^32``
    first and split it into 16-bit halves::

        (a*K) mod 2^32 = ((a>>16)*K mod 2^16) * 2^16 + (a & 0xFFFF)*K,
                         all mod 2^32

    Every partial product is < 2^48 so the whole computation stays in
    plain BIGINT (codegen-friendly, no decimal), with residues identical
    to the wide multiply. The residue is < 2^32 so the final double
    divide is exact and bit-identical across engines.

    Negative ids reduce via ``pmod`` (Spark's ``%`` follows the
    dividend sign — a plain modulo would yield a negative fraction and
    funnel every negative-id row into the first split):

    >>> neg = spark.createDataFrame([(-1,), (-2**40,)], "id long")
    >>> fr = [r["f"] for r in
    ...       neg.select(hash_fraction(F.col("id")).alias("f")).collect()]
    >>> all(0 <= f < 1 for f in fr)
    True
    """
    a = F.pmod(id_col.cast("bigint"), F.lit(_M32))
    hi = F.shiftright(a, 16)
    lo = a.bitwiseAND(F.lit(0xFFFF))
    mixed = ((hi * F.lit(_KNUTH)) % F.lit(65536)) * F.lit(65536) + lo * F.lit(_KNUTH)
    return (mixed % F.lit(_M32)).cast("double") / F.lit(float(_M32))


def split_ladder(frac: Column, shares: dict[str, float]) -> Column:
    """Map a [0,1) fraction to a split name by cumulative shares."""
    expr = None
    cum = 0.0
    items = list(shares.items())
    for name, share in items[:-1]:
        cum += share
        cond = frac < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    shares: dict[str, float],
    id_col: str = "id",
    out_col: str = "split",
    keep_existing: bool = True,
) -> DataFrame:
    """Deterministic split assignment; already-assigned rows keep their
    value when ``keep_existing`` (reference's already-assigned handling,
    ``dataset_splitter.py:175-210``), and the unassigned remainder is
    laddered with RESIDUAL target shares (one counts aggregation) so the
    FINAL proportions — existing plus new — hit the targets, instead of
    re-applying the full shares to the remainder and overshooting
    whatever is already over-represented."""
    if keep_existing and out_col in df.columns:
        resid = residual_shares(df, shares, out_col)
        assigned = F.coalesce(
            F.col(out_col), split_ladder(hash_fraction(F.col(id_col)), resid)
        )
    else:
        assigned = split_ladder(hash_fraction(F.col(id_col)), shares)
    return df.withColumn(out_col, assigned)


def portable_fraction(id_col: Column, seed: int) -> Column:
    """Seeded, engine-portable uniform [0,1) fraction: the first 52
    bits (13 hex digits) of ``md5(f"{seed}:{id}")`` divided by 2^52.
    Unlike ``rand(seed)`` (partition-lineage dependent) or python's
    Mersenne Twister (python-only), any engine with ``md5`` reproduces
    it exactly: the 52-bit integer and the divide are both exact in a
    double, so the fraction is bit-identical across Spark, DuckDB and
    python (``int(md5(...).hexdigest()[:13], 16) / 2**52``).

    >>> import hashlib
    >>> df = spark.createDataFrame([(7,)], "id long")
    >>> [f] = [r["f"] for r in
    ...        df.select(portable_fraction(F.col("id"), 42).alias("f")).collect()]
    >>> f == int(hashlib.md5(b"42:7").hexdigest()[:13], 16) / 2**52
    True
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    v = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    return v.cast("double") / F.lit(float(2**52))


def simple_split(
    df: DataFrame,
    shares: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
    keep_existing: bool = True,
    id_col: str = "id",
    rng: str = "spark",
) -> DataFrame:
    """Seeded-random split (reference ``simple_split``,
    ``dataset.py:4257-4382``). Pre-assigned rows keep their value and
    the remainder is laddered with residual shares, like
    :func:`hash_split`.

    ``rng`` picks the random source: ``"spark"`` (default) uses
    ``rand(seed)`` — deterministic per partition lineage but NOT stable
    under repartitioning; ``"portable"`` uses
    :func:`portable_fraction` — a seeded md5 PRF of ``id_col`` that is
    retry-stable, repartition-stable, and replicable in any engine
    (this is what the correctness gate oracles). Prefer ``hash_split``
    or ``rng="portable"`` for anything reproducible at scale."""
    if rng == "spark":
        frac = F.rand(seed)
    elif rng == "portable":
        frac = portable_fraction(F.col(id_col), seed)
    else:
        raise ValueError(f"unknown rng {rng!r}")
    if keep_existing and out_col in df.columns:
        resid = residual_shares(df, shares, out_col)
        assigned = F.coalesce(F.col(out_col), split_ladder(frac, resid))
    else:
        assigned = split_ladder(frac, shares)
    return df.withColumn(out_col, assigned)


def residual_shares(
    df: DataFrame,
    shares: dict[str, float],
    out_col: str = "split",
) -> dict[str, float]:
    """Target shares for the not-yet-assigned remainder, given rows
    already assigned (reference ``dataset_splitter.py:175-210``):
    subtract the already-assigned mass from each split's target and
    renormalize over unassigned rows. One counts aggregation."""
    counts = {
        r[out_col]: r["n"]
        for r in df.groupBy(out_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    unassigned = counts.get(None, 0)
    if unassigned == 0 or total == 0:
        return dict(shares)
    resid = {}
    for name, share in shares.items():
        have = counts.get(name, 0)
        want = share * total
        resid[name] = max(0.0, want - have)
    s = sum(resid.values())
    if s <= 0:
        return {k: 1.0 / len(shares) for k in shares}
    return {k: v / s for k, v in resid.items()}
