"""Deterministic sampling operators for training-data curation.

``df.sample()`` is nondeterministic under retries and repartitioning
(per-partition RNG streams), which poisons reproducibility and makes
results oracle-uncheckable. Everything here derives the keep decision
from a seeded md5 hash of the row id — bit-identical across engines,
retries, partitionings, and cluster sizes:

- :func:`hash_sample` — Bernoulli sample at a global or per-stratum
  rate; pure Column predicate, no shuffle at all.
- :func:`stratified_sample` — per-stratum rates from a dict (e.g.
  rebalance languages: ``{"en": 0.1, "yo": 1.0}``).
- :func:`deterministic_sample_n` — exactly-n sample as top-n by hash;
  compiles to TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lours_spark.functions.text import md5_long

_M32 = 2**32


def sample_fraction(id_col: Column, seed: int | str = 0) -> Column:
    """Seeded uniform [0,1) fraction of an id: low 32 bits of the
    60-bit md5-prefix hash, divided out — exact in double, and
    reproducible in any engine that has md5 (the DuckDB twin is the
    suite's ``dd_md5_long``)."""
    return (
        (md5_long(id_col.cast("string"), seed) % F.lit(_M32)).cast("double")
        / F.lit(float(_M32))
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "id",
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash fraction
    falls below ``fraction``. A pure filter — pushes down, costs no
    shuffle, and the same (id, seed) always makes the same decision.

    >>> df = spark.range(1000)
    >>> n = hash_sample(df, 0.25).count()
    >>> 200 < n < 300
    True
    >>> hash_sample(df, 0.25).count() == n  # deterministic
    True
    """
    return df.filter(sample_fraction(F.col(id_col), seed) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "id",
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the rebalancing primitive:
    downsample over-represented languages/sources, keep the rest).
    The per-stratum rate is a literal-map lookup — still a pure
    filter, no shuffle, no collect."""
    pairs = []
    for k, v in fractions.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    rate = (
        F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)],
            F.lit(float(default_fraction)),
        )
        if pairs
        else F.lit(float(default_fraction))
    )
    return df.filter(sample_fraction(F.col(id_col), seed) < rate)


def deterministic_sample_n(
    df: DataFrame,
    n: int,
    id_col: str = "id",
    seed: int | str = 0,
) -> DataFrame:
    """Exactly-n deterministic sample: the n smallest hash values
    (ties impossible: the hash is keyed by the unique id, and id
    breaks any residual tie). ``orderBy().limit(n)`` compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge of n
    rows, not a global sort."""
    return (
        df.withColumn("__hf", sample_fraction(F.col(id_col), seed))
        .orderBy(F.asc("__hf"), F.asc(id_col))
        .limit(n)
        .drop("__hf")
    )


def mixture_weights(
    df: DataFrame,
    target_shares: dict[str, float],
    shard_col: str = "source",
    token_col: Column | str | None = None,
) -> DataFrame:
    """Per-shard subsampling rates that move the corpus token mixture
    toward ``target_shares`` WITHOUT upsampling (the static
    domain-reweighting step of a pretraining data recipe): with
    ``current_s`` the shard's token share, the common scale is
    ``min_s(current_s / target_s)`` — the most under-represented shard
    keeps everything (rate 1.0) and every other shard downsamples to
    ``scale · target_s / current_s``. The post-sampling EXPECTED token
    mixture equals the NORMALIZED ``target_shares`` exactly (each
    shard contributes ``scale · target_s`` of the original corpus;
    targets are normalized to sum 1 first, so count-style dicts work
    and a dict that doesn't sum to 1 yields the proportional mixture,
    not a silently skewed one).

    One tiny aggregation (|shards| rows — broadcast the result into
    :func:`apply_mixture`'s filter); shards missing from
    ``target_shares`` (or with an explicit 0.0 target) get rate 0.0
    (dropped domains), and a targeted shard with ZERO current tokens
    gets rate 1.0 without contaminating the scale (the min is taken
    over positive ratios only — a zero ratio would otherwise zero
    every weight, or divide-by-zero under ANSI mode). Returns
    ``shard, n_tok_total, share, weight``.
    """
    from pyspark.sql import Window

    from lours_spark.functions.text import resolve_token_col

    n_tok = resolve_token_col(token_col)

    # normalize so the documented "expected mixture == targets" holds
    # even for count-style or typo'd dicts that don't sum to 1 (the
    # realized mixture is always proportional to the targets).
    # Epsilon-gated like greedy_assign: fraction dicts whose float sum
    # is 0.999... keep their literal values (oracle-mirrorable)
    tot_target = sum(float(v) for v in target_shares.values())
    if tot_target and abs(tot_target - 1.0) > 1e-9:
        norm = {k: float(v) / tot_target for k, v in target_shares.items()}
    else:
        norm = {k: float(v) for k, v in target_shares.items()}
    pairs = []
    for k, v in norm.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    # empty dict: create_map() yields map<void,void> whose lookup
    # fails analysis — fall back to a NULL target (-> weight 0.0
    # everywhere, the documented dropped-domain semantics)
    target = (
        F.create_map(*pairs)[F.col("shard")]
        if pairs
        else F.lit(None).cast("double")
    )

    per = (
        df.select(F.col(shard_col).alias("shard"), n_tok.alias("__n"))
        .groupBy("shard")
        .agg(F.sum("__n").alias("n_tok_total"))
    )
    w = Window.partitionBy()
    ratio = F.when(target > 0, F.col("share") / target)  # else NULL
    min_pos_ratio = F.min(F.when(F.col("__ratio") > 0, F.col("__ratio"))).over(w)
    return (
        per.withColumn(
            "share",
            F.col("n_tok_total") / F.sum("n_tok_total").over(w),
        )
        .withColumn("__ratio", ratio)
        .withColumn(
            "weight",
            F.when(target.isNull() | (target <= 0), F.lit(0.0))
            .when(F.col("__ratio") == 0, F.lit(1.0))
            .otherwise(F.coalesce(min_pos_ratio / F.col("__ratio"), F.lit(1.0))),
        )
        .select("shard", "n_tok_total", "share", "weight")
    )


def apply_mixture(
    df: DataFrame,
    weights: DataFrame,
    shard_col: str = "source",
    id_col: str = "id",
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic Bernoulli application of :func:`mixture_weights`:
    broadcast-join the (|shards|-row) weights frame and keep rows whose
    seeded hash fraction falls under their shard's rate — a pure
    filter after a broadcast join, no shuffle of the corpus."""
    wsel = F.broadcast(
        weights.select(
            F.col("shard").alias(shard_col), F.col("weight").alias("__w")
        )
    )
    return (
        df.join(wsel, shard_col, "left")
        .filter(
            sample_fraction(F.col(id_col), seed)
            < F.coalesce(F.col("__w"), F.lit(0.0))
        )
        .drop("__w")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: "list[str] | str",
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Cap rows per group at the ``k`` best by ``order_col`` (the
    "at most N documents per domain, keep the longest/highest-quality"
    curation step — C4/RefinedWeb-style host caps).

    Deterministic: ties on ``order_col`` break by ``tiebreak_col``
    (required when ``order_col`` has duplicates, else the kept set is
    plan-dependent). Appends ``rank_col`` (1-based within group).

    Scale shape: one hash exchange on the group key + a per-group
    window — no global sort. Skewed groups (one host owning millions
    of rows) serialize inside one task; AQE skew splitting does not
    apply to windows, so for pathological hosts pre-filter with an
    approximate per-group count cap first.

    >>> df = spark.createDataFrame(
    ...     [(1, "a", 10), (2, "a", 30), (3, "a", 20), (4, "b", 5)],
    ...     "doc_id long, source string, n_chars long")
    >>> sorted((r["doc_id"], r["cap_rank"]) for r in
    ...        cap_per_group(df, "source", "n_chars", k=2,
    ...                      tiebreak_col="doc_id").collect())
    [(2, 1), (3, 2), (4, 1)]
    """
    from pyspark.sql import Window

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int | str = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows with inclusion
    probability proportional to ``weight_col`` (Efraimidis-Spirakis
    A-ES, "Weighted random sampling with a reservoir", IPL 2006) —
    the "sample a token-budget worth of documents, longer/higher-
    quality docs proportionally more often" curation step.

    Each row gets an exponential key ``-ln(u)/w`` from a seeded md5
    uniform ``u`` of its id; the k SMALLEST keys are exactly a
    weighted sample without replacement. Deterministic across retries,
    partitionings and engines (the uniform is the same md5 PRF as
    :func:`hash_sample`; ``ln`` agrees to the ulp across libm
    implementations in practice, and key ties additionally break by
    id).

    Scale shape: a pure column expression + ``orderBy(key).limit(k)``,
    which compiles to TakeOrderedAndProject — every partition keeps
    its local top-k, the driver merges k-sized heaps; no global sort,
    no shuffle of the losers. The final 1-based ``rank_col`` is a
    window over the ALREADY-REDUCED k-row frame (k ~ 10²-10⁵ —
    driver-bounded by construction, never corpus-sized).

    Rows with NULL or non-positive weight can never be sampled (they
    are filtered, matching "weight 0 = never include").

    >>> df = spark.createDataFrame(
    ...     [(i, 1 + (i % 7)) for i in range(400)], "doc_id long, w long")
    >>> out = weighted_sample(df, "w", k=50)
    >>> out.count()
    50
    >>> heavy = out.filter("w >= 6").count()  # heavy rows oversampled
    >>> light = out.filter("w <= 2").count()
    >>> bool(heavy > light)
    True
    >>> [r["sample_rank"] for r in out.orderBy("sample_rank").limit(3).collect()]
    [1, 2, 3]
    """
    from pyspark.sql import Window

    # u in (0, 1]: low 32 md5 bits + 1, over 2^32 — u=1 gives key 0
    # exactly (best rank); a plain [0,1) fraction would map u=0 to an
    # unsampleable +inf key instead
    u = (
        (md5_long(F.col(id_col).cast("string"), seed) % F.lit(_M32) + 1)
        .cast("double")
        / F.lit(float(_M32))
    )
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__key", -F.log(u) / F.col(weight_col).cast("double"))
    top = keyed.orderBy(F.col("__key"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("__key"), F.col(id_col))
    return (
        top.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .drop("__key")
    )
