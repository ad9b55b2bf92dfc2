"""Z-order (Morton) layout for multi-dimensional data skipping.

A 100 TB table is pruned at scan time by parquet/Delta min-max file
statistics — but sorting by one key gives tight min/max ranges on THAT
key only; a filter on a second column still reads every file. Z-order
interleaves the bits of several keys so files cluster in ALL of them
at once: each file covers a small hyper-rectangle, and a predicate on
any z-ordered column prunes most files (the standard lakehouse
technique — Morton 1966; OPTIMIZE ZORDER in Delta/Iceberg).

Two pieces:

- :func:`zorder_key` — a pure Column expression interleaving the low
  ``bits`` of n non-negative integer columns into one BIGINT
  (column i owns bit positions ``j*n + i``). All shifts/masks are
  JVM-side integer ops inside whole-stage codegen; reproducible in
  any engine with ``>>``/``&``/``<<``. Callers quantize first —
  :func:`quantize` maps an arbitrary numeric column onto ``[0, 2^bits)``
  from an explicit (min, max) range (explicit, not observed: observed
  ranges change per run and would make file layout nondeterministic).
- :func:`write_zordered` — repartitionByRange on the z-key +
  sortWithinPartitions, then a parquet write: each output file covers
  one contiguous z-range, i.e. one hyper-rectangle, which is what the
  min-max pruner needs. Range partitioning samples bounds, so file
  BOUNDARIES may shift between runs; the ORDER (and thus the skipping
  quality) is deterministic.

``n_cols * bits`` must be <= 62 to stay in a signed BIGINT.

Beyond two columns Morton degrades gracefully, not silently: per-axis
resolution within a fixed file budget falls as bits/n (64 files over a
64³ grid: aligned tiles span 15 cells per axis vs 7 for 2-D), and the
curve's discontinuities mean a file whose z-range crosses a HIGH
interleaved-bit boundary can span a full axis. Measured on that 64³
grid: 62/64 files stay <= half an axis on EVERY column, two
boundary-crossing files span one axis fully (test_zorder_three_column_spans;
SCALING.md "z-order at three columns").

For workloads where those boundary outliers matter,
``write_zordered(..., curve="hilbert")`` orders by a HILBERT index
instead (Skilling's 2004 transpose algorithm, public domain — "
Programming the Hilbert curve", AIP Conf. Proc. 707): the Hilbert
curve is continuous, so every contiguous key range is a connected
region and no file ever jumps across the space. Measured on the same
64³ grid the full-axis outliers disappear
(test_hilbert_three_column_spans). The write path uses the
Arrow-batched numpy :func:`hilbert_key` — measured the faster form at
scale (6M rows: 6.0s write vs 1.8s Morton; the codegen unroll
:func:`with_hilbert_key` is value-identical but blows Spark's
``hugeMethodLimit`` at default config and degrades to 25.5s — see its
docstring for when it wins). Morton stays the default because its key
is ONE cheap codegen expression and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(
    col: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Map a numeric column onto integer cells ``[0, 2^bits)`` over the
    explicit ``[lo, hi]`` range (clamped — out-of-range values land in
    the edge cells, they never wrap). NULL input → NULL cell (the
    downstream curve keys propagate NULL, so missing-coordinate rows
    cluster together instead of polluting an edge cell — without the
    explicit guard, Spark's NULL-skipping ``greatest``/``least`` would
    silently send NULLs to the TOP cell).

    >>> df = spark.createDataFrame(
    ...     [(0.0,), (50.0,), (100.0,), (999.0,), (None,)], "x double")
    >>> [r["q"] for r in df.select(quantize(F.col("x"), 0, 100, bits=8).alias("q")).collect()]
    [0, 127, 255, 255, None]
    """
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    ) * F.lit(float(cells))
    return F.when(
        col.isNotNull(),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(cells).cast("long"), F.floor(scaled)),
        ),
    )


def zorder_key(cols: "list[Column]", bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of n non-negative integer
    columns into one Morton key (column i owns bit ``j*n + i`` for
    input bit j — lowest input bits stay lowest, so z-order locality
    matches value locality on every column).

    >>> df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x long, y long")
    >>> [r["z"] for r in df.select(
    ...     zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")).collect()]
    [0, 1, 2, 15]
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            bit = F.shiftright(masked, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def _hilbert_transpose(X, bits: int):
    """Skilling's AxesToTranspose, vectorized over rows: mutate the
    (rows × n_dims) uint64 coordinate matrix into Hilbert "transpose"
    form (J. Skilling, "Programming the Hilbert curve", AIP Conf.
    Proc. 707, 2004 — the standard public-domain bit-twiddling
    recipe, here with numpy boolean masks replacing the per-point
    branches)."""
    import numpy as np

    n = X.shape[1]
    M = np.uint64(1) << np.uint64(bits - 1)
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            hit = (X[:, i] & Q) != 0
            # bit set: invert the low bits of axis 0
            X[hit, 0] ^= P
            # bit clear: exchange the low bits of axis i and axis 0
            t = (X[~hit, 0] ^ X[~hit, i]) & P
            X[~hit, 0] ^= t
            X[~hit, i] ^= t
        Q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), dtype=np.uint64)
    Q = M
    while Q > np.uint64(1):
        hit = (X[:, n - 1] & Q) != 0
        t[hit] ^= Q - np.uint64(1)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t
    return X


def _hilbert_index_array(X, bits: int):
    """(rows × n_dims) quantized coords → Hilbert index (uint64), by
    interleaving the transpose's bits MSB-first, axis 0 outermost."""
    import numpy as np

    n = X.shape[1]
    T = _hilbert_transpose(X.astype(np.uint64, copy=True), bits)
    H = np.zeros(len(T), dtype=np.uint64)
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            bit = (T[:, i] >> np.uint64(j)) & np.uint64(1)
            H = (H << np.uint64(1)) | bit
    return H


def with_hilbert_key(
    df: DataFrame, cols: "list[str]", bits: int = 16,
    key_col: str = "hilbert_key",
) -> DataFrame:
    """Add the Hilbert index of n already-quantized non-negative
    integer columns as ``key_col`` — PURE CODEGEN, no Python stage.

    Skilling's transpose is fixed-trip-count loops over bit positions,
    so it unrolls into a chain of narrow projections: one
    ``withColumns`` per (Q, axis) step of AxesToTranspose, then the
    Gray/rotation fixups and MSB-first bit interleave as single linear
    expressions. Each step's CASE references its inputs more than
    once, which keeps CollapseProject from inlining the chain into one
    exponential expression (Spark only collapses cheap or
    singly-referenced aliases), while whole-stage codegen fuses every
    projection into one compiled stage. Cannot be a single ``Column``
    (the expression TREE would be exponential in ``bits``), hence the
    DataFrame-in/DataFrame-out form; :func:`hilbert_key` is the
    Column-expression (Arrow pandas UDF) twin, and the two are
    value-identical (test_hilbert_codegen_matches_arrow).

    MEASURED CAVEAT (6M rows, bits=16, n=2 — SCALING.md round 10): the
    fused method exceeds ``spark.sql.codegen.hugeMethodLimit`` (65535
    bytecode) at DEFAULT config, so Spark silently degrades to ~62
    row-materializing projections — key evaluation 5.7s vs the Arrow
    twin's ~4.2s total overhead, and a full ``write_zordered`` pass
    25.5s vs 6.0s. With ``hugeMethodLimit`` raised (e.g. 1000000) the
    fused stage is kept and evaluation drops to 3.2s vs Morton's 2.6s
    — competitive and JVM-only. :func:`write_zordered` therefore uses
    the Arrow twin by default; reach for this form when Python workers
    are unavailable AND the session can raise ``hugeMethodLimit``.

    NULL in any coordinate → NULL key, like both twins.

    >>> df = spark.createDataFrame([(0, 0), (0, 1), (1, 1), (1, 0)],
    ...                            "x long, y long")
    >>> sorted((r["h"], r["x"], r["y"]) for r in with_hilbert_key(
    ...     df, ["x", "y"], bits=1, key_col="h").collect())
    [(0, 0, 0), (1, 0, 1), (2, 1, 1), (3, 1, 0)]
    """
    n = len(cols)
    if n < 2:
        raise ValueError("with_hilbert_key needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    mask = (1 << bits) - 1
    xs = [f"__hx{i}" for i in range(n)]
    scratch = {"__hnull", "__ht", *xs}
    clash = scratch & (set(df.columns) | set(cols))
    if clash:
        # a coordinate (or pre-existing) column with a scratch name
        # would be silently consumed and dropped; a key_col with one
        # would be computed then dropped — refuse loudly instead
        raise ValueError(
            f"with_hilbert_key scratch names in use: {sorted(clash)} — "
            "rename those columns first"
        )
    if key_col in scratch:
        raise ValueError(f"key_col {key_col!r} collides with a scratch name")
    if key_col in df.columns:
        # silent overwrite would destroy a data column (or a
        # coordinate: key_col='x' would replace x with the key) —
        # fail loudly like the scratch guard above
        raise ValueError(
            f"key_col {key_col!r} already exists in the frame — "
            "pick another name or drop it first"
        )
    X = [F.col(c) for c in xs]
    null_any = F.col(f"`{cols[0]}`").isNull()
    for c in cols[1:]:
        null_any = null_any | F.col(f"`{c}`").isNull()
    df = df.withColumns(
        {
            "__hnull": null_any,
            **{
                xs[i]: F.coalesce(F.col(f"`{c}`").cast("long"), F.lit(0))
                .bitwiseAND(F.lit(mask))
                for i, c in enumerate(cols)
            },
        }
    )
    # AxesToTranspose, one projection per (Q, axis) step; within a
    # projection both updated axes read the PREVIOUS projection's
    # columns (withColumns is a single select)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            hit = X[i].bitwiseAND(F.lit(Q)) != F.lit(0)
            if i == 0:
                df = df.withColumns(
                    {xs[0]: F.when(hit, X[0].bitwiseXOR(F.lit(P))).otherwise(X[0])}
                )
            else:
                t = X[0].bitwiseXOR(X[i]).bitwiseAND(F.lit(P))
                df = df.withColumns(
                    {
                        xs[0]: F.when(
                            hit, X[0].bitwiseXOR(F.lit(P))
                        ).otherwise(X[0].bitwiseXOR(t)),
                        xs[i]: F.when(hit, X[i]).otherwise(X[i].bitwiseXOR(t)),
                    }
                )
        Q >>= 1
    # Gray encode: new X[i] = XOR of old X[0..i] — one projection
    upd = {}
    acc = X[0]
    for i in range(1, n):
        acc = acc.bitwiseXOR(X[i])
        upd[xs[i]] = acc
    if upd:
        df = df.withColumns(upd)
    # rotation fixup: t accumulates Q-1 for every set high bit of the
    # last axis, then XORs into every axis
    t_expr = F.lit(0).cast("long")
    Q = 1 << (bits - 1)
    while Q > 1:
        t_expr = t_expr.bitwiseXOR(
            F.when(X[n - 1].bitwiseAND(F.lit(Q)) != F.lit(0), F.lit(Q - 1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        Q >>= 1
    df = df.withColumns({"__ht": t_expr})
    df = df.withColumns(
        {xs[i]: X[i].bitwiseXOR(F.col("__ht")) for i in range(n)}
    )
    # MSB-first interleave, axis 0 outermost: bit j of axis i lands at
    # position j*n + (n-1-i) — one linear expression
    h = F.lit(0).cast("long")
    for i in range(n):
        for j in range(bits):
            bit = F.shiftright(X[i], j).bitwiseAND(F.lit(1))
            h = h.bitwiseOR(F.shiftleft(bit, j * n + (n - 1 - i)))
    df = df.withColumns(
        {
            key_col: F.when(
                F.col("__hnull"), F.lit(None).cast("long")
            ).otherwise(h)
        }
    )
    return df.drop("__hnull", "__ht", *xs)


def hilbert_key(cols: "list[str]", bits: int = 16):
    """Hilbert index of n already-quantized non-negative integer
    columns as an Arrow-batched pandas UDF returning BIGINT — the
    kernel ``write_zordered(curve="hilbert")`` actually uses (the
    Arrow exchange is measurably cheaper than the codegen unroll at
    default JVM config, see SCALING.md); :func:`with_hilbert_key` is
    the pure-Column codegen alternative for sessions that must avoid
    Python workers entirely. ``n_cols * bits`` <= 62 like Morton.

    >>> df = spark.createDataFrame([(0, 0), (0, 1), (1, 1), (1, 0)],
    ...                            "x long, y long")
    >>> k = hilbert_key(["x", "y"], bits=1)
    >>> sorted((r["h"], r["x"], r["y"]) for r in
    ...        df.select("x", "y", k.alias("h")).collect())
    [(0, 0, 0), (1, 0, 1), (2, 1, 1), (3, 1, 0)]
    """
    import numpy as np
    import pandas as pd

    n = len(cols)
    if n < 2:
        raise ValueError("hilbert_key needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")

    def key(*series):
        # NULL propagates like zorder_key's bit-ops: any NULL
        # coordinate -> NULL key (coercing to cell 0 would silently
        # mix missing-data rows into the origin files)
        nulls = np.zeros(len(series[0]), dtype=bool)
        for s in series:
            nulls |= s.isna().to_numpy()
        X = np.stack(
            [s.to_numpy(dtype="int64", na_value=0) for s in series], axis=1
        ).astype(np.uint64)
        X &= np.uint64((1 << bits) - 1)
        out = pd.array(
            _hilbert_index_array(X, bits).astype("int64"), dtype="Int64"
        )
        out[nulls] = pd.NA
        return pd.Series(out)

    key.__annotations__ = {"series": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(key, "long")
    return udf(*[F.col(f"`{c}`") for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
    curve: str = "morton",
) -> None:
    """Write ``df`` as parquet clustered by the space-filling-curve
    order of ``cols`` (already-quantized non-negative integer columns
    — apply :func:`quantize` upstream for continuous values).

    ``curve``: ``"morton"`` (default — pure codegen key) or
    ``"hilbert"`` (continuous curve, no cross-space jumps; Arrow
    pandas-UDF key — see the module docstring for the trade).

    ``repartitionByRange`` on the key gives each task one contiguous
    key range (one connected region per file — tight min/max stats on
    every ordered column), and ``sortWithinPartitions`` keeps row
    groups inside a file clustered too. At 100 TB pick ``num_files``
    from the target file size (~1 GiB); the write is one range
    exchange, no global sort materialization.
    """
    if curve == "morton":
        keyed = df.withColumn(
            "__z", zorder_key([F.col(c) for c in cols], bits=bits)
        )
    elif curve == "hilbert":
        # the Arrow UDF, NOT the codegen unroll — measured at 6M rows
        # (SCALING.md round 10): the unroll's fused codegen method
        # blows spark.sql.codegen.hugeMethodLimit at default config
        # and degrades to 62 row-materializing projections (write
        # 25.5s vs 6.0s Arrow vs 1.8s Morton); the Arrow key's ~0.7
        # µs/row is the cheaper and config-independent path for a
        # one-shot layout job. Use with_hilbert_key when Python
        # workers are unavailable AND hugeMethodLimit can be raised.
        keyed = df.withColumn("__z", hilbert_key(cols, bits=bits))
    else:
        raise ValueError(f"curve must be 'morton' or 'hilbert', got {curve!r}")
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
