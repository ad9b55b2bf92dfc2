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
SCALING.md "z-order at three columns"). A Hilbert curve would remove
the discontinuity at ~10x expression complexity — with min/max pruning
the two outlier files cost two extra file reads per query, so Morton
is the deliberate choice here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(
    col: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Map a numeric column onto integer cells ``[0, 2^bits)`` over the
    explicit ``[lo, hi]`` range (clamped — out-of-range values land in
    the edge cells, they never wrap).

    >>> df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (999.0,)], "x double")
    >>> [r["q"] for r in df.select(quantize(F.col("x"), 0, 100, bits=8).alias("q")).collect()]
    [0, 127, 255, 255]
    """
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    ) * F.lit(float(cells))
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(cells).cast("long"), F.floor(scaled)),
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


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Morton order of
    ``cols`` (already-quantized non-negative integer columns — apply
    :func:`quantize` upstream for continuous values).

    ``repartitionByRange`` on the z-key gives each task one contiguous
    z-range (one hyper-rectangle per file — tight min/max stats on
    every z-ordered column), and ``sortWithinPartitions`` keeps row
    groups inside a file clustered too. At 100 TB pick ``num_files``
    from the target file size (~1 GiB); the write is one range
    exchange, no global sort materialization.
    """
    z = zorder_key([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
