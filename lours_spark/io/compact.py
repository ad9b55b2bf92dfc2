"""Parquet small-file compaction — table maintenance for streaming
sinks.

Every `foreachBatch`/append sink in this engine (the caipy watcher,
curated-corpus parquet sinks) writes one-or-more files PER MICRO-BATCH.
At 100 TB that decays into the classic small-file problem: a scan pays
per-file open/footer costs, the driver pays listing, and
`spark.sql.files.maxPartitionBytes` coalescing can only do so much.
Compaction rewrites the table at a target file size.

Spark-first shape: input bytes come from the `binaryFile` source with
ONLY the `length` metadata column selected — column pruning means no
file CONTENT is read for the sizing pass (cheap even on object
stores); the rewrite itself is one round-robin exchange into
``ceil(bytes / target)`` even output files.

Atomicity is the caller's: plain parquet has no manifest, so
compaction writes to a NEW directory and the caller swaps readers (or
renames) when ready — compact-in-place on a live plain-parquet dir is
a lost-update bug by construction, which is why ``dst`` is required
rather than defaulting to ``src``.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def parquet_file_stats(spark: SparkSession, path: str) -> "tuple[int, int]":
    """(file_count, total_bytes) of the ``*.parquet`` files under
    ``path`` (recursive), without reading any file content — the
    binaryFile scan is pruned to the ``length`` metadata column."""
    row = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("length").alias("bytes"),
        )
        .first()
    )
    return int(row["n"] or 0), int(row["bytes"] or 0)


def _zorder_clustered(
    df,
    writer_cols: "list[str]",
    zorder_by: "list[str]",
    n_out: int,
    bits: int,
    curve: str,
):
    """The z-cluster rewrite plan: quantize ``zorder_by`` onto their
    measured ranges (one column-pruned agg pass), key with the chosen
    curve, then ONE range exchange on (partition cols, key) + in-task
    sort. NULL coordinates yield NULL keys and range-sort first —
    missing-data rows cluster together instead of polluting cell 0."""
    from lours_spark.operators.zorder import (
        hilbert_key,
        quantize,
        zorder_key,
    )

    missing = [c for c in zorder_by if c not in df.columns]
    if missing:
        raise ValueError(f"zorder_by columns not in table: {missing}")
    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs at least two columns")
    clash = [
        c
        for c in df.columns
        if c == "__zc" or (c.startswith("__q") and c[3:].isdigit())
    ]
    if clash:
        # withColumn would silently REPLACE them and the trailing drop
        # would delete real data
        raise ValueError(
            f"table columns collide with zorder scratch names: {clash}"
        )
    aggs = []
    for c in zorder_by:
        col = F.col(f"`{c}`").cast("double")
        aggs += [F.min(col).alias(f"lo_{c}"), F.max(col).alias(f"hi_{c}")]
    ranges = df.agg(*aggs).first()
    qcols = []
    for c in zorder_by:
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        if lo is None:
            raise ValueError(f"zorder_by column {c!r} is all NULL")
        if hi <= lo:  # constant column — every row in cell 0
            qcols.append(
                F.when(F.col(f"`{c}`").isNotNull(), F.lit(0)).cast("long")
            )
        else:
            qcols.append(quantize(F.col(f"`{c}`"), lo, hi, bits=bits))
    if curve == "morton":
        keyed = df.withColumn("__zc", zorder_key(qcols, bits=bits))
        tmp = ["__zc"]
    elif curve == "hilbert":
        # the Arrow kernel takes column NAMES — materialize the
        # quantized cells first
        qnames = [f"__q{i}" for i in range(len(qcols))]
        keyed = df.withColumns(dict(zip(qnames, qcols)))
        keyed = keyed.withColumn("__zc", hilbert_key(qnames, bits=bits))
        tmp = ["__zc", *qnames]
    else:
        raise ValueError(
            f"zorder_curve must be 'morton' or 'hilbert', got {curve!r}"
        )
    order = [*writer_cols, "__zc"]
    return (
        keyed.repartitionByRange(n_out, *order)
        .sortWithinPartitions(*order)
        .drop(*tmp)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    mode: str = "error",
    partition_by: "list[str] | None" = None,
    zorder_by: "list[str] | None" = None,
    zorder_bits: int = 16,
    zorder_curve: str = "morton",
    num_files: "int | None" = None,
) -> "dict[str, int]":
    """Rewrite the parquet table at ``src`` into ``dst`` with
    ``ceil(total_bytes / target_file_mb)`` evenly-sized files
    (``num_files`` overrides the byte-derived count for
    layout-controlled rewrites).

    ``partition_by``: pass the table's hive-partition columns (e.g.
    ``["split"]`` for this engine's split-partitioned dataset writes)
    to KEEP the directory layout — without it a partitioned table
    compacts into a flat one (the partition columns survive as data
    columns, but scans lose partition pruning). The shuffle then
    distributes by (partition cols, random) so each partition
    directory gets evenly-sized files instead of one file per input
    task per partition value.

    ``zorder_by``: ≥2 numeric columns — compaction then CLUSTERS the
    rewrite on their space-filling-curve order (the ``OPTIMIZE ...
    ZORDER BY`` table-maintenance idiom) instead of round-robin: one
    column-pruned agg pass finds each column's range, values quantize
    onto ``2^zorder_bits`` cells, and the rewrite becomes ONE range
    exchange on the curve key + in-task sort — every output file gets
    a tight min/max envelope on ALL listed columns, so later scans
    filtered on any of them skip most files on parquet footer stats
    alone. ``zorder_curve``: ``"morton"`` (codegen) or ``"hilbert"``
    (Arrow kernel, no cross-space jumps — see operators/zorder.py for
    the trade). Composes with ``partition_by`` (ranges nest inside
    partition values, so each ``col=v`` directory is z-clustered
    independently).

    Returns ``{"files_in": n, "bytes_in": b, "files_out": m,
    "bytes_out": b2}`` — ``files_out``/``bytes_out`` are MEASURED on
    ``dst`` after the write (one more metadata-only ``binaryFile``
    listing), not the computed target: with ``partition_by``, hash
    collisions in the spread slots and per-value skew make the real
    count differ from ``ceil(bytes/target)``, and a maintenance job
    alarming on file growth needs the truth. ``dst`` must differ from
    ``src`` (see module docstring — no-manifest formats cannot
    compact in place safely).

    >>> import glob, os, tempfile
    >>> root = tempfile.mkdtemp()
    >>> src, dst = os.path.join(root, "s"), os.path.join(root, "d")
    >>> for i in range(4):  # 4 tiny "micro-batch" appends
    ...     spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
    ...         "append").parquet(src)
    >>> stats = compact_parquet(spark, src, dst, target_file_mb=512)
    >>> (stats["files_in"], stats["files_out"])
    (4, 1)
    >>> spark.read.parquet(dst).count()
    40
    """
    if src.rstrip("/") == dst.rstrip("/"):
        raise ValueError(
            "compact_parquet writes to a NEW directory (plain parquet "
            "has no manifest; in-place compaction races readers) — "
            "pass a distinct dst and swap when ready"
        )
    if num_files is not None and num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    n_in, bytes_in = parquet_file_stats(spark, src)
    if n_in == 0:
        raise ValueError(f"no parquet files under {src!r}")
    n_out = (
        num_files
        if num_files is not None
        else max(1, math.ceil(bytes_in / (target_file_mb * 1024 * 1024)))
    )
    df = spark.read.parquet(src)
    writer_cols: list = []
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"partition_by columns not in table: {missing}"
            )
        writer_cols = list(partition_by)
    if zorder_by:
        df = _zorder_clustered(
            df, writer_cols, zorder_by, n_out, zorder_bits, zorder_curve
        )
    elif writer_cols:
        # distribute by (partition cols, bounded spread slot):
        # repartition(n) alone gives each task rows from MANY
        # partition values and emits one small file per (task, value)
        # pair — recreating the small-file problem inside each
        # directory. Each value gets ~n_out/n_values deterministic
        # slots instead (xxhash64 of the row, so no rand
        # re-evaluation hazards); per-VALUE size skew keeps equal
        # slot counts — a per-value byte-weighted slot map would
        # need an extra aggregation pass, not worth it for
        # maintenance jobs.
        n_values = df.select(*writer_cols).distinct().count()
        slots = max(1, round(n_out / max(n_values, 1)))
        spread = F.pmod(
            F.xxhash64(*[F.col(f"`{c}`") for c in df.columns]),
            F.lit(slots),
        )
        df = df.repartition(
            max(n_out, n_values), *writer_cols, spread
        )
    else:
        df = df.repartition(n_out)
    writer = df.write.mode(mode)
    if writer_cols:
        writer = writer.partitionBy(*writer_cols)
    writer.parquet(dst)
    n_real, bytes_out = parquet_file_stats(spark, dst)
    return {
        "files_in": n_in,
        "bytes_in": bytes_in,
        "files_out": n_real,
        "bytes_out": bytes_out,
    }
