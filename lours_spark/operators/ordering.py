"""Deterministic global shuffle for training-order writes.

A pretraining run wants the corpus in a reproducible "random" order —
the order must be the same across pipeline re-runs (else a resumed run
trains on different data) yet uncorrelated with ingest order (else a
crawl's temporal/domain locality leaks into the curriculum). Engines'
built-in shuffles fail the first requirement: ``df.orderBy(rand())``
reseeds per partition attempt, and a global sort by a random column is
nondeterministic under retries.

The operator here derives a seeded md5 hash from the row id — the same
engine-portable primitive as :mod:`lours_spark.operators.sampling` —
and exposes the shuffled order as ``(shard, pos)``:

- ``shard`` — the output file/shard the row lands in (``hash mod
  num_shards``); shard populations are balanced in expectation because
  the hash is uniform.
- ``pos`` — the row's position WITHIN its shard (dense, 1-based),
  ordered by the hash. Reading shards in id order and rows in ``pos``
  order replays one fixed global permutation.

Scale shape: there is NO global sort and NO single-partition window —
the only exchange is the hash partition on ``shard``, and the
per-shard ``row_number`` sorts each shard locally. At 100 TB pick
``num_shards`` so a shard fits an output file (e.g. ~1 GiB each);
writes are ``df.repartition(num_shards, "shard")`` +
``sortWithinPartitions("shard", <hash>)`` so each task streams one
sorted shard straight to its file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lours_spark.functions.text import md5_long


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int | str = 0,
    num_shards: int = 64,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Assign every row a reproducible shuffled position ``(shard,
    pos)`` (see module docstring). Appends the two columns; all input
    columns pass through.

    The hash key is 60-bit md5 (engine-portable, collision-free in
    practice at corpus scale; ties on equal hashes break by id, so the
    permutation is total regardless).

    >>> df = spark.range(100).withColumnRenamed("id", "doc_id")
    >>> out = global_shuffle(df, seed=7, num_shards=4)
    >>> out.groupBy("shard").count().count()  # all 4 shards populated
    4
    >>> a = [r["doc_id"] for r in out.orderBy("shard", "pos").collect()]
    >>> b = [r["doc_id"] for r in
    ...      global_shuffle(df.repartition(13), seed=7, num_shards=4)
    ...      .orderBy("shard", "pos").collect()]
    >>> a == b  # same permutation regardless of input partitioning
    True
    """
    key = md5_long(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(shard_col).orderBy(F.col("__gs_key"), F.col(id_col))
    return (
        df.withColumn("__gs_key", key)
        .withColumn(shard_col, F.col("__gs_key") % num_shards)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__gs_key")
    )


def write_shuffled(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: int | str = 0,
    num_shards: int = 64,
    format: str = "parquet",
    mode: str = "error",
) -> None:
    """Materialize the corpus in the :func:`global_shuffle` order: one
    ``shard=K`` directory per shard, rows inside each shard's files in
    hash order. A training loader that walks shards in key order and
    rows in file order replays the permutation exactly — without any
    rank column stored, and without ever running a global sort.

    Plan shape: ONE hash exchange (``repartition`` on the shard key) +
    a partition-local sort feeding the writer — each task streams its
    sorted shard straight to disk. ``mode`` passes through to the
    DataFrameWriter (default errors on an existing path rather than
    silently overwriting a corpus).
    """
    key = md5_long(F.col(id_col).cast("string"), seed)
    shuffled = (
        df.withColumn("__gs_key", key)
        .withColumn("shard", F.col("__gs_key") % num_shards)
        .repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__gs_key", id_col)
        .drop("__gs_key")
    )
    shuffled.write.mode(mode).partitionBy("shard").format(format).save(path)
