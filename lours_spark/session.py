"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-at-scale: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow enabled for every
pandas boundary, and a shuffle-partition count that tracks cores locally
but should be raised (or left to AQE) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lours-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Parameters
    ----------
    cpus:
        local[] parallelism; defaults to $SPARK_GRAFT_CPUS or "*".
    shuffle_partitions:
        default shuffle width; AQE coalesces down at runtime so a
        slightly-high value is safe.

    >>> s = get_spark("doctest-session")
    >>> s.conf.get("spark.sql.adaptive.enabled")
    'true'
    >>> s.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    'true'
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver's synthetic star-schema tables as DataFrames."""
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
