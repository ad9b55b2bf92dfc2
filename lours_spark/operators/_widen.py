"""The ONE widen policy (r12 — was triplicated verbatim across
``operators.dedup._widen``, ``operators.similarity._widen`` and
``suite._widen_by``; three copies of the same constant drifted one
review away from disagreeing).

``widen(df)`` raises input parallelism when the source scans narrower
than the shuffle width: a small corpus in one single-row-group parquet
file otherwise runs its whole (expensive) map stage — shingle+hash,
centroid folds, box arithmetic — in 1-3 tasks. Round-robin to
``min(shuffle width, 16)``.

``widen(df, *cols)`` is the keyed variant: hash-repartition on ``cols``
to the FULL shuffle width, which parallelizes the map work AND lets a
following groupBy/join on a superset of ``cols`` skip its own exchange
(hash partitioning on a subset key satisfies the clustered
distribution requirement).

Both are no-ops on already-wide inputs — at 100 TB the scan itself
supplies the parallelism and neither adds an exchange.

Scale caveats (kept from the r11 in-place copies, verified r11/r12):

- The width probe is ``df.rdd.getNumPartitions()``, which forces one
  analysis + physical-planning pass on the driver per call. Cheap for
  the scan-shaped inputs every call site passes; on very wide plans at
  100 TB it is a repeated driver-side planning tax — callers that
  already hold a materialized/checkpointed frame should widen that
  frame, not a deep plan.
- The 16-partition cap on the unkeyed form was A/B-tested against the
  full shuffle width in r11 (worse-or-noise at bench scale) and again
  at sf1 in r12 (see OPTIMIZATION_r12.md); the keyed form uses the
  full width because its exchange REPLACES a downstream one instead of
  adding one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: unkeyed widen cap: enough tasks to cover every bench/laptop core
#: count without shattering a small input into confetti. The keyed
#: form ignores it (its exchange substitutes for a downstream one, so
#: full width is free).
WIDEN_CAP = 16


def widen(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` up to the shuffle width when it scans
    narrower than ``min(shuffle width, WIDEN_CAP)`` — round-robin
    without ``cols``, hash on ``cols`` (to the full width) with.
    No-op on already-wide inputs."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= min(target, WIDEN_CAP):
        return df
    if cols:
        return df.repartition(target, *cols)
    return df.repartition(min(target, WIDEN_CAP))
