"""Shared "compute once, read from N consumer legs" materialization.

The default strategy is ``DataFrame.localCheckpoint``: blocks are
freed by the ContextCleaner when the Python frame drops (a
function-local ``cache()`` has no unpersist path once the result frame
is returned, so it leaks one CacheManager entry per call for the
session's life), and — unlike an unpopulated cache — concurrent
branches of one action cannot race its population (r11: three legs of
the LSH pairs action each re-ran the dominant minhash pass up to 3×
against a cache still being populated).

EXECUTOR-LOSS CAVEAT (ADVICE r11): localCheckpoint blocks are NOT
recomputable. Spark documents it as unsafe with dynamic allocation —
if an executor holding checkpoint blocks is decommissioned (spot
reclaim, scale-down, failure), every downstream action fails
irrecoverably instead of recomputing the lineage as ``cache()`` would.
On clusters with executor churn set::

    spark.conf.set("spark.lours.materialize", "cache")

to fall back to ``persist()`` (+ eager ``count()`` where the call site
materializes eagerly). The cache fallback recomputes on block loss but
re-inherits the session-lifetime CacheManager entry — callers on such
clusters should ``spark.catalog.clearCache()`` (or unpersist by plan)
at pipeline boundaries.

``eager=False`` marks the checkpoint without running a materializing
job: the first downstream action that touches all partitions
materializes it as a side effect — same sharing guarantee, one fewer
serial job wave. Use it when such an action is guaranteed; an eager
site pays one extra job but is safe under partial-consumption plans
(e.g. a broadcast-build that only reads some partitions first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STRATEGY_CONF = "spark.lours.materialize"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for multi-leg consumption, per the
    session's ``spark.lours.materialize`` strategy (``localCheckpoint``
    default, ``cache`` for executor-churn clusters — see module doc)."""
    strategy = df.sparkSession.conf.get(STRATEGY_CONF, "localCheckpoint")
    if strategy == "cache":
        out = df.persist()
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)
