"""The ONE steal-burst gate + calibration block shared by every
timing script (run_scaling.py, run_scaling100.py,
bench_greedy_approx_driver.py). SCALING.md's methodology note claims
all decades were measured under "the same gate" — keeping the probe
constants in one module makes that claim structurally true instead of
a copy-paste invariant.

The host is a VM with bursty hypervisor steal that lasts MINUTES and
inflates wall clock 3-10x; min-of-N sampling inside a burst is still
inflated, so every sample waits for a calm window first.
"""

from __future__ import annotations

import resource
import sys
import time

#: warm 1200x1200 matmul threshold that counts as "calm" (~1.5x the
#: true cost on an idle host); 10s between probes, give up after 300s
CALM_SECONDS = 0.05
PROBE_SLEEP = 10.0
MAX_WAIT = 300.0


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def wait_for_calm(max_wait: float = MAX_WAIT) -> None:
    """Block until a quick numpy probe shows the hypervisor isn't
    stealing. Gives up after ``max_wait`` so a permanently-loaded host
    still produces numbers (flagged by the recorded calibration)."""
    import numpy as np

    A = np.random.default_rng(0).random((1200, 1200))
    _ = A @ A  # warm
    deadline = time.time() + max_wait
    while time.time() < deadline:
        t0 = time.time()
        _ = A @ A
        if time.time() - t0 < CALM_SECONDS:
            return
        time.sleep(PROBE_SLEEP)
    print(
        "# WARNING: host never calmed; numbers are steal-inflated",
        file=sys.stderr,
    )


def calibration(spark) -> dict:
    """Fixed reference workloads (same as bench.py), calm-gated, so
    passes at different times can be checked for comparable host
    speed before trusting their ratio."""
    import numpy as np

    wait_for_calm()
    t0 = time.time()
    spark.range(200_000_000).selectExpr("sum(id * 2) as s").collect()
    cal_spark = round(time.time() - t0, 3)
    A = np.random.default_rng(0).random((2000, 2000))
    t0 = time.time()
    _ = A @ A
    return {
        "spark_range_sum_sec": cal_spark,
        "numpy_matmul_2000_sec": round(time.time() - t0, 3),
    }


def cc_stats(spark, sf_dir: str) -> dict:
    """dedup_clusters_distributed with the stats out-param: edge count,
    chosen path, convergence rounds, member rows."""
    from lours_spark.operators.dedup import ngram_jaccard_pairs
    from lours_spark.split.chunks import connected_components
    from lours_spark.suite import _t

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.3)
    stats: dict = {}
    n = connected_components(pairs, driver_threshold=0, stats=stats).count()
    stats["members"] = n
    return stats
