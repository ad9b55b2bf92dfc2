"""Scale-evidence runner: the six heaviest pipelines at sf0.1 (1x) and
at the 10x replica from scripts/make_scale_data.py, with CC round /
edge-count observability and driver-RSS tracking.

Usage: python scripts/run_scaling.py [scaled_dir]
Prints one JSON line; scripts/render_scaling.py turns it into SCALING.md.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
QUERIES = [
    "minhash_lsh_pairs",
    "paragraph_dedup",
    "dedup_clusters_distributed",
    "balanced_split",
    "balanced_split_approx",
    "greedy_matching",
    "detection_pr_ap",
    # round 6 (cont.): documents-driven curation additions
    "global_shuffle",
    "cap_per_group",
    "quality_percentile",
]


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def cc_stats(spark, sf_dir: str) -> dict:
    """dedup_clusters_distributed with the stats out-param: edge count,
    chosen path, convergence rounds."""
    from lours_spark.operators.dedup import ngram_jaccard_pairs
    from lours_spark.split.chunks import connected_components
    from lours_spark.suite import _t

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.3)
    stats: dict = {}
    n = connected_components(pairs, driver_threshold=0, stats=stats).count()
    stats["members"] = n
    return stats


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1x10"

    from lours_spark import suite
    from lours_spark.session import get_spark

    # engine defaults (Arrow boundaries, AQE) — the same session shape
    # bench.py measures; a bare session silently disables Arrow and
    # penalizes every toPandas boundary ~10x
    spark = get_spark(
        "lours-scaling",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
        },
    )
    # warm JVM + python workers once, like bench.py
    suite.ALL_QUERIES["multimodal_features"](spark, BASE).count()

    def calibration() -> dict:
        """Fixed reference workloads (same as bench.py): the host has
        bursty hypervisor steal; scale ratios are only trustworthy when
        both passes ran at comparable calibration speed. Gated on the
        same calm-window probe as the samples, so the recorded numbers
        describe the conditions the samples were actually taken in."""
        import numpy as np

        wait_for_calm()
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id * 2) as s").collect()
        cal_spark = round(time.time() - t0, 3)
        A = np.random.default_rng(0).random((2000, 2000))
        t0 = time.time()
        _ = A @ A
        cal_numpy = round(time.time() - t0, 3)
        return {"spark_range_sum_sec": cal_spark, "numpy_matmul_2000_sec": cal_numpy}

    def wait_for_calm(max_wait: float = 300.0) -> None:
        """Block until a quick numpy probe shows the hypervisor isn't
        stealing (bursts last minutes and inflate wall clock 3-10x —
        min-of-N can't save a sample taken inside one). Gives up after
        ``max_wait`` so a permanently-loaded host still produces
        numbers (flagged by the recorded calibration)."""
        import numpy as np

        A = np.random.default_rng(0).random((1200, 1200))
        _ = A @ A  # warm
        deadline = time.time() + max_wait
        while time.time() < deadline:
            t0 = time.time()
            _ = A @ A
            if time.time() - t0 < 0.05:  # ~1.5x true cost tolerance
                return
            time.sleep(10)
        print("# WARNING: host never calmed; numbers are steal-inflated",
              file=sys.stderr)

    def timed(name, sf_dir) -> tuple[float, int]:
        wait_for_calm()
        spark.catalog.clearCache()
        t0 = time.time()
        rows = suite.ALL_QUERIES[name](spark, sf_dir).count()
        return time.time() - t0, rows

    out: dict = {"scales": {}}
    for label, sf_dir in (("1x", BASE), (f"10x", scaled)):
        res: dict = {"rss_mb_before": round(rss_mb(), 1)}
        res["calibration"] = calibration()
        for name in QUERIES:
            # every sample is steal-spike-suspect: min-of-2 always,
            # a third sample while still over 5s
            dt, rows = timed(name, sf_dir)
            dt = min(dt, timed(name, sf_dir)[0])
            if dt > 5.0:
                dt = min(dt, timed(name, sf_dir)[0])
            res[name] = {"sec": round(dt, 2), "rows": rows}
            print(f"# {label} {name}: {dt:.2f}s ({rows} rows)", file=sys.stderr)
        res["cc"] = cc_stats(spark, sf_dir)
        res["rss_mb_after"] = round(rss_mb(), 1)
        out["scales"][label] = res
    out["semantic_dedup"] = semdedup_decade(spark, wait_for_calm)
    print(json.dumps(out))


def semdedup_decade(spark, wait_for_calm) -> dict:
    """semantic_dedup runs on EMBEDDINGS, which the 10x replica copies
    verbatim — so it gets its own synthetic decade: seeded gaussian
    clusters at n and 10n, with BOTH the true cluster count and the
    operator's k-means k scaled ∝ n (the SemDeDup design point: cluster
    population stays constant, so the within-cluster pair volume grows
    linearly, not quadratically)."""
    import numpy as np
    import pandas as pd

    from lours_spark.operators.dedup import semantic_dedup

    out: dict = {}
    for label, n, k in (("1x", 20_000, 100), ("10x", 200_000, 1_000)):
        rng = np.random.default_rng(0)
        dim = 32
        k_true = n // 200
        centers = rng.normal(size=(k_true, dim))
        idx = rng.integers(0, k_true, size=n)
        vecs = centers[idx] + 0.02 * rng.normal(size=(n, dim))
        pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(vecs)})
        df = spark.createDataFrame(pdf)

        def run() -> tuple[float, int]:
            wait_for_calm()
            spark.catalog.clearCache()
            t0 = time.time()
            ndup = (
                semantic_dedup(df, num_clusters=k, threshold=0.95, seed=1)
                .filter("is_dup")
                .count()
            )
            return time.time() - t0, ndup

        dt, ndup = run()
        dt = min(dt, run()[0])
        out[label] = {"sec": round(dt, 2), "n": n, "k": k, "dups": ndup}
        print(f"# semdedup {label}: {dt:.2f}s ({ndup} dups)", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
