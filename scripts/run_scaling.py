"""Scale-evidence runner: the six heaviest pipelines at sf0.1 (1x) and
at the 10x replica from scripts/make_scale_data.py, with CC round /
edge-count observability and driver-RSS tracking.

Usage: python scripts/run_scaling.py [scaled_dir]
Prints one JSON line; scripts/render_scaling.py turns it into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _calm import calibration as _calibration  # noqa: E402
from _calm import cc_stats, rss_mb, wait_for_calm  # noqa: E402
from _probes import (  # noqa: E402
    balanced_split_auto_probe,
    detection_confusion_probe,
    neardup_decade,
    webdataset_probe,
)

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
    "dup_spans",
    "remove_dup_spans",
    "cluster_representatives",
    "normalize_text",
    "decontaminate_spans",
    "gopher_rules",
    "char_entropy",
    "ngram_logprob",
    "bloom_novel",
    "asof_join",
    "range_join",
    "rolling_agg",
    "funnel",
    # round 7: the remaining headline pipelines (VERDICT r6 item 5)
    "embedding_near_dup",
    "curation_pipeline",
    "minhash_incremental",
    # round 8: capped-LSH hot-bucket stress (VERDICT r7 item 1/6)
    "minhash_hot_bucket",
    # round 9: star-mode twin (capped family still collapses)
    "minhash_hot_bucket_star",
    # round 8 (cont.): vocabulary induction, weighted sampling, z-order
    "vocab_pair_stats",
    "weighted_sample",
    "zorder_layout",
    # round 8 (cont.): boilerplate removal + hashed n-gram classifier
    "boilerplate_removal",
    "classifier_score",
    "embedding_incremental",
]


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1x10"

    from lours_spark import suite
    from lours_spark.session import get_spark

    # engine defaults (Arrow boundaries, AQE) — the same session shape
    # bench.py measures; a bare session silently disables Arrow and
    # penalizes every toPandas boundary ~10x
    # get_spark already disables the UI; only the driver-memory
    # fallback differs (16g here vs get_spark's 8g — the 10x balanced
    # split holds bigger chunk histograms on the driver)
    spark = get_spark(
        "lours-scaling",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
        },
    )
    # warm JVM + python workers once, like bench.py
    suite.ALL_QUERIES["multimodal_features"](spark, BASE).count()

    def timed(name, sf_dir) -> tuple[float, int]:
        wait_for_calm()
        spark.catalog.clearCache()
        t0 = time.time()
        rows = suite.ALL_QUERIES[name](spark, sf_dir).count()
        return time.time() - t0, rows

    out: dict = {"scales": {}}
    for label, sf_dir in (("1x", BASE), ("10x", scaled)):
        res: dict = {"rss_mb_before": round(rss_mb(), 1)}
        res["calibration"] = _calibration(spark)
        for name in QUERIES:
            # every sample is steal-spike-suspect: min-of-2 always,
            # a third sample while still over 5s
            dt, rows = timed(name, sf_dir)
            dt = min(dt, timed(name, sf_dir)[0])
            if dt > 5.0:
                dt = min(dt, timed(name, sf_dir)[0])
            res[name] = {"sec": round(dt, 2), "rows": rows}
            print(f"# {label} {name}: {dt:.2f}s ({rows} rows)", file=sys.stderr)
        # round 7 probes: matcher-fed confusion + WebDataset shard I/O
        wait_for_calm()
        spark.catalog.clearCache()
        res["detection_confusion"] = detection_confusion_probe(spark, sf_dir)
        print(
            f"# {label} detection_confusion: {res['detection_confusion']}",
            file=sys.stderr,
        )
        wait_for_calm()
        spark.catalog.clearCache()
        res["webdataset"] = webdataset_probe(
            spark, sf_dir, "/root/repo/scale_data"
        )
        print(f"# {label} webdataset: {res['webdataset']}", file=sys.stderr)
        wait_for_calm()
        spark.catalog.clearCache()
        res["balanced_split_auto"] = balanced_split_auto_probe(spark, sf_dir)
        print(
            f"# {label} balanced_split_auto: {res['balanced_split_auto']}",
            file=sys.stderr,
        )
        res["cc"] = cc_stats(spark, sf_dir)
        res["rss_mb_after"] = round(rss_mb(), 1)
        out["scales"][label] = res
    out["semantic_dedup"] = semdedup_decade(spark, wait_for_calm)
    # LSH near-dup synthetic decade (planted duplicates; the corpus
    # embeddings table has no 0.95+ pairs, so the real-table rows above
    # only time the candidate machinery at 0 output rows)
    out["neardup_synthetic"] = {
        "1x": neardup_decade(spark, wait_for_calm, 100_000),
        "10x": neardup_decade(spark, wait_for_calm, 1_000_000),
    }
    print(f"# neardup_synthetic: {out['neardup_synthetic']}", file=sys.stderr)
    # persist BEFORE the stdout print: a JVM-shutdown race once ate the
    # redirected stdout tail and cost a long run its JSON
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_last.json")
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
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
