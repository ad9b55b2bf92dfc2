"""Dump `.explain("formatted")` for named queries into plans/r11/.

Usage: python scripts/dump_r11_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  with no query list, dumps the heavy set below.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the queries under optimization this round (slowest in BENCH_FULL.json)
HEAVY = [
    "detection_pr_ap",
    "greedy_matching",
    "ngram_logprob",
    "cluster_representatives",
    "dedup_clusters_distributed",
    "minhash_hot_bucket_star",
    "dedup_clusters",
    "minhash_incremental",
    "matcher_skew",
    "iou_pairs",
    "diff_three_way",
    "minhash_hot_bucket",
    "balanced_split",
    "validation_counts",
    "merge_overlap_id_shift",
    "minhash_lsh_pairs",
    "ivf_topk",
    "ngram_jaccard",
    "embedding_incremental",
    "merge_datasets",
    "curation_pipeline",
    "classifier_score",
    "shipping_priority",
    "embedding_near_dup",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEAVY
    out_dir = os.path.join("/root/repo", "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spark = get_spark("r11-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    import contextlib
    import io

    for name in names:
        df = ALL_QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_exchange = buf.getvalue().count("Exchange")
        print(f"{name}: {len(buf.getvalue())}B, ~{n_exchange} Exchange refs")


if __name__ == "__main__":
    main()
