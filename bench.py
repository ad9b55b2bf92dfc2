"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline queries: the TPC-H-style relational core + the heavy
#: training-data-pipeline operators (dedup, ANN, windows, matcher)
BENCH_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "revenue_forecast",
    "filter_images_semijoin",
    "reset_index",
    "diff_three_way",
    "iou_pairs",
    "pr_curve",
    "confusion_matrix",
    "hash_split",
    "atomic_chunks",
    "fingerprint_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "simhash",
    "bpe_token_count",
    "tfidf_top_term",
    "cosine_topk",
    "lsh_bucket_topk",
    "embedding_near_dup",
    "sessionize",
    "hourly_rollup",
    "greedy_matching",
    "detection_pr_ap",
    # round 2: every formerly-ungated facet is timed too, so the bench
    # covers what the gate covers
    "keep_classes",
    "validation_counts",
    "bbox_validity_report",
    "simple_split",
    "split_quality",
    "take_images",
    "merge_overlap_id_shift",
    "confusion_pivot",
    "pr_curve_collapsed",
    "salted_aggregate",
    "top_terms",
    "dedup_clusters",
    # round 2: curation operators
    "decontaminate",
    "repetition_signals",
    "stratified_sample",
    # round 2: complete facet coverage — every standalone gate facet is
    # timed, so BENCH covers exactly what the CORRECTNESS gate covers
    "filter_annotations_emptied",
    "remove_empty_images",
    "anti_join_orphans",
    "denormalize_category",
    "remap_classes",
    "remap_dense_rank",
    "match_index",
    "merge_datasets",
    "booleanize",
    "debooleanize",
    "bbox_import_cxcywh",
    "bbox_export_xyxy",
    "bbox_relative",
    "cap_bbox",
    "average_precision",
    "interpolated_precision",
    "crowd_count_error",
    "balanced_split",
    "token_count",
    "language_id",
    "quality_score",
    "minhash_signature",
    "knn_label",
    "json_extraction",
    "forward_fill",
    "resample_count",
    "grouper_bins",
    "multimodal_features",
]


def main() -> None:
    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES as QUERIES

    spark = get_spark("lours-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
        # queries are timed independently: drop any persisted frames a
        # query left behind (evaluator curves, signature tables) so one
        # query's cache residue can't tax the next one's measurement
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
