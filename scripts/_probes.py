"""Scale-evidence probes shared by run_scaling.py (1x/10x decade) and
run_scaling100.py (100x): pipelines that are not plain ALL_QUERIES
entries — the matcher-fed confusion composition and the WebDataset
shard round-trip."""

from __future__ import annotations

import os
import time


def detection_confusion_probe(spark, sf_dir: str) -> dict:
    """The full matcher-fed confusion composition (greedy matching →
    label joins → threshold split → confusion_counts) — the end-to-end
    path DetectionEvaluator.compute_confusion_matrix runs, measured as
    one pipeline so the matcher→confusion recombination join is in the
    timing (the gate's confusion_matrix facet is label-pair counting
    only)."""
    from pyspark.sql import functions as F

    from lours_spark.evaluation.evaluator import compute_confusion_matrix
    from lours_spark.suite import _jittered_pred, _matcher_ann

    gt = _matcher_ann(spark, sf_dir).withColumn(
        "category_str", F.col("category_id").cast("string")
    )
    pred = _jittered_pred(gt)
    t0 = time.time()
    out = compute_confusion_matrix(gt, pred, min_iou=0.3, min_confidence=0.1)
    rows = out.count()
    return {"sec": round(time.time() - t0, 2), "rows": rows}


def webdataset_probe(spark, sf_dir: str, scratch: str) -> dict:
    """Shard-parallel WebDataset write + read over the scaled documents
    table: one tar shard per seeded hash bucket on the write side, one
    binaryFile task per shard on the read side — per-shard tasks, so
    scaling the corpus at fixed rows/shard widens the task COUNT, never
    a task."""
    import shutil

    from lours_spark.io.webdataset import dataset_to_webdataset, from_webdataset

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    # hold rows/shard ~constant across decades (~1.25k docs/shard: the
    # sf0.1 base uses 4 shards over 5k docs)
    num_shards = max(4, n // 1250)
    out_dir = os.path.join(scratch, "wds_probe")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    dataset_to_webdataset(
        docs.select("doc_id", "text", "lang"),
        out_dir,
        {"txt": "text", "cls": "lang"},
        num_shards=num_shards,
    )
    write_sec = round(time.time() - t0, 2)
    t0 = time.time()
    rows = from_webdataset(spark, out_dir, ["txt", "cls"]).count()
    read_sec = round(time.time() - t0, 2)
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "write_sec": write_sec,
        "read_sec": read_sec,
        "rows": rows,
        "num_shards": num_shards,
    }


def neardup_decade(spark, wait_for_calm, n: int, seed: int = 11) -> dict:
    """embedding_near_dup on the driver tables is a 0-row query (the
    synthetic embeddings have max pairwise cosine ~0.6, far under the
    0.95 threshold), so the LSH pipeline's SCALE behavior gets its own
    synthetic decade, like semdedup_decade: n deterministic 64-dim
    vectors (per-dimension xxhash64 uniforms — pure column expressions,
    identical under re-execution, so the planted-dup union leg sees the
    same base vectors without materialization) plus one planted
    near-duplicate (cos ≈ 0.9999) for every 20th vector. Expected
    pairs ≈ n/20, scaling exactly linearly.

    LSH sizing follows the operator's own guidance ("tune r up as the
    corpus grows"): planes_per_table ≈ log2(n)+4 keeps unrelated-pair
    candidate volume ~L·n²·2^−r ≈ L·n/16, and a fixed num_tables=16
    keeps planted-pair recall ≈ 1 (per-table hit prob at cos 0.9999 is
    0.9955^r ≈ 0.9 for r=24)."""
    import math
    import time as _time

    from pyspark.sql import functions as F

    from lours_spark.operators.dedup import embedding_near_duplicates

    dim = 64

    def u(col_id, d, salt):
        h = F.xxhash64(col_id, F.lit(d), F.lit(salt))
        return (F.pmod(h, F.lit(2_000_001)) / F.lit(1_000_000.0)) - F.lit(1.0)

    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[u(F.col("id"), d, seed) for d in range(dim)])
        .cast("array<float>")
        .alias("embedding"),
    )
    dups = spark.range(0, n, 20).select(
        (F.col("id") + n).alias("vec_id"),
        F.array(
            *[
                (u(F.col("id"), d, seed) + 0.02 * u(F.col("id"), d, seed + 1))
                for d in range(dim)
            ]
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    corpus = base.unionByName(dups)
    planes = max(12, int(math.log2(n)) + 4)

    def run() -> tuple[float, int]:
        wait_for_calm()
        spark.catalog.clearCache()
        t0 = _time.time()
        pairs = embedding_near_duplicates(
            corpus,
            threshold=0.95,
            num_tables=16,
            planes_per_table=planes,
            seed=seed,
        ).count()
        return _time.time() - t0, pairs

    dt, pairs = run()
    dt = min(dt, run()[0])
    return {
        "sec": round(dt, 2),
        "pairs": pairs,
        "planted": -(-n // 20),
        "n": n + n // 20,
        "planes_per_table": planes,
        "num_tables": 16,
    }


def balanced_split_auto_probe(spark, sf_dir: str) -> dict:
    """mode="auto" routing evidence (VERDICT r7 item 4): run the gate's
    split problem with the DEFAULT auto mode and record the chunk count
    against AUTO_EXACT_MAX_CHUNKS — the decade shows the route flipping
    exact → approximate as the chunk count crosses the threshold (the
    flip itself is unit-pinned in
    tests/test_split.py::test_balanced_split_auto_routes_by_chunk_count), and the
    auto wall time tracking the leg it routed to."""
    import time as _time

    from pyspark.sql import functions as F

    from lours_spark import suite
    from lours_spark.split import balanced as bal

    o = suite._t(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "id"
    )
    n_chunks = (
        o.select(
            F.coalesce(
                F.col("o_custkey").cast("string"),
                F.col("id").cast("string"),
            ).alias("c")
        )
        .distinct()
        .count()
    )
    t0 = _time.time()
    out = bal.balanced_split(
        o,
        {"train": 0.8, "valid": 0.1, "eval": 0.1},
        dims=["o_orderpriority"],
        keep_separate=["o_custkey"],
        seed=42,
        mode="auto",
    )
    rows = out.groupBy("split", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    ).count()
    return {
        "sec": round(_time.time() - t0, 2),
        "rows": rows,
        "n_chunks": n_chunks,
        "routed": (
            "approximate"
            if n_chunks > bal.AUTO_EXACT_MAX_CHUNKS
            else "exact"
        ),
        "threshold": bal.AUTO_EXACT_MAX_CHUNKS,
    }
