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
