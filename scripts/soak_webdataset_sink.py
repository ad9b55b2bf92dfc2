"""Long-horizon soak of the streaming WebDataset sink (VERDICT r9
item 7): the unit tests drive ~3 micro-batches and inject one fault —
this script runs 24 batches split across TWO sink invocations (a
mid-horizon stop/resume on the same checkpoint), then a from-scratch
full re-run, and checks the properties a long-lived tar sink must
keep:

1. bounded output: every batch dir holds exactly ``shards_per_batch``
   final tars, zero ``.tmp`` orphans, and per-batch bytes stay flat
   (no growth with sink age);
2. flat per-batch wall clock (foreachBatch cost ~ |batch|, not
   corpus age);
3. exactly-once across the stop/resume seam: total samples in the
   read-back equal total rows dropped, each exactly once;
4. determinism: the from-scratch re-run produces byte-identical
   shards (same relative paths, same sha256) — the property that
   makes checkpoint-replay idempotent after a crash.

Usage: python scripts/soak_webdataset_sink.py [n_batches] [per_batch]
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _calm import calibration, wait_for_calm  # noqa: E402

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 300
SHARDS_PER_BATCH = 2
SCHEMA = "doc_id long, text string, payload binary"


def rows(batch: int):
    out = []
    for i in range(batch * PER_BATCH, (batch + 1) * PER_BATCH):
        out.append(
            (
                i,
                f"document {i} body " + ("content " * (1 + i % 7)),
                bytes([i % 251]) * (64 + (i * 37) % 128),
            )
        )
    return out


def shard_hashes(out_dir: str) -> "dict[str, str]":
    """relative shard path -> sha256 (final .tar files only)."""
    out = {}
    for p in sorted(glob.glob(os.path.join(out_dir, "**", "*.tar"),
                              recursive=True)):
        with open(p, "rb") as f:
            out[os.path.relpath(p, out_dir)] = hashlib.sha256(
                f.read()
            ).hexdigest()
    return out


def main() -> None:
    from lours_spark.io.webdataset import (
        read_webdataset_members,
        write_webdataset_stream,
    )
    from lours_spark.session import get_spark

    spark = get_spark("wds-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(N_BATCHES + 16)
    )

    tmp = tempfile.mkdtemp(prefix="wds_soak_")
    drop_dir = os.path.join(tmp, "drops")
    os.makedirs(drop_dir)

    def drop(batch: int) -> None:
        stage = os.path.join(tmp, f"stage_{batch}")
        spark.createDataFrame(rows(batch), SCHEMA).coalesce(1).write.parquet(
            stage
        )
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, f"d{batch:04d}.parquet"))
        shutil.rmtree(stage)

    def run_sink(out_dir: str, ckpt: str, name: str):
        stream = (
            spark.readStream.format("parquet")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(drop_dir)
        )
        q = write_webdataset_stream(
            stream,
            out_dir,
            {"txt": "text", "bin": "payload"},
            checkpoint_dir=ckpt,
            shards_per_batch=SHARDS_PER_BATCH,
            query_name=name,
        )
        q.awaitTermination()
        return q

    out_dir = os.path.join(tmp, "wds")
    ckpt = os.path.join(tmp, "ckpt")

    wait_for_calm()
    # first invocation drains the first half of the horizon...
    half = N_BATCHES // 2
    for b in range(half):
        drop(b)
    t0 = time.time()
    q1 = run_sink(out_dir, ckpt, "wds_soak_1")
    wall_1 = time.time() - t0
    # ...then the sink "restarts": the remaining drops arrive and a
    # second invocation resumes from the same checkpoint
    for b in range(half, N_BATCHES):
        drop(b)
    t0 = time.time()
    q2 = run_sink(out_dir, ckpt, "wds_soak_2")
    wall_2 = time.time() - t0

    secs = []
    for q in (q1, q2):
        secs += [
            (p["batchId"], p["durationMs"]["triggerExecution"] / 1000.0)
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    secs = [s for _, s in sorted(secs)]
    assert len(secs) == N_BATCHES, (len(secs), N_BATCHES)
    k = min(5, max(1, len(secs) // 2))
    first5 = sum(secs[:k]) / k
    last5 = sum(secs[-k:]) / k

    # 1. bounded output: exact shard counts, no tmp orphans, flat bytes
    batch_dirs = sorted(glob.glob(os.path.join(out_dir, "batch-*")))
    assert len(batch_dirs) == N_BATCHES, len(batch_dirs)
    batch_bytes = []
    for d in batch_dirs:
        tars = glob.glob(os.path.join(d, "*.tar"))
        tmps = glob.glob(os.path.join(d, "*.tmp"))
        assert len(tars) == SHARDS_PER_BATCH and not tmps, d
        batch_bytes.append(sum(os.path.getsize(t) for t in tars))
    bytes_ratio = max(batch_bytes) / min(batch_bytes)

    # 3. exactly-once: every dropped key appears exactly once per
    # extension, across the stop/resume seam
    members = read_webdataset_members(spark, out_dir)
    total = N_BATCHES * PER_BATCH
    from pyspark.sql import functions as F

    per_key = members.groupBy("key").agg(
        F.count("*").alias("n"),
        F.countDistinct("ext").alias("n_ext"),
    )
    n_keys = per_key.count()
    n_clean = per_key.filter((F.col("n") == 2) & (F.col("n_ext") == 2)).count()
    assert n_keys == total == n_clean, (n_keys, n_clean, total)

    # 4. determinism: a from-scratch run over the SAME drop dir
    # produces byte-identical shards at the same relative paths
    hashes_1 = shard_hashes(out_dir)
    out_dir2 = os.path.join(tmp, "wds_rerun")
    ckpt2 = os.path.join(tmp, "ckpt_rerun")
    run_sink(out_dir2, ckpt2, "wds_soak_rerun")
    hashes_2 = shard_hashes(out_dir2)
    byte_identical = hashes_1 == hashes_2

    result = {
        "n_batches": N_BATCHES,
        "per_batch_rows": PER_BATCH,
        "shards_per_batch": SHARDS_PER_BATCH,
        "wall_first_half_sec": round(wall_1, 1),
        "wall_second_half_sec": round(wall_2, 1),
        "per_batch_sec": [round(s, 2) for s in secs],
        "first5_mean_sec": round(first5, 2),
        "last5_mean_sec": round(last5, 2),
        "last5_over_first5": round(last5 / first5, 2),
        "batch_bytes_max_over_min": round(bytes_ratio, 3),
        "total_bytes": sum(batch_bytes),
        "n_shards": len(hashes_1),
        "tmp_orphans": 0,
        "keys_exactly_once": True,
        "rerun_byte_identical": byte_identical,
        "calibration": calibration(spark),
    }
    print(json.dumps(result))
    assert byte_identical, "from-scratch rerun diverged"
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
