"""Third-decade soak of the incremental streaming near-dup miner
(VERDICT r8 item 6): the parity/crash tests drive 4-5 micro-batches —
this script runs a LONG horizon (24 batches, 10x the test's drop size,
``compact_every=5``) and checks the three properties a long-lived
miner must keep:

1. flat per-batch wall clock (no per-batch cost growing with corpus
   AGE — the all-old-bucket cut and the compacted index keep
   steady-state cost ~ |batch| x bucket-mates);
2. bounded index-directory count (compaction folds batch dirs, so the
   listing tax never grows past compact_every + 1 dirs);
3. pair-set equality with the one-shot batch run over everything
   ingested (exactly-once across the whole horizon).

Usage: python scripts/soak_streaming_miner.py [n_batches] [docs_per_batch]
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import glob
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
DOCS_PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 80
COMPACT_EVERY = 5

BASE = "quick brown fox jumps over the lazy dog near the river bank "


def text(i: int) -> str:
    # every 4th doc is a near-dup variant of the one 3 ids earlier, so
    # cross-batch pairs exist at every horizon
    if i % 4 == 3:
        return BASE + f"variant {i - 3} tail common words here"
    return BASE + f"unique {i} " + (f"filler {i} ") * 3


SCHEMA = "doc_id long, text string"


def main() -> None:
    from lours_spark.operators.dedup import minhash_lsh_pairs
    from lours_spark.session import get_spark
    from lours_spark.streaming.documents import mine_neardup_stream

    spark = get_spark("miner-soak")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="miner_soak_")
    drop_dir = os.path.join(tmp, "drops")
    os.makedirs(drop_dir)

    def drop(batch: int) -> None:
        ids = range(batch * DOCS_PER_BATCH, (batch + 1) * DOCS_PER_BATCH)
        stage = os.path.join(tmp, f"stage_{batch}")
        spark.createDataFrame(
            [(i, text(i)) for i in ids], SCHEMA
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(drop_dir, f"d{batch:04d}.parquet"))
        shutil.rmtree(stage)

    for b in range(N_BATCHES):
        drop(b)

    index_dir = os.path.join(tmp, "index")
    pairs_dir = os.path.join(tmp, "pairs")
    ckpt = os.path.join(tmp, "ckpt")

    # recentProgress retains only ~100 entries by default — a longer
    # argv horizon would silently drop the EARLIEST batches and turn
    # the first-vs-last flatness check into late-vs-later
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(N_BATCHES + 16),
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(drop_dir)
    )
    wait_for_calm()
    t0 = time.time()
    q = mine_neardup_stream(
        stream, index_dir, pairs_dir, ckpt, jaccard_threshold=0.3,
        compact_every=COMPACT_EVERY,
    )
    q.awaitTermination()
    total_wall = time.time() - t0
    # per-batch wall from the query's own progress log (durationMs
    # covers the whole foreachBatch body: mining + both writes)
    per_batch = [
        (p["batchId"], p["durationMs"]["triggerExecution"] / 1000.0)
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]
    per_batch.sort()
    secs = [s for _, s in per_batch]
    assert len(secs) >= N_BATCHES, (
        f"only {len(secs)} of {N_BATCHES} batch timings retained — "
        "raise numRecentProgressUpdates"
    )
    # window sized to the actual batch count so a short argv override
    # still yields honest (non-overlapping) means
    k = min(5, max(1, len(secs) // 2))
    first5 = sum(secs[:k]) / k
    last5 = sum(secs[-k:]) / k

    index_dirs = sorted(
        os.path.basename(p) for p in glob.glob(index_dir + "/*")
    )

    def mined():
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.read.parquet(
                *sorted(glob.glob(pairs_dir + "/batch-*"))
            ).collect()
        }

    n_docs = N_BATCHES * DOCS_PER_BATCH
    docs = spark.createDataFrame(
        [(i, text(i)) for i in range(n_docs)], SCHEMA
    )
    one_shot = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    }
    streamed = mined()

    result = {
        "n_batches": N_BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "compact_every": COMPACT_EVERY,
        "total_wall_sec": round(total_wall, 1),
        "per_batch_sec": [round(s, 2) for s in secs],
        "first5_mean_sec": round(first5, 2),
        "last5_mean_sec": round(last5, 2),
        "last5_over_first5": round(last5 / first5, 2),
        "index_dirs": index_dirs,
        "n_index_dirs": len(index_dirs),
        "pairs_streamed": len(streamed),
        "pairs_one_shot": len(one_shot),
        "pair_sets_equal": streamed == one_shot,
        "calibration": calibration(spark),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(result))
    assert result["pair_sets_equal"], "streamed pairs != one-shot pairs"
    assert result["n_index_dirs"] <= COMPACT_EVERY + 1, index_dirs
    assert last5 <= 2.5 * first5, "per-batch wall grew with corpus age"


if __name__ == "__main__":
    main()
