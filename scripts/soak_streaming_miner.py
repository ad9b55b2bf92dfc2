"""Third-decade soak of the incremental streaming near-dup miners
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

Usage:
    python scripts/soak_streaming_miner.py [n_batches] [per_batch] [mode]
``mode`` is ``minhash`` (default) or ``embedding`` — the same horizon
over the embedding twin (planted cos~0.9999 near-dups, pinned LSH
sizing so the first batch's stamp matches every later one).
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
PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 80
MODE = sys.argv[3] if len(sys.argv) > 3 else "minhash"
COMPACT_EVERY = 5

BASE = "quick brown fox jumps over the lazy dog near the river bank "
DIM = 16
EMB_TABLES, EMB_PLANES, EMB_THRESHOLD = 8, 12, 0.99


def text(i: int) -> str:
    # every 4th doc is a near-dup variant of the one 3 ids earlier, so
    # cross-batch pairs exist at every horizon
    if i % 4 == 3:
        return BASE + f"variant {i - 3} tail common words here"
    return BASE + f"unique {i} " + (f"filler {i} ") * 3


def vector(i: int) -> "list[float]":
    # deterministic per-id unit vector; every 4th is a tiny
    # perturbation of the one 3 earlier (cos ~ 0.9999)
    import numpy as np

    base = i - 3 if i % 4 == 3 else i
    rng = np.random.default_rng(base)
    v = rng.standard_normal(DIM)
    if i % 4 == 3:
        v = v + 0.003 * np.random.default_rng(i).standard_normal(DIM)
    v = v / np.linalg.norm(v)
    return [float(x) for x in v]


def make_mode(spark):
    """(schema, row_fn, start_fn, one_shot_fn, pair_key) per mode."""
    if MODE == "minhash":
        from lours_spark.operators.dedup import minhash_lsh_pairs
        from lours_spark.streaming.documents import mine_neardup_stream

        schema = "doc_id long, text string"

        def start(stream, index_dir, pairs_dir, ckpt):
            return mine_neardup_stream(
                stream, index_dir, pairs_dir, ckpt,
                jaccard_threshold=0.3, compact_every=COMPACT_EVERY,
            )

        def one_shot(n):
            docs = spark.createDataFrame(
                [(i, text(i)) for i in range(n)], schema
            )
            return minhash_lsh_pairs(docs, jaccard_threshold=0.3)

        return (
            schema,
            lambda i: (i, text(i)),
            start,
            one_shot,
            lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9)),
        )
    if MODE != "embedding":
        raise SystemExit(f"unknown mode {MODE!r}")

    from lours_spark.operators.dedup import embedding_near_duplicates
    from lours_spark.streaming.documents import (
        mine_embedding_neardup_stream,
    )

    schema = f"vec_id long, embedding array<double>"

    def start(stream, index_dir, pairs_dir, ckpt):
        # pinned sizing: auto-r against a batch count would drift
        # between the first batch's stamp and later calls
        return mine_embedding_neardup_stream(
            stream, index_dir, pairs_dir, ckpt,
            threshold=EMB_THRESHOLD, num_tables=EMB_TABLES,
            planes_per_table=EMB_PLANES, compact_every=COMPACT_EVERY,
        )

    def one_shot(n):
        vecs = spark.createDataFrame(
            [(i, vector(i)) for i in range(n)], schema
        )
        return embedding_near_duplicates(
            vecs, id_col="vec_id", threshold=EMB_THRESHOLD,
            method="lsh", num_tables=EMB_TABLES,
            planes_per_table=EMB_PLANES,
        )

    return (
        schema,
        lambda i: (i, vector(i)),
        start,
        one_shot,
        lambda r: (r["id_a"], r["id_b"], round(r["cosine"], 9)),
    )


def main() -> None:
    from lours_spark.session import get_spark

    spark = get_spark(f"miner-soak-{MODE}")
    spark.sparkContext.setLogLevel("ERROR")
    schema, row_fn, start_fn, one_shot_fn, pair_key = make_mode(spark)

    tmp = tempfile.mkdtemp(prefix=f"miner_soak_{MODE}_")
    drop_dir = os.path.join(tmp, "drops")
    os.makedirs(drop_dir)

    def drop(batch: int) -> None:
        ids = range(batch * PER_BATCH, (batch + 1) * PER_BATCH)
        stage = os.path.join(tmp, f"stage_{batch}")
        spark.createDataFrame(
            [row_fn(i) for i in ids], schema
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
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(drop_dir)
    )
    wait_for_calm()
    t0 = time.time()
    q = start_fn(stream, index_dir, pairs_dir, ckpt)
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

    streamed = {
        pair_key(r)
        for r in spark.read.parquet(
            *sorted(glob.glob(pairs_dir + "/batch-*"))
        ).collect()
    }
    one_shot = {
        pair_key(r) for r in one_shot_fn(N_BATCHES * PER_BATCH).collect()
    }

    result = {
        "mode": MODE,
        "n_batches": N_BATCHES,
        "per_batch_rows": PER_BATCH,
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
