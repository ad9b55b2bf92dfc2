"""Long-horizon soak of the 100 TB table-maintenance loop (VERDICT
r10 item 5): JSONL drops → streaming parquet sink (small files per
micro-batch, hive-partitioned) → periodic ``compact_parquet`` into
a staged version directory → ATOMIC pointer publish + retention prune
(``io/versioned.py`` — round 11 upgraded the hand-rolled reader swap
to the crash-safe primitive). The unit tests drive each stage
alone; this script runs the composed loop for 25+ micro-batches over
5 maintenance cycles and checks the properties a long-lived curated
table must keep:

1. **value fidelity across the swap**: after every compaction, the
   versioned snapshot agrees with the live table AND with the
   generator's expectation on row count, per-partition counts, an
   order-insensitive value hash (bit-XOR of xxhash64 over all
   columns), and exact doc_id coverage;
2. **bounded file counts**: the live dir's file count grows with sink
   age (the small-file problem is real), but every compacted version
   stays at a BOUNDED file count (≤ 2 per partition value here) no
   matter how many micro-batches have accumulated;
3. **layout survives**: each version keeps the hive ``lang=`` layout
   and a per-value read touches only that value's directory
   (partition pruning end-to-end);
4. **flat maintenance cost**: compaction wall clock scales with the
   DATA (which grows linearly), not with the accumulated micro-batch
   count — the per-row compaction cost must not grow with sink age.

Usage: python scripts/soak_table_maintenance.py [n_cycles] [batches_per_cycle] [rows_per_batch]
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

N_CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BATCHES_PER_CYCLE = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ROWS_PER_BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 400
LANGS = ["en", "de", "fr"]


def batch_rows(batch: int) -> list:
    out = []
    for i in range(batch * ROWS_PER_BATCH, (batch + 1) * ROWS_PER_BATCH):
        text = f"document {i} body " + ("content " * (1 + i % 7))
        out.append((i, text, LANGS[i % len(LANGS)], f"src{i % 5}", len(text)))
    return out


def main() -> None:
    import gzip

    from pyspark.sql import functions as F

    from lours_spark.io.compact import compact_parquet, parquet_file_stats
    from lours_spark.io.versioned import (
        commit_version,
        current_version,
        list_versions,
        prune_versions,
        read_current,
        start_version,
    )
    from lours_spark.session import get_spark
    from lours_spark.streaming.documents import read_document_stream

    spark = get_spark("table-maintenance-soak")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tbl_soak_")
    drop_dir = os.path.join(tmp, "drops")
    live = os.path.join(tmp, "live")
    table_root = os.path.join(tmp, "table")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(drop_dir)

    def drop_jsonl(batch: int) -> None:
        # one gzipped JSONL file per micro-batch — the corpus-drop shape
        p = os.path.join(drop_dir, f"d{batch:05d}.jsonl.gz")
        with gzip.open(p + ".tmp", "wt") as f:
            for doc_id, text, lang, source, n_chars in batch_rows(batch):
                f.write(
                    json.dumps(
                        {
                            "doc_id": doc_id,
                            "text": text,
                            "lang": lang,
                            "source": source,
                            "n_chars": n_chars,
                        }
                    )
                    + "\n"
                )
        os.replace(p + ".tmp", p)  # atomic publish, like a real dropper

    def drain_sink() -> None:
        """One availableNow invocation: drain the CURRENT backlog into
        the live parquet table, one small-file commit per drop file."""
        stream = read_document_stream(
            spark, drop_dir, fmt="json", max_files_per_trigger=1
        )
        q = (
            stream.writeStream.format("parquet")
            .partitionBy("lang")
            .option("path", live)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def value_hash(df) -> "tuple[int, int]":
        """(rows, order-insensitive value hash) — bit-XOR of xxhash64
        over every column, so any changed/lost/duplicated row flips it."""
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64("doc_id", "text", "lang", "source", "n_chars")
            ).alias("h"),
        ).first()
        return int(r["n"]), int(r["h"] or 0)

    wait_for_calm()
    cycles = []
    batches_done = 0
    ok = True
    for cycle in range(N_CYCLES):
        for _ in range(BATCHES_PER_CYCLE):
            drop_jsonl(batches_done)
            batches_done += 1
        drain_sink()

        files_live, bytes_live = parquet_file_stats(spark, live)
        v, vdir = start_version(table_root)
        t0 = time.time()
        stats = compact_parquet(
            spark, live, vdir, target_file_mb=512, partition_by=["lang"]
        )
        # atomic publish: readers follow the CURRENT pointer, so the
        # new snapshot becomes visible in one os.replace; retention
        # keeps current + one rollback target, so disk usage stays
        # bounded across cycles no matter how long the loop runs
        commit_version(table_root, v, extra=stats)
        pruned = prune_versions(table_root, keep_last=2)
        compact_sec = round(time.time() - t0, 3)

        # published snapshot (via the pointer) must agree with the
        # live table AND the generator's expectation
        live_df = spark.read.parquet(live).select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        snap_df = read_current(spark, table_root).select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        n_live, h_live = value_hash(live_df)
        n_snap, h_snap = value_hash(snap_df)
        expected = batches_done * ROWS_PER_BATCH
        ids_ok = (
            snap_df.agg(
                F.min("doc_id"), F.max("doc_id"), F.countDistinct("doc_id")
            ).first()
            == (0, expected - 1, expected)
        )
        # layout + pruning: per-value reads touch only their directory
        prune_ok = True
        for lang in LANGS:
            paths = [
                r["f"]
                for r in snap_df.filter(F.col("lang") == lang)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .collect()
            ]
            prune_ok &= bool(paths) and all(f"lang={lang}" in p for p in paths)
        per_dir = [
            len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(vdir, "lang=*"))
        ]
        cycle_ok = (
            n_live == n_snap == expected
            and h_live == h_snap
            and ids_ok
            and prune_ok
            and len(per_dir) == len(LANGS)
            and max(per_dir) <= 2
            and stats["files_out"] == sum(per_dir)
            and current_version(table_root) == v
            and len(list_versions(table_root)) <= 2
        )
        ok &= cycle_ok
        cycles.append(
            {
                "cycle": cycle,
                "batches_total": batches_done,
                "rows_total": expected,
                "files_live": files_live,
                "bytes_live": bytes_live,
                "files_compacted": stats["files_out"],
                "per_dir_files": per_dir,
                "compact_sec": compact_sec,
                "sec_per_mrow": round(compact_sec / (expected / 1e6), 1),
                "hash_match": h_live == h_snap,
                "published_version": v,
                "pruned_versions": pruned,
                "versions_on_disk": list_versions(table_root),
                "ok": cycle_ok,
            }
        )
        print(f"# cycle {cycle}: {cycles[-1]}", file=sys.stderr)
        spark.catalog.clearCache()

    # maintenance cost must track data volume, not micro-batch age:
    # per-row cost in the last cycle within 3x of the first (generous —
    # tiny absolute times on a steal-prone VM)
    flat_cost = cycles[-1]["sec_per_mrow"] <= 3.0 * cycles[0]["sec_per_mrow"]
    result = {
        "n_cycles": N_CYCLES,
        "batches_per_cycle": BATCHES_PER_CYCLE,
        "rows_per_batch": ROWS_PER_BATCH,
        "cycles": cycles,
        "live_files_final": cycles[-1]["files_live"],
        "compacted_files_max": max(c["files_compacted"] for c in cycles),
        "all_cycles_ok": ok,
        "flat_maintenance_cost": flat_cost,
        "calibration": calibration(spark),
    }
    print(json.dumps(result))
    assert ok, "a maintenance cycle failed verification"
    # the docstring's property 4 is a contract, not a report field
    assert flat_cost, "per-row compaction cost grew with sink age"
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
