"""Price z-order-clustered compaction at scale (round 11): 6M-row
lineitem (the 10x replica), compacted three ways to 64 files —
round-robin, `zorder_by` Morton, `zorder_by` Hilbert — then a
selective 2-D box filter on (l_partkey, l_suppkey) scanned over each
layout.

What this measures:

1. the compaction COST delta (the range exchange + in-task sort vs
   plain round-robin — plus Hilbert's Arrow key);
2. the READ win: with tight per-file/row-group min-max envelopes on
   BOTH columns, a box predicate prunes most row groups from parquet
   footer stats alone; round-robin leaves every file spanning both
   full axes so nothing prunes;
3. the file-containment counts (how many files actually hold matching
   rows — the skip potential the envelopes create).

Usage: python scripts/bench_zorder_compaction.py [scaled_dir]
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _calm import calibration, wait_for_calm  # noqa: E402

N_FILES = 64


def main() -> None:
    from pyspark.sql import functions as F

    from lours_spark.io.compact import compact_parquet
    from lours_spark.session import get_spark

    scaled = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_data", "sf1x10",
    )
    spark = get_spark("zorder-compaction-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="zorder_bench_")
    src = os.path.join(tmp, "src")
    li = spark.read.parquet(os.path.join(scaled, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice",
    )
    li.write.parquet(src)
    n_rows = spark.read.parquet(src).count()
    lo_p, hi_p, lo_s, hi_s = spark.read.parquet(src).agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    # a ~1/16 x 1/16 box -> ~0.4% of rows; selective enough that
    # envelope pruning dominates
    p_a = lo_p + (hi_p - lo_p) * 5 // 16
    p_b = lo_p + (hi_p - lo_p) * 6 // 16
    s_a = lo_s + (hi_s - lo_s) * 5 // 16
    s_b = lo_s + (hi_s - lo_s) * 6 // 16
    box = (
        F.col("l_partkey").between(p_a, p_b)
        & F.col("l_suppkey").between(s_a, s_b)
    )

    wait_for_calm()
    out: dict = {"n_rows": int(n_rows), "n_files": N_FILES}
    layouts = {
        "roundrobin": {},
        "morton": {"zorder_by": ["l_partkey", "l_suppkey"]},
        "hilbert": {
            "zorder_by": ["l_partkey", "l_suppkey"],
            "zorder_curve": "hilbert",
        },
    }
    expected = None
    for name, kw in layouts.items():
        dst = os.path.join(tmp, name)
        wait_for_calm()
        t0 = time.time()
        compact_parquet(spark, src, dst, num_files=N_FILES, **kw)
        compact_sec = round(time.time() - t0, 2)

        def scan() -> "tuple[float, int]":
            t0 = time.time()
            n = spark.read.parquet(dst).filter(box).count()
            dt = time.time() - t0
            spark.catalog.clearCache()
            return dt, n

        # min-of-3 warm scans (footers cached after the first)
        times, n_match = [], None
        for _ in range(3):
            dt, n_match = scan()
            times.append(dt)
        if expected is None:
            expected = n_match
        assert n_match == expected, (name, n_match, expected)
        files_with_matches = (
            spark.read.parquet(dst)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        out[name] = {
            "compact_sec": compact_sec,
            "scan_sec_min3": round(min(times), 3),
            "files_with_matches": int(files_with_matches),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    out["box_rows"] = int(expected)
    out["box_selectivity"] = round(expected / n_rows, 5)
    out["scan_speedup_morton"] = round(
        out["roundrobin"]["scan_sec_min3"] / out["morton"]["scan_sec_min3"], 2
    )
    out["scan_speedup_hilbert"] = round(
        out["roundrobin"]["scan_sec_min3"] / out["hilbert"]["scan_sec_min3"], 2
    )
    out["calibration"] = calibration(spark)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
