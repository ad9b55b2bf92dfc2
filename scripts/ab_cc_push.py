"""Paired same-session A/B for dedup_clusters_distributed (VERDICT r12
item 2, fourth weak path): HEAD's push-form connected components
(r11 commit 6b6de60 — one exchange per round) vs the pre-r11 pull form,
loaded from git as a standalone module and swapped into
lours_spark.split.chunks.connected_components between runs. The suite
query resolves the symbol at call time, so the swap is exact;
interleaved A,B,A,B in one warmed JVM.

Usage:
  git show 6b6de60~1:lours_spark/split/chunks.py > /tmp/chunks_pull.py
  python scripts/ab_cc_push.py [rounds=4]
"""

from __future__ import annotations

import gc
import importlib.util
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> None:
    import lours_spark.split.chunks as chunks
    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spec = importlib.util.spec_from_file_location(
        "chunks_pull", "/tmp/chunks_pull.py"
    )
    pull_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pull_mod)

    spark = get_spark("r12-ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s * 1.0, "double")
    spark.range(1000, numPartitions=32).select(_warm("id")).count()

    head_cc = chunks.connected_components
    pull_cc = pull_mod.connected_components

    def run(name: str) -> float:
        t0 = time.time()
        ALL_QUERIES[name](spark, SF_DIR).count()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return round(dt, 3)

    for name in ("dedup_clusters_distributed",):
        a_times, b_times = [], []
        for _ in range(ROUNDS):
            chunks.connected_components = head_cc
            a_times.append(run(name))
            chunks.connected_components = pull_cc
            b_times.append(run(name))
        chunks.connected_components = head_cc
        ma, mb = min(a_times), min(b_times)
        print(
            f"{name}: HEAD-push(min) {ma}s vs pull(min) {mb}s "
            f"[{mb / ma:.2f}x]\n  A(push) {a_times}\n  B(pull) {b_times}"
        )


if __name__ == "__main__":
    main()
