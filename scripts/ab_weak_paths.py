"""Paired same-session A/B for the four r11 'weak' paths (VERDICT r12
item 2): each query alternates ARM A (HEAD code) and ARM B (the
specific r11 change undone in-process via a module toggle) inside ONE
warmed JVM, interleaved A,B,A,B,... so host drift brackets both arms
equally. min per arm is the operative number.

Toggles:
- lsh_bucket_topk / ivf_topk : similarity._widen -> identity
  (undoes the r11 corpus-side widen)
- minhash_hot_bucket (+ optional minhash_lsh_pairs twin) :
  dedup.materialize -> DataFrame.cache() (lazy, the r10 shape the r11
  eager localCheckpoint replaced)

dedup_clusters_distributed's r11 change (push-form CC) is inline in
split/chunks.py and is A/B'd by file swap across processes instead —
see OPTIMIZATION_r12.md.

Usage: python scripts/ab_weak_paths.py [rounds=4]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> None:
    import lours_spark.operators.dedup as dedup
    import lours_spark.operators.similarity as sim
    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spark = get_spark("r12-ab-weak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s * 1.0, "double")
    spark.range(1000, numPartitions=32).select(_warm("id")).count()

    real_widen = sim._widen
    real_mat = dedup.materialize

    def no_widen(df, *cols):
        return df

    def cache_mat(df, eager=True):
        return df.cache()  # the r10 shape: lazy cache, raced by legs

    CASES = {
        "lsh_bucket_topk": (sim, "_widen", real_widen, no_widen),
        "ivf_topk": (sim, "_widen", real_widen, no_widen),
        "minhash_hot_bucket": (dedup, "materialize", real_mat, cache_mat),
        "minhash_lsh_pairs": (dedup, "materialize", real_mat, cache_mat),
    }

    def run(name: str) -> float:
        t0 = time.time()
        ALL_QUERIES[name](spark, SF_DIR).count()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return round(dt, 3)

    for name, (mod, attr, head_v, base_v) in CASES.items():
        a_times, b_times = [], []
        for _ in range(ROUNDS):
            setattr(mod, attr, head_v)
            a_times.append(run(name))
            setattr(mod, attr, base_v)
            b_times.append(run(name))
        setattr(mod, attr, head_v)
        ma, mb = min(a_times), min(b_times)
        verdict = "HEAD faster" if ma < mb else "revert faster"
        print(
            f"{name}: HEAD(min) {ma}s vs REVERTED(min) {mb}s "
            f"[{mb / ma:.2f}x] {verdict}\n  A(head)   {a_times}\n"
            f"  B(revert) {b_times}"
        )


if __name__ == "__main__":
    main()
