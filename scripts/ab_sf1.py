"""sf1 (10x) paired A/B for the r11 scale-gated deferrals (VERDICT r12
item 4 + the lsh_bucket_topk decision from item 2 + item 7):

  widen_cap   : unkeyed widen cap 16 vs FULL shuffle width
                (ngram_jaccard, decontaminate, dedup_clusters)
  lsh_widen   : lsh_bucket_topk corpus widen vs none
  blas_widen  : widen before the mapInPandas BLAS/local kernels
                (cosine_topk / knn_label shapes, corpus pre-widened)
  sd_eager    : semantic_dedup eager materialize of the assignment

One warmed JVM, arms interleaved B,A per round (B = the non-HEAD
variant first, so JVM warmth cannot favor HEAD), min per arm.

Usage: python scripts/ab_sf1.py [sf_dir] [rounds=3]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1x10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    import lours_spark.operators.dedup as dedup
    import lours_spark.operators.similarity as sim
    from lours_spark import suite
    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spark = get_spark("r12-ab-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s * 1.0, "double")
    spark.range(1000, numPartitions=32).select(_warm("id")).count()

    real_widen = sim._widen  # the shared helper (same object as dedup's)

    def widen_full(df, *cols):
        target = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        if df.rdd.getNumPartitions() >= min(target, 16):
            return df
        return df.repartition(target, *cols) if cols else df.repartition(target)

    def no_widen(df, *cols):
        return df

    def timed(fn) -> float:
        t0 = time.time()
        fn()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return round(dt, 3)

    def q(name):
        return lambda: ALL_QUERIES[name](spark, SF_DIR).count()

    # cosine/knn shapes with an explicitly pre-widened corpus (the
    # operator change under test, replicated at the call site)
    def cosine_shape(widen_corpus: bool):
        def run():
            from lours_spark.operators.similarity import brute_force_topk

            emb = suite._t(spark, SF_DIR, "embeddings")
            corpus = emb.repartition(16) if widen_corpus else emb
            queries = emb.filter(F.col("vec_id") < 10)
            brute_force_topk(corpus, queries, k=5).count()

        return run

    def knn_shape(widen_corpus: bool):
        def run():
            from lours_spark.operators.similarity import (
                brute_force_topk,
                knn_label,
            )

            emb = suite._t(spark, SF_DIR, "embeddings")
            corpus = emb.repartition(16) if widen_corpus else emb
            queries = emb.filter(F.col("vec_id") < 50)
            knn_label(brute_force_topk(corpus, queries, k=5), emb).count()

        return run

    def set_widen(v):
        sim._widen = v
        dedup._widen = v

    EXPS = []
    for name in ("ngram_jaccard", "decontaminate", "dedup_clusters"):
        EXPS.append(
            (f"widen_cap:{name}",
             lambda v=real_widen: set_widen(v), q(name),      # A: HEAD cap16
             lambda v=widen_full: set_widen(v), q(name)))     # B: full width
    EXPS.append(
        ("lsh_widen:lsh_bucket_topk",
         lambda: setattr(sim, "_widen", real_widen), q("lsh_bucket_topk"),
         lambda: setattr(sim, "_widen", no_widen), q("lsh_bucket_topk")))
    EXPS.append(
        ("blas_widen:cosine_topk",
         lambda: None, cosine_shape(False),                   # A: HEAD (none)
         lambda: None, cosine_shape(True)))                   # B: widened
    EXPS.append(
        ("blas_widen:knn_label",
         lambda: None, knn_shape(False),
         lambda: None, knn_shape(True)))
    EXPS.append(
        ("sd_eager:semantic_dedup",
         lambda: setattr(dedup, "_SD_EAGER_ASSIGNED", False),
         q("semantic_dedup"),
         lambda: setattr(dedup, "_SD_EAGER_ASSIGNED", True),
         q("semantic_dedup")))

    for label, set_a, run_a, set_b, run_b in EXPS:
        # one unrecorded warm run of the HEAD arm
        set_a()
        timed(run_a)
        a, b = [], []
        for _ in range(ROUNDS):
            set_b()
            b.append(timed(run_b))
            set_a()
            a.append(timed(run_a))
        set_widen(real_widen)
        dedup._SD_EAGER_ASSIGNED = False
        print(
            f"RESULT {label}: HEAD(min) {min(a)} vs ALT(min) {min(b)} "
            f"[alt/head {min(b) / min(a):.2f}x] A{a} B{b}",
            flush=True,
        )


if __name__ == "__main__":
    main()
