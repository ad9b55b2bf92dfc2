"""ngram_jaccard stage decomposition at sf1 (VERDICT r12 item 6):
is the shingle HOF (map-side compute) or the shingle-string exchange
the wall? Times three noop-sink cuts of the SAME pipeline
(guide §1.4 — noop computes every column, no count-pruning):

  exploded : widen + word_shingles HOF + explode        (no exchange)
  buckets  : exploded + groupBy(shingle).collect_list   (+ THE exchange)
  full     : the whole ngram_jaccard query

Prototype the exact dictionary join-back ONLY if (buckets − exploded)
dominates. Usage: python scripts/profile_ngram_sf1.py [sf_dir] [reps=3]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1x10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from lours_spark.functions import text as TX
    from lours_spark.operators.dedup import _widen
    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spark = get_spark("r12-ngram-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def exploded_df():
        return (
            _widen(docs)
            .select(
                F.col("doc_id").alias("__id"),
                TX.word_shingles(F.col("text"), k=3).alias("__sh"),
            )
            .select(
                "__id", F.size("__sh").alias("__n"),
                F.explode("__sh").alias("shingle"),
            )
        )

    def buckets_df():
        return (
            exploded_df()
            .groupBy("shingle")
            .agg(F.collect_list(F.struct("__id", "__n")).alias("__docs"))
            .filter(F.size("__docs") > 1)
        )

    CUTS = {
        "exploded": lambda: noop(exploded_df()),
        "buckets": lambda: noop(buckets_df()),
        "full": lambda: ALL_QUERIES["ngram_jaccard"](spark, SF_DIR).count(),
    }
    # warm each cut once
    for fn in CUTS.values():
        fn()
        spark.catalog.clearCache()
        gc.collect()
    res = {k: [] for k in CUTS}
    for _ in range(REPS):
        for name, fn in CUTS.items():
            t0 = time.time()
            fn()
            res[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
    for name, times in res.items():
        print(f"RESULT {name}: min {min(times)} runs {times}", flush=True)
    e, b = min(res["exploded"]), min(res["buckets"])
    print(
        f"RESULT verdict: HOF(map) {e}s, exchange+collect adds "
        f"{round(b - e, 3)}s ({(b - e) / b:.0%} of the bucket cut)",
        flush=True,
    )


if __name__ == "__main__":
    main()
