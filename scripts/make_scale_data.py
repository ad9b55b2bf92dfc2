"""Generate a 10x-scale copy of the sf0.1 test tables for SCALING.md.

Usage: python scripts/make_scale_data.py [out_dir] [factor]

Only the tables the heaviest pipelines read are scaled (lineitem,
orders, documents, events, embeddings). Scaling preserves WORKLOAD
STRUCTURE, not just row
count:

- orders/lineitem: each copy k shifts o_orderkey/l_orderkey and
  o_custkey by copy-sized strides, so join fan-outs, group sizes and
  keep-separate chunk structure replicate exactly per copy.
- documents: each copy k rewrites ~60% of words with a copy-k suffix
  (a deterministic function of (word, k)), so WITHIN-copy shingle
  similarity — and therefore dedup pair structure — is preserved,
  while CROSS-copy Jaccard drops to ~0.25, below every gate threshold.
  Near-dup pair counts and paragraph-duplicate counts thus scale ~k,
  not ~k^2 (clean linear-workload semantics for the scaling table).
- embeddings: each copy k applies a deterministic per-dimension SIGN
  FLIP (s_{k,d} ∈ {±1} from hash(d, k); copy 0 verbatim). Sign flips
  are isometries, so within-copy inner products — and near-dup pair
  structure — are preserved BIT-EXACTLY (x·(±1) is exact in float),
  while a cross-copy cosine gets an independent random ±1 pattern on
  each term: mean 0, std ~dim^-1/2 ≈ 0.1, so nothing crosses the 0.95
  near-dup threshold and ANN pair counts scale ~k, not ~k^2.

The output dir is scratch (gitignored); ~10x the 17MB source.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1x10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        # a factor-N replica is an N-leg union plan; large factors OOM
        # the default 1g driver heap at planning/write time
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    os.makedirs(out_dir, exist_ok=True)

    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))

    key_shift = orders.agg(F.max("o_orderkey")).first()[0] + 1
    cust_shift = orders.agg(F.max("o_custkey")).first()[0] + 1

    def replicate(df, shifts: dict):
        copies = []
        for k in range(factor):
            c = df
            for col, stride in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(k * stride))
            copies.append(c.withColumn("__copy", F.lit(k)))
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    replicate(orders, {"o_orderkey": key_shift, "o_custkey": cust_shift}).drop(
        "__copy"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    replicate(lineitem, {"l_orderkey": key_shift}).drop("__copy").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "lineitem.parquet"))

    d = replicate(docs, {"doc_id": 10_000_000})
    # word-level mutation, deterministic in (word, copy): suffix ~60%
    # of words with the copy tag; copy 0 stays verbatim
    mutated = F.when(
        F.col("__copy") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(
                    F.pmod(F.hash(w, F.col("__copy")), F.lit(10)) < 6,
                    F.concat(w, F.lit("~"), F.col("__copy").cast("string")),
                ).otherwise(w),
            ),
            " ",
        )
    )
    d.withColumn("text", mutated).withColumn(
        "n_chars", F.length("text")
    ).drop("__copy").write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    # events: each copy shifts user_id/event_id by table-sized strides —
    # per-user event mix and temporal density replicate exactly, user
    # count scales by k, so as-of windows and range-join pair counts
    # scale ~k (same linear-workload semantics as the other tables)
    events = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    ev_user_shift = events.agg(F.max("user_id")).first()[0] + 1
    ev_id_shift = events.agg(F.max("event_id")).first()[0] + 1
    replicate(
        events, {"user_id": ev_user_shift, "event_id": ev_id_shift}
    ).drop("__copy").write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    # embeddings: sign-flip isometry per copy (see module docstring);
    # vec_id shifts by a table-sized stride like every other id
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    vec_shift = emb.agg(F.max("vec_id")).first()[0] + 1
    flipped = F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                * F.when(
                    F.pmod(F.hash(i, F.col("__copy")), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).cast("float"),
        )
    )
    replicate(emb, {"vec_id": vec_shift}).withColumn(
        "embedding", flipped
    ).drop("__copy").write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    # small dims referenced by _t for completeness (verbatim copies)
    for t in ("nation", "region", "customer", "supplier", "part"):
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )
    for t in ("orders", "lineitem", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
