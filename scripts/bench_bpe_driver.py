"""Driver-decade evidence for train_bpe's merge loop (VERDICT r8 #2).

train_bpe confines corpus-sized work to one distributed word_counts
pass; everything after the collect is a driver loop over the DISTINCT
word table. The module docstring claims that table is "megabytes, not
terabytes" after pruning — this script MEASURES the driver loop at
100k and 1M distinct words (two decades around a realistic pruned
web vocabulary) so the claim has numbers: wall seconds for 50 merges
and the resident-set delta of the segment/index state.

Corpus shape: one distinct base-36 word per row plus three shared
underscore-prefixed stop words (underscores cannot appear in base-36,
so no id ever collides with a stop word), so (a) the distinct count is
exactly n+3 and (b) early merges hit large fractions of the vocabulary
— the worst case for the incremental re-segmentation index, not a
cherry-picked sparse one.

Usage: python scripts/bench_bpe_driver.py
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _calm import calibration, rss_mb, wait_for_calm  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, n: int):
    """n distinct base-36 words (one per doc) + 3 collision-proof
    stop words (base-36 is [0-9a-z]; '_the' can never be an id)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("_the _of _and "), F.lower(F.conv(F.col("id"), 10, 36))
        ).alias("text"),
    )


def main() -> None:
    from lours_spark.operators.vocab import train_bpe
    from lours_spark.session import get_spark

    spark = get_spark("bpe-driver-decades")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for n in (100_000, 1_000_000):
        df = corpus(spark, n)
        wait_for_calm()
        r0, t0 = rss_mb(), time.time()
        merges = train_bpe(df, num_merges=50, max_vocab_words=2_000_000)
        dt = time.time() - t0
        results[f"{n}"] = {
            "distinct_words": n + 3,
            "num_merges": len(merges),
            "sec": round(dt, 2),
            "driver_rss_delta_mb": round(rss_mb() - r0, 1),
        }
        print(f"# {n}: {results[str(n)]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "bpe_driver_decades": results,
                "calibration": calibration(spark),
            }
        )
    )


if __name__ == "__main__":
    main()
