"""Bloom novelty-filter guarantees: zero false negatives, bounded
false-positive rate, determinism, and bloom ⊆ exact."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sets(spark, n_seen=2000, n_new=1000):
    seen = spark.range(n_seen).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("fp")
    )
    new = spark.range(n_seen, n_seen + n_new).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("fp")
    )
    return seen, new


def test_no_false_negatives(spark):
    """Every genuinely-seen value MUST be filtered out — the property
    that makes the approximation safe for dedup."""
    from lours_spark.operators.bloom import filter_novel

    seen, new = _sets(spark)
    corpus = seen.unionByName(new)
    out = filter_novel(corpus, seen, "fp")
    survivors = {r["fp"] for r in out.collect()}
    seen_vals = {r["fp"] for r in seen.collect()}
    assert not survivors & seen_vals


def test_fpr_within_bound_and_subset_of_exact(spark):
    from lours_spark.operators.bloom import filter_novel

    seen, new = _sets(spark, n_seen=5000, n_new=3000)
    got = {r["fp"] for r in filter_novel(new, seen, "fp", fpp=0.05).collect()}
    exact = {r["fp"] for r in
             filter_novel(new, seen, "fp", method="exact").collect()}
    assert got <= exact  # bloom only ever drops extra rows
    dropped = len(exact) - len(got)
    # measured FPR stays within ~3x of the design point (a slack bound:
    # the estimator itself has variance at this n)
    assert dropped / len(exact) <= 0.15, dropped


def test_deterministic_across_runs_and_partitionings(spark):
    from lours_spark.operators.bloom import filter_novel

    seen, new = _sets(spark, n_seen=1000, n_new=500)
    a = {r["fp"] for r in filter_novel(new, seen, "fp").collect()}
    b = {r["fp"] for r in
         filter_novel(new.repartition(13), seen.repartition(7), "fp").collect()}
    assert a == b


def test_bloom_plan_has_no_shuffle_on_corpus(spark):
    """The probe side must be scan → hash → python filter: no Exchange,
    no join in the corpus branch."""
    from lours_spark.operators.bloom import filter_novel

    seen, new = _sets(spark)
    plan = (
        filter_novel(new, seen, "fp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_sizing_and_empty_seen(spark):
    from lours_spark.operators.bloom import _sizing, filter_novel

    m, k = _sizing(1000, 0.01)
    assert 9000 < m < 11000 and 6 <= k <= 8  # textbook ~9.6 bits/item

    seen = spark.createDataFrame([], "fp string")
    new = spark.createDataFrame([("x",), ("y",)], "fp string")
    out = filter_novel(new, seen, "fp")
    assert sorted(r["fp"] for r in out.collect()) == ["x", "y"]


def test_null_fingerprints_agree_with_exact_path(spark):
    """SQL semantics: NULL never equals NULL, so NULL corpus rows are
    ALWAYS novel — in both methods, even when seen contains NULLs."""
    from pyspark.sql import functions as F

    from lours_spark.operators.bloom import filter_novel

    seen = spark.createDataFrame([("a",), (None,)], "fp string")
    corpus = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "fp string"
    )
    bloom = [r["fp"] for r in filter_novel(corpus, seen, "fp").collect()]
    exact = [r["fp"] for r in
             filter_novel(corpus, seen, "fp", method="exact").collect()]
    assert sorted(bloom, key=str) == sorted(exact, key=str)
    assert sorted(bloom, key=str) == [None, None, "b"]
