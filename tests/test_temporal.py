"""asof_join / range_join semantics and plan-shape guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, None, "e")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 18, 2.0), (2, 100, 9.0)],
        "k long, t long, v double",
    )
    return left, right


def test_asof_backward_basics(spark, frames):
    from lours_spark.operators.temporal import asof_join

    left, right = frames
    out = {r["name"]: (r["t_r"], r["v_r"])
           for r in asof_join(left, right, "k", "t").collect()}
    assert out["a"] == (10, 1.0)   # inclusive at equal time
    assert out["b"] == (18, 2.0)
    assert out["c"] == (None, None)  # nothing at-or-before t=5
    assert out["d"] == (None, None)  # right row is in the future
    assert out["e"] == (None, None)  # null left time never matches


def test_asof_forward_and_tolerance(spark, frames):
    from lours_spark.operators.temporal import asof_join

    left, right = frames
    fwd = {r["name"]: r["v_r"] for r in asof_join(
        left, right, "k", "t", direction="forward").collect()}
    assert fwd == {"a": 1.0, "b": None, "c": 1.0, "d": 9.0, "e": None}

    tol = {r["name"]: r["v_r"] for r in asof_join(
        left, right, "k", "t", direction="forward", tolerance=30).collect()}
    assert tol["d"] is None  # 100 - 15 > 30

    back_tol = {r["name"]: r["v_r"] for r in asof_join(
        left, right, "k", "t", tolerance=2).collect()}
    assert back_tol == {"a": 1.0, "b": 2.0, "c": None, "d": None, "e": None}


def test_asof_tie_breaks_to_max_payload(spark):
    from lours_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 7.0), (1, 10, 3.0)], "k long, t long, v double"
    )
    # several right rows at one time: deterministic max-struct winner
    assert asof_join(left, right, "k", "t").first()["v_r"] == 7.0


def test_asof_timestamp_tolerance_in_seconds(spark):
    from lours_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0)], "k long, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    hit = asof_join(left, right, "k", "ts", tolerance=3600).first()
    assert hit["v_r"] == 5.0
    miss = asof_join(left, right, "k", "ts", tolerance=3599).first()
    assert miss["v_r"] is None


def test_asof_single_exchange_no_join(spark, frames):
    """The union-tag shape: ONE hash exchange on the key, no join
    node, no Python — the cost of a sort-merge join without the join."""
    from lours_spark.operators.temporal import asof_join

    left, right = frames
    plan = (
        asof_join(left, right, "k", "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_range_join_pairs_and_band_edges(spark):
    from lours_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, s string")
    right = spark.createDataFrame(
        [(1, 90, "in-lo"), (1, 160, "in-hi"), (1, 89, "below"),
         (1, 161, "above"), (2, 100, "other-key")],
        "k long, t long, tag string",
    )
    got = sorted(r["tag_r"] for r in range_join(
        left, right, "k", "t", lower=-10, upper=60).collect())
    assert got == ["in-hi", "in-lo"]  # inclusive bounds, key-scoped


def test_range_join_is_equi_join(spark):
    """Bucketing must compile to a real equi-join (hash/broadcast/SMJ),
    never BroadcastNestedLoopJoin."""
    from lours_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, s string")
    right = spark.createDataFrame([(1, 90, 1.0)], "k long, t long, v double")
    plan = (
        range_join(left, right, "k", "t", lower=-10, upper=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_range_join_rejects_empty_band(spark, frames):
    from lours_spark.operators.temporal import range_join

    left, right = frames
    with pytest.raises(ValueError, match="upper > lower"):
        range_join(left, right, "k", "t", lower=5, upper=5)


def test_asof_matches_oracle_shape_on_collisions(spark):
    """Suffix collision and reserved names are refused loudly."""
    from lours_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10, 0.0)], "k long, t long, v_r double")
    right = spark.createDataFrame([(1, 10, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "t")
