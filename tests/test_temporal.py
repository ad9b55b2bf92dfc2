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


def test_rolling_aggregate_range_frame_peers(spark):
    """Rows at the SAME event time are frame peers: both see both —
    the RANGE-frame property that makes the op partitioning-proof."""
    from lours_spark.operators.windows import rolling_aggregate

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 100, 2.0), (1, 250, 4.0)],
        "k long, t long, v double",
    )
    out = rolling_aggregate(df, "k", "t", "v", window=50)
    rows = sorted((r["t"], r["v"], r["roll_count"], r["roll_sum"])
                  for r in out.collect())
    assert rows == [(100, 1.0, 2, 3.0), (100, 2.0, 2, 3.0),
                    (250, 4.0, 1, 4.0)]


def test_rolling_aggregate_timestamp_seconds_and_errors(spark):
    from pyspark.sql import functions as F

    from lours_spark.operators.windows import rolling_aggregate

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0),
         (1, "2024-01-01 00:30:00", 2.0),
         (1, "2024-01-01 02:00:00", 4.0)],
        "k long, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = rolling_aggregate(df, "k", "ts", "v", window=3600,
                            aggs=("count", "mean"))
    got = {r["v"]: (r["roll_count"], r["roll_mean"]) for r in out.collect()}
    assert got == {1.0: (1, 1.0), 2.0: (2, 1.5), 4.0: (1, 4.0)}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported"):
        rolling_aggregate(df, "k", "ts", "v", window=10, aggs=("median",))

    # numeric event-time column: integral float windows convert, a
    # fractional one fails with a clear error at call time (not an
    # opaque rangeBetween plan-build crash)
    num = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 2.0)], "k long, t long, v double"
    )
    out2 = rolling_aggregate(num, "k", "t", "v", window=100.0,
                             aggs=("count",))
    assert {r["t"]: r["roll_count"] for r in out2.collect()} == {100: 1,
                                                                 150: 2}
    with _pytest.raises(ValueError, match="fractional window"):
        rolling_aggregate(num, "k", "t", "v", window=0.5)


def test_rolling_aggregate_single_window_pass(spark):
    """All aggregates share one frame → ONE WindowExec, one exchange."""
    from lours_spark.operators.windows import rolling_aggregate

    df = spark.createDataFrame([(1, 100, 1.0)], "k long, t long, v double")
    plan = (
        rolling_aggregate(df, "k", "t", "v", window=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_earliest_match_and_chain_break(spark):
    from lours_spark.operators.temporal import funnel

    e = spark.createDataFrame(
        [
            # u1 completes all three; step 2 must take the EARLIEST
            # qualifying click (t=15), not the later one (t=30)
            (1, 10, "signup"), (1, 15, "click"), (1, 30, "click"),
            (1, 40, "purchase"),
            # u2: click precedes signup only → chain breaks at step 2,
            # and the later purchase must NOT count without a click
            (2, 20, "signup"), (2, 5, "click"), (2, 50, "purchase"),
            # u3: never signed up → no row at all
            (3, 1, "click"), (3, 2, "purchase"),
        ],
        "user_id long, ts long, event_type string",
    )
    out = {r["user_id"]: r for r in
           funnel(e, ["signup", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["step_1_ts"], out[1]["step_2_ts"], out[1]["step_3_ts"],
            out[1]["steps_completed"]) == (10, 15, 40, 3)
    assert (out[2]["step_2_ts"], out[2]["step_3_ts"],
            out[2]["steps_completed"]) == (None, None, 1)


def test_funnel_within_bounds_each_step(spark):
    from lours_spark.operators.temporal import funnel

    e = spark.createDataFrame(
        [(1, 0, "a"), (1, 50, "b"), (1, 200, "c")],
        "user_id long, ts long, event_type string",
    )
    # step b→c gap is 150 > 100: step 3 breaks, step 2 stands
    r = funnel(e, ["a", "b", "c"], within=100).first()
    assert (r["step_2_ts"], r["step_3_ts"], r["steps_completed"]) == (
        50, None, 2)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="two steps"):
        funnel(e, ["a"])


def test_funnel_rejects_repeated_steps(spark):
    from lours_spark.operators.temporal import funnel

    e = spark.createDataFrame(
        [(1, 0, "a")], "user_id long, ts long, event_type string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="distinct"):
        funnel(e, ["a", "a"])


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: NULL keys on either side never match."""
    from lours_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(None, 10, "ln"), (1, 10, "l1")], "k long, t long, name string"
    )
    right = spark.createDataFrame(
        [(None, 5, 9.0), (1, 5, 1.0)], "k long, t long, v double"
    )
    out = {r["name"]: r["v_r"] for r in
           asof_join(left, right, "k", "t").collect()}
    assert out == {"ln": None, "l1": 1.0}


def test_temporal_rejects_mixed_time_types(spark):
    from lours_spark.operators.temporal import asof_join, range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([(1, 100, 1.0)], "k long, ts long, v double")
    with pytest.raises(TypeError, match="mismatch"):
        asof_join(left, right, "k", "ts")
    with pytest.raises(TypeError, match="mismatch"):
        range_join(left, right, "k", "ts", lower=-1, upper=1)


def test_range_join_rejects_reserved_names(spark):
    from lours_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 100, 5)], "k long, t long, __bucket long"
    )
    right = spark.createDataFrame([(1, 90, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError, match="reserved"):
        range_join(left, right, "k", "t", lower=-10, upper=10)
