"""Sequence-packing operators (operators/packing.py): concat-and-chunk
window math and per-shard first-fit-decreasing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.operators.packing import pack_chunked, pack_greedy

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from lours_spark.suite import _t

    return _t(spark, SF, "documents")


def test_pack_chunked_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "a", 3), (2, "a", 5), (3, "a", 2), (10, "b", 9), (11, "b", 1)],
        "doc_id long, source string, n long",
    )
    out = {
        (r["shard"], r["doc_id"], r["pack_seq"]): (r["tok_from"], r["tok_to"])
        for r in pack_chunked(df, budget=4, token_col="n").collect()
    }
    assert out == {
        ("a", 1, 0): (0, 3),
        ("a", 2, 0): (0, 1),
        ("a", 2, 1): (1, 5),
        ("a", 3, 2): (0, 2),
        ("b", 10, 0): (0, 4),
        ("b", 10, 1): (4, 8),
        ("b", 10, 2): (8, 9),
        ("b", 11, 2): (0, 1),
    }


def test_pack_chunked_invariants(spark, docs):
    budget = 64
    out = pack_chunked(docs, budget=budget).cache()
    try:
        # every document's slices reassemble it exactly: contiguous,
        # starting at 0, ending at n_tok
        per_doc = (
            out.groupBy("shard", "doc_id", "n_tok")
            .agg(
                F.sum(F.col("tok_to") - F.col("tok_from")).alias("covered"),
                F.min("tok_from").alias("lo"),
                F.max("tok_to").alias("hi"),
            )
            .filter(
                (F.col("covered") != F.col("n_tok"))
                | (F.col("lo") != 0)
                | (F.col("hi") != F.col("n_tok"))
            )
        )
        assert per_doc.count() == 0
        # every pack except each shard's last holds exactly `budget`
        last = (
            out.groupBy("shard").agg(F.max("pack_seq").alias("last_seq"))
        )
        bad = (
            out.groupBy("shard", "pack_seq")
            .agg(F.sum(F.col("tok_to") - F.col("tok_from")).alias("fill"))
            .join(last, "shard")
            .filter(
                (F.col("pack_seq") != F.col("last_seq"))
                & (F.col("fill") != budget)
            )
        )
        assert bad.count() == 0
        # pack_seq is dense from 0 per shard
        dense = last.join(
            out.groupBy("shard").agg(
                F.countDistinct("pack_seq").alias("n_packs")
            ),
            "shard",
        ).filter(F.col("n_packs") != F.col("last_seq") + 1)
        assert dense.count() == 0
    finally:
        out.unpersist()


def test_pack_chunked_partitioning_invariant(spark, docs):
    a = {
        tuple(r)
        for r in pack_chunked(docs.repartition(13), budget=50).collect()
    }
    b = {tuple(r) for r in pack_chunked(docs.coalesce(1), budget=50).collect()}
    assert a == b


def test_pack_greedy_invariants(spark, docs):
    budget = 64
    out = pack_greedy(docs, budget=budget).cache()
    try:
        rows = out.collect()
        n_in = (
            docs.filter(
                F.size(F.split(F.trim(F.lower("text")), r"\s+")) > 0
            ).count()
        )
        assert len(rows) == n_in  # every doc packed exactly once
        fills: dict = {}
        for r in rows:
            key = (r["shard"], r["pack_seq"])
            fills.setdefault(key, []).append((r["n_tok"], r["oversize"]))
        for (shard, seq), members in fills.items():
            total = sum(n for n, _ in members)
            if any(ov for _, ov in members):
                # oversize docs sit alone in their pack
                assert len(members) == 1
            else:
                assert total <= budget, (shard, seq, total)
    finally:
        out.unpersist()


def test_pack_greedy_deterministic(spark, docs):
    a = {
        (r["shard"], r["doc_id"]): r["pack_seq"]
        for r in pack_greedy(docs.repartition(11), budget=80).collect()
    }
    b = {
        (r["shard"], r["doc_id"]): r["pack_seq"]
        for r in pack_greedy(docs.coalesce(1), budget=80).collect()
    }
    assert a == b


def test_pack_chunked_tied_order_values(spark):
    """Ties in order_col must NOT share a cumulative sum (the default
    RANGE window frame would give both tied docs the same __end,
    double-covering positions and over-filling packs): explicit ROWS
    frame + doc_id tie-break keeps every non-final pack exactly full."""
    df = spark.createDataFrame(
        [(1, "s", 3, 10), (2, "s", 5, 10), (3, "s", 2, 20)],
        "doc_id long, source string, n long, ts long",
    )
    out = pack_chunked(df, budget=4, token_col="n", order_col="ts")
    fills = {}
    for r in out.collect():
        fills[r["pack_seq"]] = fills.get(r["pack_seq"], 0) + (
            r["tok_to"] - r["tok_from"]
        )
    last = max(fills)
    assert all(v == 4 for k, v in fills.items() if k != last), fills
    assert fills[last] <= 4
    # order_col colliding with the id output name must not be ambiguous
    assert pack_chunked(df, budget=4, token_col="n", order_col="doc_id").count()


def test_pack_greedy_string_ids(spark):
    """The applyInPandas schema derives the id dtype from the input —
    URI/hash-keyed corpora (string ids) work."""
    df = spark.createDataFrame(
        [("u1", "s", 5), ("u2", "s", 4), ("u3", "s", 3)],
        "doc_id string, source string, n long",
    )
    rows = pack_greedy(df, budget=8, token_col="n").collect()
    assert {r["doc_id"] for r in rows} == {"u1", "u2", "u3"}
    assert all(isinstance(r["doc_id"], str) for r in rows)


def test_pack_greedy_open_pack_bound(spark):
    """The bounded open-pack window keeps invariants when it closes
    packs early, and an oversize-heavy corpus stays linear (each
    oversize doc is a singleton pack, never scanned)."""
    rows = [(i, "s", 7) for i in range(300)] + [
        (1000 + i, "s", 50) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = pack_greedy(df, budget=10, token_col="n", max_open_packs=4).collect()
    assert len(out) == 350
    fills: dict = {}
    for r in out:
        fills.setdefault(r["pack_seq"], []).append((r["n_tok"], r["oversize"]))
    for seq, members in fills.items():
        if any(ov for _, ov in members):
            assert len(members) == 1
        else:
            assert sum(n for n, _ in members) <= 10
    # oversize docs: exactly one pack each, ids 0..49
    over = [r for r in out if r["oversize"]]
    assert len(over) == 50
    assert {r["pack_seq"] for r in over} == set(range(50))


def test_pack_budget_validation(spark):
    df = spark.createDataFrame([(1, "a", 3)], "doc_id long, source string, n long")
    with pytest.raises(ValueError, match="budget"):
        pack_chunked(df, budget=0, token_col="n")
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(df, budget=-1, token_col="n")
