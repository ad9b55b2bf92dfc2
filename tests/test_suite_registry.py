"""Registry-count guards: the driver gates exactly the first 50
entries of ``__spark_entry__.queries()``, so a registry edit that
grows past 50 silently drops the tail from correctness checking, and
one that shrinks it wastes gate slots. These constants are also quoted
in module docstrings — keep them honest here, in one place."""

from __future__ import annotations


def test_gate_is_exactly_50_with_47_oracles():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) == 50, len(q)
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    # the three rows-only-by-design gates (COCOeval-parity or
    # reference-protocol covered elsewhere)
    assert rows_only == {"greedy_matching", "detection_pr_ap", "balanced_split"}


def test_all_queries_covers_gate_facets():
    from lours_spark.suite import ALL_QUERIES, GATE_FACETS, QUERIES

    assert len(QUERIES) == 50
    assert len(ALL_QUERIES) == 82
    for combined, facets in GATE_FACETS.items():
        assert combined in QUERIES, combined
        for f in facets:
            assert f in ALL_QUERIES, (combined, f)
    # every standalone query is either a gate query itself, a facet of
    # a combined gate query, or an explicitly bench-only stress/variant
    gated = set(QUERIES) | {
        f for facets in GATE_FACETS.values() for f in facets
    }
    bench_only = set(ALL_QUERIES) - gated
    assert bench_only == {
        "matcher_skew",          # skewed-group matcher stress facet
        "balanced_split_approx", # scale-mode variant of gated balanced_split
        "dedup_clusters_distributed",  # forced-distributed CC variant
        "pack_greedy",           # FFD packing (not SQL-expressible)
    }


def test_bench_list_covers_all_queries():
    """bench.py times a hand-ordered list — a new ALL_QUERIES entry
    must be added there too or it silently never gets a number."""
    import bench

    from lours_spark.suite import ALL_QUERIES

    assert set(bench.BENCH_QUERIES) == set(ALL_QUERIES)
