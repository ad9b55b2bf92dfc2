"""Atomic chunks: connected components over keep-separate groups.

Re-expresses reference ``lours/dataset/split/disjoint_groups.py:41-132``:
rows sharing any keep-separate group value must land in the same split,
so rows are nodes, shared group values are edges, and chunks are the
connected components.

Two implementations:

- ``atomic_chunks_driver``: collect the (row → group-value) bipartite
  edge list and union-find on the driver — exact reference semantics,
  fine to ~10⁷ edges (the edge list is tiny relative to the data:
  one row per (row, group-column) pair).
- ``atomic_chunks_distributed``: iterative min-label propagation with
  alternating row→value / value→row min-joins until fixpoint — the
  100 TB path (same algorithm GraphFrames uses under the hood), no
  driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges(df: DataFrame, id_col: str, group_cols: list[str]) -> DataFrame:
    """Bipartite (row id, tagged group value) edge list."""
    parts = [
        df.select(
            F.col(id_col).alias("row_id"),
            F.concat_ws("=", F.lit(c), F.col(c).cast("string")).alias("group_value"),
        ).filter(F.col(c).isNotNull())
        for c in group_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def atomic_chunks_driver(
    df: DataFrame, id_col: str, group_cols: list[str]
) -> DataFrame:
    """Exact union-find on the collected edge list. Returns
    (row_id, chunk_id) with chunk_id = min row id of the component."""
    edges = _edges(df, id_col, group_cols).collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for e in edges:
        union(("r", e["row_id"]), ("v", e["group_value"]))
    # only rows that PARTICIPATE in an edge need driver treatment: a
    # row absent from the edge list has every group value NULL, so it
    # is its own singleton component — resolved distributed below via
    # coalesce, keeping driver state size-of-edges, not size-of-table
    row_ids = sorted({e["row_id"] for e in edges})
    comp_min: dict = {}
    assignments = []
    for rid in row_ids:
        root = find(("r", rid))
        comp_min.setdefault(root, rid)
        assignments.append((rid, comp_min[root]))
    spark = df.sparkSession
    adf = F.broadcast(
        spark.createDataFrame(assignments, f"{id_col} long, __chunk long")
    )
    return (
        df.select(id_col)
        .join(adf, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__chunk"), F.col(id_col)).alias("chunk_id"),
        )
    )


def atomic_chunks_distributed(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    max_iter: int = 20,
    unique_ids: bool = True,
) -> DataFrame:
    """Label propagation: labels start as row ids; alternately take the
    min label per group value and per row until no label changes.
    Converges in O(component diameter) rounds — components here are
    star-shaped around group values, so typically ≤ 4-6 rounds.

    Single-column fast path: with one keep-separate column AND one row
    per id (``unique_ids``, the annotation-table shape this operator
    was built for) the components ARE the column's distinct values, so
    one window suffices — no iteration, no convergence actions. When an
    id can appear in SEVERAL rows with different group values (e.g.
    dedup pair membership), those rows transitively bridge groups and
    the fast path would under-merge — pass ``unique_ids=False`` to
    force the iterative propagation."""
    if len(group_cols) == 1 and unique_ids:
        from pyspark.sql import Window

        c = group_cols[0]
        w = Window.partitionBy(c)
        return df.select(
            F.col(id_col),
            F.when(
                F.col(c).isNotNull(), F.min(id_col).over(w)
            ).otherwise(F.col(id_col)).alias("chunk_id"),
        )
    from pyspark.storagelevel import StorageLevel

    # the edge list is consumed twice per round across every round —
    # materialize it ONCE or each round's job re-runs the (potentially
    # expensive) upstream that derived the edges
    edges = _edges(df, id_col, group_cols).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    labels = df.select(F.col(id_col).alias("row_id"))
    if not unique_ids:
        labels = labels.distinct()
    labels = labels.withColumn("label", F.col("row_id"))
    for _ in range(max_iter):
        val_min = (
            edges.join(labels, "row_id")
            .groupBy("group_value")
            .agg(F.min("label").alias("vlabel"))
        )
        new_labels = (
            edges.join(val_min, "group_value")
            .groupBy("row_id")
            .agg(F.min("vlabel").alias("new_label"))
        )
        # one materializing job per round (see connected_components):
        # checkpoint the round's output, then probe convergence from
        # the checkpointed partitions. localCheckpoint blocks are NOT
        # recomputable — on executor-churn clusters (dynamic
        # allocation / spot) a lost block fails the remaining rounds;
        # see operators/_materialize.py for the caveat (the iterative
        # loop keeps direct localCheckpoint: a cache() fallback would
        # accumulate one CacheManager entry per round)
        merged = (
            labels.join(new_labels, "row_id", "left")
            .withColumn(
                "next",
                F.least(F.col("label"), F.coalesce(F.col("new_label"), F.col("label"))),
            )
            .withColumn("__changed", F.col("next") != F.col("label"))
            .select("row_id", F.col("next").alias("label"), "__changed")
            .localCheckpoint()  # also truncates lineage per round
        )
        labels = merged.drop("__changed")
        if merged.filter("__changed").limit(1).count() == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"atomic_chunks_distributed did not converge in {max_iter} "
            "rounds — a component with diameter above max_iter would be "
            "silently under-merged (split-leakage risk). Raise max_iter; "
            "propagation needs one round per graph hop."
        )
    edges.unpersist()
    return labels.select(F.col("row_id").alias(id_col), F.col("label").alias("chunk_id"))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list → one row per
    member node: (node_id, component_id = min node id of component).

    Hybrid execution, sized by the EDGE list, not the corpus: dedup
    pair graphs are tiny relative to the data that produced them. The
    pair projection is persisted once and counted EXACTLY — the
    driver/distributed decision depends only on the true edge count
    (not a nondeterministic ``limit`` sample), and both paths reuse the
    persisted projection so the pair-mining pipeline runs once either
    way. At or under ``driver_threshold`` edges a ``collect()`` feeds a
    union-find on the driver; bigger graphs run iterative distributed
    min-label propagation over node→neighbor min-joins (O(component
    diameter) rounds, ONE materializing job per round — the
    convergence check scans the round's checkpointed output) — the
    same algorithm GraphFrames uses, no driver materialization.

    >>> pairs = spark.createDataFrame(
    ...     [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    >>> comp = {r["node_id"]: r["component_id"]
    ...         for r in connected_components(pairs).collect()}
    >>> comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    True
    >>> stats = {}
    >>> _ = connected_components(pairs, driver_threshold=0,
    ...                          stats=stats).collect()
    >>> stats["path"], stats["edges"], stats["rounds"] <= 3
    ('distributed', 3, True)
    """
    from pyspark.storagelevel import StorageLevel

    # materialize the (tiny) edge projection once: the exact count
    # decides the path, and every downstream action — driver collect
    # or per-round joins — reads this instead of re-running the
    # pair-mining pipeline that produced the edges (at sf0.1 that
    # re-mining was ~2.5s/round against milliseconds for the joins)
    pe = pairs.select(
        F.col(src).alias("__a"), F.col(dst).alias("__b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = pe.count()
    if stats is not None:  # observability for scale evidence (SCALING.md)
        stats["edges"] = n_edges
        stats["path"] = "driver" if n_edges <= driver_threshold else "distributed"
        stats["rounds"] = 0
    if n_edges <= driver_threshold:
        sample = pe.collect()
        pe.unpersist()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for row in sample:
            a, b = find(row[0]), find(row[1])
            if a != b:
                parent[max(a, b)] = min(a, b)
        nodes = sorted({v for row in sample for v in (row[0], row[1])})
        comp = [(n, find(n)) for n in nodes]
        return pairs.sparkSession.createDataFrame(
            comp, "node_id long, component_id long"
        )

    # size the propagation's partitioning to the measured edge count
    # (~500k edges/partition): per-round job overhead at tiny edge
    # counts is otherwise dominated by empty-task scheduling, while at
    # scale the cap keeps partitions executor-memory-sized
    spark = pairs.sparkSession
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_parts = max(1, min(default_parts, -(-n_edges // 500_000)))
    edges = (
        pe.select(F.col("__a").alias("node_id"), F.col("__b").alias("__nbr"))
        .unionByName(
            pe.select(F.col("__b").alias("node_id"), F.col("__a").alias("__nbr"))
        )
        .repartition(n_parts, "node_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    pe.unpersist()
    labels = (
        edges.select("node_id")
        .distinct()
        # co-partition with edges ONCE: every round's label join is
        # then exchange-free (see the push-form comment below)
        .repartition(n_parts, "node_id")
        .withColumn("label", F.col("node_id"))
    )
    for _ in range(max_iter):
        # PUSH form (round 11): the pull form joined edges to labels on
        # __nbr — a key neither frame is partitioned by — costing three
        # exchanges per round (re-hash both join legs + the groupBy).
        # The edge list is symmetric ((a,b) and (b,a) both present), so
        # "min over my neighbors' labels" == "min over labels pushed to
        # me along edges": join edges⋈labels on node_id (both already
        # hash(node_id, n_parts) → NO exchange), address each label to
        # the edge's other end, and aggregate — ONE exchange per round,
        # which the explicit repartition keys so the merged join below
        # is exchange-free too. Identical labels every round.
        nbr_min = (
            edges.join(labels, "node_id")
            .select(
                F.col("__nbr").alias("node_id"), F.col("label").alias("__l")
            )
            .repartition(n_parts, "node_id")
            .groupBy("node_id")
            .agg(F.min("__l").alias("__nl"))
        )
        # ONE materializing job per round: the eager localCheckpoint
        # runs the join+agg pipeline and pins its output; the
        # convergence probe then only scans the checkpointed
        # partitions instead of re-running the round's pipeline
        merged = (
            labels.join(nbr_min, "node_id", "left")
            .withColumn(
                "next",
                F.least(F.col("label"), F.coalesce(F.col("__nl"), F.col("label"))),
            )
            .withColumn("__changed", F.col("next") != F.col("label"))
            .select("node_id", F.col("next").alias("label"), "__changed")
            .localCheckpoint()
        )
        labels = merged.drop("__changed")
        if stats is not None:
            stats["rounds"] += 1
        if merged.filter("__changed").limit(1).count() == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "— long-chain components would be silently split into "
            "several clusters. Raise max_iter (one round per graph hop; "
            "near-dup clusters are normally diameter <= 6)."
        )
    edges.unpersist()
    return labels.select("node_id", F.col("label").alias("component_id"))
