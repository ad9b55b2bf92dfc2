"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k per query — the correctness
  baseline. One broadcast of the (small) query set against the corpus,
  window row_number per query for the top-k cut.
- ``lsh_bucket_topk``: random-hyperplane LSH variant — corpus and
  queries are bucketed by sign-pattern so each query only scans its
  bucket (and optionally neighboring buckets). At 1000 executors this
  turns an O(n·q) scan into O(n·q / 2^planes) with no all-to-all
  shuffle; recall is tunable via ``num_planes`` / multi-probe.
- ``knn_label``: majority-label classification from the top-k result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lours_spark.functions import vectors as V


#: Fail-loud cap for the query-collecting kernels (``method="local"``
#: / ``"blas"``): they materialize the whole query frame on the driver
#: and re-broadcast it to every task, so a corpus-sized query frame is
#: a mis-shaped call — at 100k rows × 1k dims the matrix is ~0.8 GB,
#: about the largest broadcast worth shipping. Larger query sets should
#: pass ``broadcast_queries=False`` (distributed scoring, no collect).
MAX_COLLECTED_QUERIES = 100_000


# corpus-side widen before the interpreted centroid-assignment /
# bucket-sign folds and the exact-cosine verify (the query side is
# broadcast, so all that CPU runs on the corpus scan's partitions).
# The ONE widen policy lives in operators._widen (r12 consolidation).
from lours_spark.operators._widen import widen as _widen  # noqa: E402


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    method: str = "local",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    >>> corpus = spark.createDataFrame(
    ...     [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
    ...     "vec_id long, embedding array<double>")
    >>> queries = corpus.filter("vec_id = 1")
    >>> rows = brute_force_topk(corpus, queries, k=2).collect()
    >>> [(r["neighbor_id"], r["rank"]) for r in
    ...  sorted(rows, key=lambda r: r["rank"])]
    [(3, 1), (2, 2)]

    ``method="local"`` (default): the 100 TB shape WITH oracle bit
    parity. The raw query matrix broadcasts once; each corpus
    partition scores its rows against every query with the same
    strict left-to-right ``np.add.accumulate`` reduction as the HOF /
    DuckDB ``list_reduce`` form (bit-identical — see
    :func:`lours_spark.functions.vectors.cosine_similarity_arrow`)
    and emits only its LOCAL top-k rows per query under the final
    (cosine desc, neighbor asc) order. The union of per-partition
    top-k contains the global top-k, and the cut is pure row
    SELECTION — every surviving double is the value the oracle
    computes — so the exchange carries ≤ Q·k·partitions rows and the
    final global window merely reorders survivors.

    ``method="expression"``: the declarative baseline the local path
    is verified against — query side broadcast, scoring via the
    Arrow cosine column, per-query top-k as a window over (query_id).
    Every (query, candidate, score) triple crosses the exchange —
    fine at test scale, wasteful at corpus scale.

    ``method="blas"``: normalized-matrix BLAS product per partition,
    same local-top-k exchange bound. Fastest on very wide embeddings,
    but the BLAS pairwise summation differs from the oracle's
    sequential reduction at ~1e-15, so ties can order differently —
    use when bit-parity with a sequential engine is not required.

    ``broadcast_queries`` (default True) assumes the usual ANN shape:
    queries ≪ corpus. The local/blas kernels COLLECT the query frame
    to the driver and re-broadcast it (fail-loud past
    :data:`MAX_COLLECTED_QUERIES` rows — same guard shape as
    ``ivf_topk``'s flag); with ``broadcast_queries=False`` both
    methods fall back to the fully-distributed expression path with a
    non-broadcast join, so a corpus-sized query frame never
    materializes on one machine (degrades to a shuffled cross product
    — inherent to exact all-pairs brute force at that shape).
    """
    if method == "blas" and broadcast_queries:
        return _brute_force_topk_blas(corpus, queries, id_col, vec_col, k)
    if method == "local" and broadcast_queries:
        return _brute_force_topk_local(corpus, queries, id_col, vec_col, k)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", V.cosine_similarity_arrow()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-collect the query frame for the local/blas kernels, with
    the :data:`MAX_COLLECTED_QUERIES` fail-loud guard (a LIMIT-probe:
    the over-cap case never materializes more than cap+1 rows)."""
    qrows = (
        queries.select(id_col, vec_col)
        .limit(MAX_COLLECTED_QUERIES + 1)
        .collect()
    )
    if len(qrows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            "brute_force_topk(method='local'/'blas') collects the query "
            f"frame to the driver; > {MAX_COLLECTED_QUERIES} query rows "
            "found — pass broadcast_queries=False for the distributed "
            "path, or pre-filter the query frame"
        )
    return qrows


def _brute_force_topk_local(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Per-partition sequential-accumulate scoring + local top-k cut
    (see :func:`brute_force_topk` ``method="local"``).

    The kernel is the batch form of ``cosine_similarity_arrow``:
    ``dot = accumulate(A*B)[-1]``, ``cos = dot / (|A|·|B|)`` with the
    same zero-norm→0.0 rule, looped per query so each pair's reduction
    order is exactly the oracle's. Only selection happens after
    scoring, so bit-parity survives the cut.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    def _seq_cos(va, qj, nqj):
        if len(va) == 0:
            return 0.0
        d = np.add.accumulate(va * qj[: len(va)])[-1] if len(va) == len(qj) else 0.0
        na = np.sqrt(np.add.accumulate(va * va)[-1])
        n = na * nqj
        return float(d / n) if n > 0 else 0.0

    qrows = _collect_queries(queries, id_col, vec_col)
    qids = np.array([r[id_col] for r in qrows])
    QM = np.stack([np.asarray(r[vec_col], dtype="float64") for r in qrows])
    # query norms via the same sequential scan as the row kernel
    qn = (
        np.sqrt(np.add.accumulate(QM * QM, axis=1)[:, -1])
        if QM.shape[1]
        else np.zeros(len(qrows))
    )
    bc = corpus.sparkSession.sparkContext.broadcast((qids, QM, qn))
    kk = int(k)

    def score_and_cut(batches):
        ids_q, Q, nq = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            nids = batch[id_col].to_numpy()
            try:
                M = np.stack(batch[vec_col].to_numpy()).astype("float64")
            except (ValueError, TypeError):
                # ragged lengths or nulls: row-wise, same sequential math
                M = None
                rows = [
                    None if v is None else np.asarray(v, dtype="float64")
                    for v in batch[vec_col]
                ]
            if M is not None and M.shape[1]:
                nm = np.sqrt(np.add.accumulate(M * M, axis=1)[:, -1])
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids_q)):
                if M is None:
                    # null vectors are not candidates (expression path
                    # scores them NULL, which desc-sorts last anyway)
                    col = np.array(
                        [
                            -np.inf if v is None else _seq_cos(v, Q[j], nq[j])
                            for v in rows
                        ]
                    )
                elif M.shape[1] == 0:
                    col = np.zeros(len(nids))  # zero-norm pairs score 0.0
                else:
                    dot = np.add.accumulate(M * Q[j][None, :], axis=1)[:, -1]
                    d = nm * nq[j]
                    col = np.where(d > 0, dot / np.where(d > 0, d, 1.0), 0.0)
                col[nids == ids_q[j]] = -np.inf  # self-match excluded
                take = min(kk, len(col))
                top = np.argpartition(-col, take - 1)[:take]
                top = top[np.lexsort((nids[top], -col[top]))]
                keep = col[top] != -np.inf
                top = top[keep]
                out_q.extend([ids_q[j]] * len(top))
                out_n.extend(nids[top].tolist())
                out_c.extend(col[top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    local = corpus.select(id_col, vec_col).mapInPandas(score_and_cut, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _brute_force_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Per-partition BLAS scoring + local top-k (see
    :func:`brute_force_topk` ``method="blas"``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = _collect_queries(queries, id_col, vec_col)
    qids = np.array([r[id_col] for r in qrows])
    QM = np.stack([np.asarray(r[vec_col], dtype="float64") for r in qrows])
    qn = np.linalg.norm(QM, axis=1)
    qn[qn == 0] = 1.0
    bc = corpus.sparkSession.sparkContext.broadcast((qids, QM / qn[:, None]))
    kk = int(k)

    def score(batches):
        ids_q, QU = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            M = np.stack(batch[vec_col].to_numpy()).astype("float64")
            nn = np.linalg.norm(M, axis=1)
            nn[nn == 0] = 1.0
            S = (M / nn[:, None]) @ QU.T  # (batch, Q)
            nids = batch[id_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids_q)):
                col = S[:, j].copy()
                col[nids == ids_q[j]] = -np.inf  # self-match excluded
                take = min(kk, len(col))
                top = np.argpartition(-col, take - 1)[:take]
                # deterministic local order: cosine desc, neighbor asc
                top = top[np.lexsort((nids[top], -col[top]))]
                out_q.extend([ids_q[j]] * len(top))
                out_n.extend(nids[top].tolist())
                out_c.extend(col[top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    local = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .filter(F.col("cosine") != float("-inf"))
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a seeded
    LCG (no numpy on the executors; reproducible across engines)."""
    vals = []
    state = (plane * 2654435761 + 1013904223) % (2**32)
    for _ in range(dim):
        state = (state * 1664525 + 1013904223) % (2**32)
        vals.append(state / 2**31 - 1.0)
    return vals


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    dim: int | None = None,
    num_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign bucketing, then exact
    cosine within the bucket. Recall < 1 by design; increase
    ``num_planes`` for smaller buckets, or raise ``num_probes`` for
    higher recall at the same bucket size.

    ``num_probes``: how many buckets each query scans — 1 probes only
    the query's own bucket; ``1 + num_planes`` adds every
    Hamming-distance-1 bucket (one sign bit flipped). A near neighbor
    lands in a different bucket exactly when some hyperplane separates
    the pair, and for a close pair more than one separating plane is
    unlikely — so 1-bit probing recovers most of the loss without
    shrinking ``num_planes`` (bigger buckets) or replicating the
    corpus into extra tables. The probe fan-out lives on the
    BROADCAST query side (corpus rows still carry one bucket each), so
    extra probes cost broadcast-map lookups, not corpus replication —
    the 100 TB-side cost model is unchanged.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    num_probes = max(1, min(int(num_probes), 1 + num_planes))

    def bucket_expr(vec):
        acc = F.lit(0)
        for p in range(num_planes):
            plane = _hyperplane(dim, p)
            d = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in plane]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            acc = acc + F.when(d >= 0, F.lit(2**p)).otherwise(F.lit(0))
        return acc

    c = _widen(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        bucket_expr(F.col(vec_col)).alias("__b0"),
    )
    # multi-probe: own bucket + (num_probes − 1) single-bit flips,
    # exploded on the tiny query side. A corpus row sits in exactly one
    # bucket and the probed set is distinct, so no (query, neighbor)
    # pair can duplicate.
    probes = F.array(
        F.col("__b0"),
        *[
            F.col("__b0").bitwiseXOR(F.lit(2**p))
            for p in range(num_probes - 1)
        ],
    )
    q = q.select(
        "query_id", "__qv", F.explode(probes).alias("bucket")
    )
    # queries ≪ corpus in any real ANN lookup: broadcast the query
    # side so the corpus is scanned in place — no shuffle on the
    # low-cardinality (2^num_planes values, skewed) bucket key
    scored = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", V.cosine_similarity_arrow()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _l2sq_expr(a, b):
    """Squared L2 distance as a sequential left fold — the SAME element
    order and arithmetic as DuckDB's ``list_reduce`` twin, so centroid
    argmin decisions agree bit-for-bit across engines."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int | None = None,
    num_probes: int = 3,
    seed: int = 42,
    centroids: "list[list[float]] | None" = None,
    use_arrow_cosine: bool = True,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: MLlib k-means partitions the corpus
    into inverted lists; each query scans only its ``num_probes``
    nearest centroids' lists.

    Scale shape: centroid training samples the corpus (MLlib handles
    this distributed); assignment is one narrow projection; the search
    join is per-(query, probed-centroid) — at 1000 executors the join
    fans out by centroid id so no task sees the whole corpus. Recall
    rises with ``num_probes`` (→ exact at num_probes = num_centroids).
    ``num_centroids=None`` (default) auto-sizes to ~√n from one
    ``count()`` so per-probe candidate volume stays ~n/√n as the
    corpus grows; pass it explicitly to skip the count.

    ``centroids``: fixed coarse centers instead of k-means training —
    the deterministic, oracle-expressible mode (assignment and probe
    selection become pure literal-array expressions; ties break toward
    the lower centroid index). ``use_arrow_cosine=False`` swaps the
    vectorized numpy cosine for the sequential-fold column expression
    whose summation order matches the DuckDB oracle exactly.

    ``broadcast_queries`` (default True) assumes the usual ANN shape:
    queries ≪ corpus. The broadcast side is the exploded
    (|queries| × num_probes) probe frame INCLUDING the full embedding
    vectors, so a query frame of millions of wide vectors can exceed
    driver/executor memory — pass ``broadcast_queries=False`` there to
    fall back to a shuffle join on ``__centroid`` (degrades gracefully;
    the centroid key has only ``num_centroids`` values, so expect
    skewed reducers — AQE skew-join splitting mitigates).
    """
    if centroids is not None:
        C = len(centroids)
        cent_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )

        def ranked_pairs(vec):
            dists = F.transform(cent_arr, lambda cv: _l2sq_expr(vec, cv))
            return F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(C - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )

        assigned = _widen(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.array_min(ranked_pairs(F.col(vec_col)))
            .getField("i")
            .alias("__centroid"),
        )
        probe_structs = F.slice(
            F.sort_array(ranked_pairs(F.col(vec_col))), 1, num_probes
        )
        q_probes = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode(
                F.transform(probe_structs, lambda s: s.getField("i"))
            ).alias("__centroid"),
        )
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        if num_centroids is None:
            # √n lists bound per-probe candidate volume (~probes·n/√n
            # rows per query) — same auto-rule as the IVF near-dup path;
            # a fixed default is a scale cliff (16 lists at corpus scale
            # = n/16 candidates per probe). One count() is the price;
            # pass num_centroids explicitly to skip it.
            n = corpus.count()
            num_centroids = max(16, min(4096, int(n ** 0.5)))
        corpus_v = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            array_to_vector(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("__features"),
        )
        km = KMeans(
            k=num_centroids, seed=seed, featuresCol="__features",
            predictionCol="__centroid",
        )
        model = km.fit(corpus_v)
        assigned = model.transform(corpus_v).select(
            "neighbor_id", "__cv", "__centroid"
        )

        centers = model.clusterCenters()
        center_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centers)]
        centers_df = F.broadcast(
            corpus.sparkSession.createDataFrame(
                center_rows, "centroid int, cvec array<double>"
            )
        )
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        # nearest num_probes centroids per query (small cross join: |q|×C)
        q_probes = (
            q.crossJoin(centers_df)
            .withColumn(
                "__dist", V.l2_distance(F.col("__qv"), F.col("cvec"))
            )
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.asc("__dist"), F.asc("centroid")
                    )
                ),
            )
            .filter(F.col("__rk") <= num_probes)
            .select("query_id", "__qv", F.col("centroid").alias("__centroid"))
        )
    cosine = (
        V.cosine_similarity_arrow()(F.col("__qv"), F.col("__cv"))
        if use_arrow_cosine
        else V.cosine_similarity(F.col("__qv"), F.col("__cv"))
    )
    # queries ≪ corpus in any real ANN lookup: broadcast the probe
    # frame so the corpus (inverted lists) is scanned in place — the
    # centroid key has only num_centroids values, so a shuffle join
    # here would funnel the whole corpus through a handful of skewed
    # reducer keys (same shape as lsh_bucket_topk's bucket join).
    # broadcast_queries=False opts out when the query frame itself is
    # too large to materialize on every executor (see docstring).
    probe_side = F.broadcast(q_probes) if broadcast_queries else q_probes
    scored = (
        probe_side.join(assigned, "__centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_label(
    topk: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Majority label among each query's neighbors (ties → smaller
    label). Input is a ``brute_force_topk``-shaped frame."""
    lab = labels.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lab")
    )
    counted = (
        topk.join(lab, "neighbor_id")
        .groupBy("query_id", "__lab")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("__lab"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("__lab").alias("predicted_label"), "votes")
    )
