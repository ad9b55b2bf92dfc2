"""Sequence packing for LLM-pretraining data pipelines.

Two standard packing disciplines over a documents table:

- :func:`pack_chunked` — GPT-style "concatenate then chunk": documents
  are laid end-to-end in a deterministic order inside each shard and
  the resulting token stream is cut into fixed-size context windows.
  Documents may straddle window boundaries; every window except a
  shard's last is exactly full. Closed-form (an exclusive window cumsum
  plus a pack-range explode), hence fully SQL-expressible and
  hash-exact against the DuckDB oracle.
- :func:`pack_greedy` — whole-document bin packing (no document ever
  splits): per-shard first-fit-decreasing, the standard
  fill-heuristic when truncation is not acceptable. Sequential by
  nature inside a shard (each placement depends on all previous), so
  it runs as an Arrow-batched ``applyInPandas`` per shard — the
  100 TB shape is many shards packed independently in parallel, never
  a global driver loop.

Scale notes (100 TB): both operators shuffle ONCE on ``shard_col``.
There is deliberately no unsharded global mode — a single global
document order would force every row through one window partition
(Spark collapses an unpartitioned window into one task). Pretraining
corpora are naturally sharded (source, dump, crawl segment); pack ids
are therefore (shard, pack_seq) pairs, unique without cross-shard
coordination. Skewed shards parallelize like any other skewed key:
pre-salt the shard column upstream if one source dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_chunked(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str = "source",
    token_col: str | Column | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: inside each shard, documents ordered
    by ``order_col`` (default: ``id_col``) form one token stream that
    is cut every ``budget`` tokens. Returns one row per (document,
    window it overlaps): ``shard, doc_id, n_tok, pack_seq, tok_from,
    tok_to`` where ``[tok_from, tok_to)`` is the document-relative
    token slice landing in window ``pack_seq`` (0-based per shard).

    Zero-token documents are dropped (they occupy no stream position).
    Every window except each shard's last contains exactly ``budget``
    tokens — asserted in tests/test_packing.py.

    >>> df = spark.createDataFrame(
    ...     [(1, "s", 3), (2, "s", 5), (3, "s", 2)],
    ...     "doc_id long, source string, n long")
    >>> out = pack_chunked(df, budget=4, token_col="n")
    >>> [(r["doc_id"], r["pack_seq"], r["tok_from"], r["tok_to"])
    ...  for r in out.orderBy("doc_id", "pack_seq").collect()]
    [(1, 0, 0, 3), (2, 0, 0, 1), (2, 1, 1, 5), (3, 2, 0, 2)]
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from lours_spark.functions.text import resolve_token_col

    n_tok = resolve_token_col(token_col)

    # explicit ROWS frame + doc_id tie-break: the default window frame
    # is RANGE, under which TIED order values share one cumulative sum
    # — overlapping token slices and over-full packs. The tie-break
    # also keeps the layout total-ordered (deterministic) for any
    # order_col; the order column is aliased so it can never collide
    # with an output name (e.g. order_col == id_col).
    w = (
        Window.partitionBy("shard")
        .orderBy("__ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        df.select(
            F.col(shard_col).alias("shard"),
            F.col(id_col).alias("doc_id"),
            n_tok.alias("n_tok"),
            F.col(order_col if order_col else id_col).alias("__ord"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("__end", F.sum("n_tok").over(w))
        .withColumn("__start", F.col("__end") - F.col("n_tok"))
    )
    b = F.lit(int(budget))
    # integral DIV keeps the arithmetic exact at any stream length
    # (float floor-division would wobble past 2^53 tokens)
    packs = base.select(
        "shard",
        "doc_id",
        "n_tok",
        "__start",
        "__end",
        F.explode(
            F.sequence(
                F.expr(f"__start DIV {int(budget)}"),
                F.expr(f"(__end - 1) DIV {int(budget)}"),
            )
        ).alias("pack_seq"),
    )
    return packs.select(
        "shard",
        "doc_id",
        "n_tok",
        "pack_seq",
        (F.greatest(F.col("pack_seq") * b, F.col("__start")) - F.col("__start"))
        .cast("long")
        .alias("tok_from"),
        (F.least((F.col("pack_seq") + 1) * b, F.col("__end")) - F.col("__start"))
        .cast("long")
        .alias("tok_to"),
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str = "source",
    token_col: str | Column | None = None,
    max_open_packs: int = 256,
) -> DataFrame:
    """Whole-document first-fit-decreasing packing per shard: documents
    sorted by (descending token count, ascending id — deterministic)
    drop into the first open pack with room; a document larger than
    ``budget`` gets a pack of its own, flagged ``oversize``. Returns
    ``shard, doc_id, n_tok, pack_seq, oversize``; no document splits
    and no pack exceeds ``budget`` unless it is a single oversize
    document (asserted in tests/test_packing.py).

    The per-shard loop is the sequential heart of FFD (every placement
    depends on all previous ones) and runs inside one Arrow batch per
    shard; shards pack independently and in parallel. Zero-token
    documents are dropped, mirroring :func:`pack_chunked`.
    ``max_open_packs`` bounds the open-pack scan (and memory) per
    shard: past it the fullest open pack closes, trading a little fill
    quality for linear wall time — exact FFD until the bound is hit.
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from lours_spark.functions.text import resolve_token_col

    n_tok = resolve_token_col(token_col)

    base = df.select(
        # stringly-typed shard keeps the applyInPandas schema static
        # across caller shard dtypes
        F.col(shard_col).cast("string").alias("shard"),
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    cap = int(budget)

    max_open = int(max_open_packs)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # first-fit over OPEN packs only, O(docs × min(open, max_open))
        # per shard: oversize docs are a sorted prefix and never open a
        # scannable pack (the naive append-a-full-pack form made a
        # small-budget corpus O(docs²) — measured 44s/500k docs, now
        # linear), exactly-full packs leave the scan list via an
        # ORDER-PRESERVING pop (a swap-remove would permute the
        # first-fit scan order and diverge from canonical FFD), and
        # past ``max_open_packs`` the fullest open pack closes
        # (bounded memory/scan; only then does the packing deviate
        # from exact first-fit-decreasing). The pops shift at most
        # max_open elements — negligible. Deterministic throughout.
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        sizes = pdf["n_tok"].to_numpy()
        n_over = int((sizes > cap).sum())  # sorted desc -> prefix
        seq = list(range(n_over))  # one singleton pack per oversize doc
        next_id = n_over
        room: list[int] = []  # remaining tokens per OPEN pack
        rid: list[int] = []  # its pack id
        for s in sizes[n_over:]:
            s = int(s)
            for j in range(len(room)):  # first fit
                if room[j] >= s:
                    room[j] -= s
                    seq.append(rid[j])
                    if room[j] == 0:  # dead: sizes are >= 1
                        room.pop(j)
                        rid.pop(j)
                    break
            else:
                seq.append(next_id)
                r = cap - s
                if r > 0:  # exact-cap docs never enter the scan list
                    room.append(r)
                    rid.append(next_id)
                    if len(room) > max_open:
                        k = min(range(len(room)), key=room.__getitem__)
                        room.pop(k)
                        rid.pop(k)
                next_id += 1
        out = pdf[["shard", "doc_id", "n_tok"]].copy()
        out["pack_seq"] = pd.array(seq, dtype="int64")
        out["oversize"] = out["n_tok"] > cap
        return out

    # id dtype comes from the input (string/long/... corpora all work)
    id_type = base.schema["doc_id"].dataType.simpleString()
    return base.groupBy("shard").applyInPandas(
        ffd,
        f"shard string, doc_id {id_type}, n_tok long, "
        "pack_seq long, oversize boolean",
    )
