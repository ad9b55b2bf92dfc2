"""Balanced split: distributed statistics + driver-side greedy assignment.

Re-expresses reference ``lours/dataset/split/``:

- per-chunk histograms over the balance dimensions (reference
  ``balanced_groups.py:286-317`` ``df_to_hist``) — computed DISTRIBUTED
  with one ``groupBy(chunk_id, *dims).count()``; only the tiny
  (chunks × bins) table is collected;
- histogram distances: KL divergence for categorical dims (reference
  ``balanced_groups.py:252-262``) and 1D Earth-Mover distance for
  binned continuous dims (``:264-272``; exact closed form for 1D — the
  reference's POT dependency is only needed for multi-dim ground
  metrics, which it never uses);
- share distance = 1 − IoU of split-size histograms (``:320-344``);
- greedy chunk assignment minimizing ``hist_cost_weight · Σdist +
  share_cost_weight · share_dist`` (reference ``get_winner``
  ``dataset_splitter.py:21-129``) — a sequential driver loop by
  design (each decision depends on all previous ones).

The driver loop touches only chunk-level histograms: at 100 TB with
10⁶ chunks × 100 bins this is ~100 MB of driver state — acceptable; the
heavy data never leaves the executors.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_histograms(
    df: DataFrame, chunk_col: str, dims: list[str]
) -> dict[int, dict[tuple, int]]:
    """Distributed per-chunk histogram over the balance dims; collects
    the sparse (chunk, bin) → count table."""
    rows = (
        df.groupBy(chunk_col, *dims)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out: dict[int, dict[tuple, int]] = defaultdict(dict)
    for r in rows:
        out[r[chunk_col]][tuple(r[d] for d in dims)] = r["n"]
    return dict(out)


def kl_divergence(p: dict, q: dict, eps: float = 1e-12) -> float:
    """KL(p ‖ q) over sparse histograms (normalized, eps-smoothed)."""
    keys = set(p) | set(q)
    sp = sum(p.values()) or 1.0
    sq = sum(q.values()) or 1.0
    kl = 0.0
    for k in keys:
        pk = p.get(k, 0) / sp + eps
        qk = q.get(k, 0) / sq + eps
        kl += pk * math.log(pk / qk)
    return kl


def emd_1d(p: dict, q: dict) -> float:
    """Exact 1D earth-mover distance between normalized histograms whose
    keys are orderable bin labels: cumulative-difference sum."""
    keys = sorted(set(p) | set(q), key=lambda x: (x is None, x))
    sp = sum(p.values()) or 1.0
    sq = sum(q.values()) or 1.0
    cum = 0.0
    total = 0.0
    for k in keys:
        cum += p.get(k, 0) / sp - q.get(k, 0) / sq
        total += abs(cum)
    return total


def share_distance(sizes: dict[str, float], targets: dict[str, float]) -> float:
    """1 − IoU of the normalized share histograms (reference
    ``balanced_groups.py:320-344``)."""
    s = sum(sizes.values()) or 1.0
    inter = sum(min(sizes.get(k, 0) / s, targets.get(k, 0)) for k in targets)
    union = sum(max(sizes.get(k, 0) / s, targets.get(k, 0)) for k in targets)
    return 1.0 - (inter / union if union else 0.0)


def greedy_assign(
    hists: dict[int, dict[tuple, int]],
    target_shares: dict[str, float],
    seed: int = 0,
    hist_cost_weight: float = 1.0,
    share_cost_weight: float = 1.0,
    preassigned: dict[int, str] | None = None,
) -> dict[int, str]:
    """Sequential greedy chunk→split assignment minimizing combined
    histogram-KL + share cost (reference ``dataset_splitter.py:299-580``).
    Deterministic for a given seed."""
    splits = list(target_shares)
    global_hist: dict[tuple, float] = defaultdict(float)
    for h in hists.values():
        for k, v in h.items():
            global_hist[k] += v

    split_hist: dict[str, dict] = {s: defaultdict(float) for s in splits}
    split_size: dict[str, float] = {s: 0.0 for s in splits}
    assignment: dict[int, str] = {}

    chunk_ids = sorted(hists)
    rng = random.Random(seed)
    rng.shuffle(chunk_ids)

    for cid in chunk_ids:
        h = hists[cid]
        if preassigned and cid in preassigned:
            winner = preassigned[cid]
        else:
            best_cost, winner = None, splits[0]
            for s in splits:
                # size-weighted total divergence: Σ_s (n_s/N)·KL_s after
                # the trial assignment (the reference combines per-split
                # distances the same way, dataset_splitter.py:111-118) —
                # weighting by size keeps near-empty splits from looking
                # artificially bad (their point-mass KL is huge but
                # carries almost no rows)
                trial_total = 0.0
                n_total = sum(split_size.values()) + sum(h.values())
                for s2 in splits:
                    hist2 = split_hist[s2]
                    if s2 == s:
                        hist2 = dict(hist2)
                        for k, v in h.items():
                            hist2[k] = hist2.get(k, 0) + v
                    n2 = sum(hist2.values())
                    if n2 and n_total:
                        trial_total += (n2 / n_total) * kl_divergence(
                            hist2, global_hist
                        )
                trial_sizes = dict(split_size)
                trial_sizes[s] += sum(h.values())
                sh_cost = share_distance(trial_sizes, target_shares)
                cost = (
                    hist_cost_weight * trial_total + share_cost_weight * sh_cost
                )
                if best_cost is None or cost < best_cost:
                    best_cost, winner = cost, s
        for k, v in h.items():
            split_hist[winner][k] += v
        split_size[winner] += sum(h.values())
        assignment[cid] = winner

    # local-improvement polish: greedy is order-sensitive, so early
    # assignments can leave residual imbalance; a couple of move passes
    # (still O(chunks · splits) driver work on tiny histograms) settle it
    def total_cost() -> float:
        n_total = sum(split_size.values())
        hist_cost = sum(
            (sum(split_hist[s].values()) / n_total)
            * kl_divergence(split_hist[s], global_hist)
            for s in splits
            if split_hist[s]
        )
        return (
            hist_cost_weight * hist_cost
            + share_cost_weight * share_distance(split_size, target_shares)
        )

    for _ in range(2):
        moved = False
        for cid in sorted(assignment):
            if preassigned and cid in preassigned:
                continue
            h = hists[cid]
            current = assignment[cid]
            best_cost, best_split = total_cost(), current
            for s in splits:
                if s == current:
                    continue
                for k, v in h.items():
                    split_hist[current][k] -= v
                    split_hist[s][k] = split_hist[s].get(k, 0) + v
                split_size[current] -= sum(h.values())
                split_size[s] += sum(h.values())
                cost = total_cost()
                if cost < best_cost - 1e-12:
                    best_cost, best_split = cost, s
                # revert trial
                for k, v in h.items():
                    split_hist[s][k] -= v
                    split_hist[current][k] += v
                split_size[s] -= sum(h.values())
                split_size[current] += sum(h.values())
            if best_split != current:
                for k, v in h.items():
                    split_hist[current][k] -= v
                    split_hist[best_split][k] = (
                        split_hist[best_split].get(k, 0) + v
                    )
                split_size[current] -= sum(h.values())
                split_size[best_split] += sum(h.values())
                assignment[cid] = best_split
                moved = True
        if not moved:
            break

    # swap polish: moves can't fix histogram skew without breaking the
    # share balance, but exchanging two similar-size chunks between
    # splits can. First-improvement search, capped so driver time stays
    # O(passes · chunks · candidates).
    def _apply(cid, frm, to):
        h = hists[cid]
        for k, v in h.items():
            split_hist[frm][k] -= v
            split_hist[to][k] = split_hist[to].get(k, 0) + v
        split_size[frm] -= sum(h.values())
        split_size[to] += sum(h.values())
        assignment[cid] = to

    movable = [
        c for c in sorted(assignment) if not (preassigned and c in preassigned)
    ]
    # bounded candidate scan: the full pairwise search is O(n²) and only
    # affordable for coarse few-chunk regimes (where single swaps matter
    # most); larger chunk counts use a deterministic strided sample per
    # chunk so polish stays O(n · cap)
    cap = len(movable) if len(movable) <= 256 else 32
    for _ in range(2):
        improved = False
        base = total_cost()
        for idx, ca in enumerate(movable):
            sa = assignment[ca]
            stride = max(1, len(movable) // cap)
            candidates = movable[(idx + 1) % stride :: stride][:cap]
            for cb in candidates:
                sb = assignment[cb]
                if sb == sa or cb == ca:
                    continue
                _apply(ca, sa, sb)
                _apply(cb, sb, sa)
                cost = total_cost()
                if cost < base - 1e-12:
                    base = cost
                    sa = assignment[ca]
                    improved = True
                else:
                    _apply(cb, sa, sb)
                    _apply(ca, sb, sa)
        if not improved:
            break
    return assignment


def balanced_split(
    df: DataFrame,
    shares: dict[str, float],
    dims: list[str],
    keep_separate: list[str] | None = None,
    id_col: str = "id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """End-to-end balanced split (reference ``Dataset.split``,
    ``dataset.py:4384-4681``): atomic chunks → distributed histograms →
    driver greedy → broadcast-join the assignment back."""
    from lours_spark.split.chunks import atomic_chunks_driver

    if keep_separate:
        chunks = atomic_chunks_driver(df, id_col, keep_separate)
        with_chunks = df.join(chunks, id_col)
    else:
        with_chunks = df.withColumn("chunk_id", F.col(id_col))
    hists = chunk_histograms(with_chunks, "chunk_id", dims)
    assignment = greedy_assign(hists, shares, seed=seed)
    spark = df.sparkSession
    adf = F.broadcast(
        spark.createDataFrame(
            list(assignment.items()), "chunk_id long, __assigned string"
        )
    )
    return (
        with_chunks.join(adf, "chunk_id", "left")
        .withColumn(out_col, F.col("__assigned"))
        .drop("__assigned", "chunk_id")
    )
