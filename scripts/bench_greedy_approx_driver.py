"""Third-decade driver-core benchmark for the approximate balanced
split: times `_approx_assignment_from_table` ALONE (the pure
numpy/pandas driver stage — no Spark) at 100k / 1M / 5M chunks, so the
"millions of chunks stay sub-minute on the driver" claim in
`greedy_assign_approx`'s docstring is measured, not asserted.

The input is the collected (chunk, bin, n) table exactly as
`chunk_histogram_table` would deliver it (chunk ids as int64, dim
values as pandas Categorical — the strings_to_categorical Arrow
shape), with ~60% bin occupancy over 64 bins, i.e. the same density
the sf0.1 corpus produces. Rows are pre-shuffled so the measurement
includes the sort=True factorize cost of the round-6
order-independence fix.

Usage: python scripts/bench_greedy_approx_driver.py [max_chunks]
Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _calm import rss_mb, wait_for_calm  # noqa: E402

import numpy as np
import pandas as pd

from lours_spark.split.balanced import _approx_assignment_from_table

SHARES = {"train": 0.7, "valid": 0.2, "eval": 0.1}
K_BINS = 64
OCCUPANCY = 0.6


def make_table(n_chunks: int, seed: int = 0) -> pd.DataFrame:
    """Sparse (chunk, bin, n) frame, ~OCCUPANCY x K_BINS rows/chunk,
    rows shuffled (a Spark collect has no stable order)."""
    rng = np.random.default_rng(seed)
    occupy = rng.random((n_chunks, K_BINS), dtype=np.float32) < OCCUPANCY
    chunk_idx, bin_idx = np.nonzero(occupy)
    counts = rng.integers(1, 40, size=chunk_idx.size)
    perm = rng.permutation(chunk_idx.size)
    return pd.DataFrame(
        {
            "chunk_id": chunk_idx[perm].astype(np.int64),
            "dim": pd.Categorical.from_codes(
                bin_idx[perm], categories=[f"bin{b:02d}" for b in range(K_BINS)]
            ),
            "n": counts[perm].astype(np.int64),
        }
    )


def share_error(out: pd.DataFrame, pdf: pd.DataFrame) -> float:
    # bincount on factorized codes, not groupby+merge: the check must
    # stay cheap next to the measured stage at 10⁸ table rows
    codes, uniq = pd.factorize(pdf["chunk_id"], sort=True)
    per_chunk = np.bincount(codes, weights=pdf["n"].to_numpy(np.float64))
    labels = out.set_index("chunk_id")["__assigned"].reindex(uniq).to_numpy()
    tot = float(per_chunk.sum())
    return max(
        abs(float(per_chunk[labels == s].sum()) / tot - t)
        for s, t in SHARES.items()
    )


def main() -> None:
    max_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    scales = [s for s in (100_000, 1_000_000, 5_000_000) if s <= max_chunks]
    results = []
    for n in scales:
        # calm-gate BEFORE generation too: a steal burst makes even the
        # synthetic-table numpy run 10-30x slow and eats the budget
        wait_for_calm()
        pdf = make_table(n)
        wait_for_calm()
        r0 = rss_mb()
        t0 = time.time()
        out = _approx_assignment_from_table(
            pdf, "chunk_id", ["dim"], SHARES, seed=3
        )
        wall = time.time() - t0
        results.append(
            {
                "chunks": n,
                "table_rows": int(len(pdf)),
                "assign_wall_sec": round(wall, 2),
                "rss_before_mb": round(r0, 1),
                "rss_after_mb": round(rss_mb(), 1),
                "max_share_error": round(share_error(out, pdf), 5),
            }
        )
        print(f"# {n:>9,} chunks: {wall:6.2f}s", file=sys.stderr)
        del pdf, out
    A = np.random.default_rng(0).random((2000, 2000))
    t0 = time.time()
    _ = A @ A
    print(
        json.dumps(
            {
                "bench": "greedy_assign_approx_driver_core",
                "k_bins": K_BINS,
                "occupancy": OCCUPANCY,
                "calibration": {
                    "numpy_matmul_2000_sec": round(time.time() - t0, 3)
                },
                "scales": results,
            }
        )
    )


if __name__ == "__main__":
    main()
