"""Dump `.explain("formatted")` for named queries into plans/r12/.

Usage: [LOURS_REPO=<root>] python scripts/dump_r12_plans.py <suffix> <query ...>
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  LOURS_REPO: repo root whose lours_spark to import (so a base-commit
  worktree can produce the 'before' plans); plans always land in
  /root/repo/plans/r12.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.environ.get("LOURS_REPO", "/root/repo")
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join("/root/repo", "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    from lours_spark.session import get_spark
    from lours_spark.suite import ALL_QUERIES

    spark = get_spark("r12-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = ALL_QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_exchange = buf.getvalue().count("Exchange")
        print(f"{name}: {len(buf.getvalue())}B, ~{n_exchange} Exchange refs")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
