"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2
(and the training-data-pipeline extensions), each exercising the real
``lours_spark`` library code.
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness
gate; greedy matching and the detection PR/AP pipeline are replicated
VALUE-EXACTLY via a recursive-CTE oracle, so only the seeded balanced
split (python-Random shuffle) is intentionally absent → rows-only.

The gate registry is CONSOLIDATED to exactly 50 queries (the driver
gates a 50-query prefix): closely-related operator facets are merged
into combined gate queries via NULL-padded facet unions or same-grain
joins, each facet keeping its own logic and oracle leg.
``lours_spark.suite.GATE_FACETS`` maps combined name → original facet
names; ``lours_spark.suite.ALL_QUERIES`` (106 entries) keeps every
standalone query for bench.py / scripts / tests.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make imports robust to
# the harness's working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q3-shaped
    join+agg+top-k through the engine."""
    from lours_spark.suite import q_shipping_priority

    return q_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lours_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lours_spark.suite import oracles

    return oracles()
