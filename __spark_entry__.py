"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``quarkus_etl_spark``; this file only adapts the
registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable even when this file is loaded by path from a
# different working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from quarkus_etl_spark.queries import all_oracles, all_query_callables  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape, SURVEY.md §2
    q_agg_groupby) on sf0.001; driver checks rows>0."""
    from quarkus_etl_spark.queries.relational import q_agg_groupby

    return q_agg_groupby(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_query_callables()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys without an oracle get the
    driver's weaker rows-only check (approximate/stateful ops)."""
    return all_oracles()
