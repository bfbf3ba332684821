"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001 as the smoke
check; ``queries()`` / ``oracle_sql()`` expose every registered
operator for the driver's DuckDB hash-comparison at sf0.01.
The real registry lives in ``etl_jobs_spark.registry`` — operators
self-register on import, so this shim never goes stale.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_jobs_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Grouped pricing summary over the fact table (the engine's
    headline aggregate shape — partial+final hash agg, pushdown
    filter, 7-column pruned scan).
    """
    from etl_jobs_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver rows-only check)."""
    return registry.all_oracles()
