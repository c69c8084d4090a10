"""Driver contract for the spark-graft builder (PySpark target).

Backed by the uda_spark query registry: every entry pairs a DataFrame
formulation with a DuckDB oracle (uda_spark/registry.py); non-SQL-
expressible ops (approximate LSH search) register with oracle=None and get
the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uda_spark.registry import get_oracles, get_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return get_queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return get_oracles()
