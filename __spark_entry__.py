"""Driver contract for the spark-graft builder (PySpark target).

Backed by the uda_spark query registry: every entry pairs a DataFrame
formulation with a DuckDB oracle (uda_spark/registry.py).  ALL registered
queries carry oracles — including the LSH/IVF "approximate" ops, whose
deterministic md5 hyperplanes are embedded in the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uda_spark.registry import get_oracles, get_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end training-data pipeline (quality filter →
    exact dedup → MinHash near-dup removal → deterministic sample →
    corpus stats) on /root/testdata/sf0.001."""
    return get_queries()["pipeline_training_data"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return get_oracles()
