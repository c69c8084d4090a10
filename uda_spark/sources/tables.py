"""Parquet table catalog for the test-data layout (TESTDATA.md).

The reference's source operator is the MOF partitioned scan (SURVEY §2.1
O1: offset/length AIO reads of raw map-output files).  Spark's source layer
subsumes it: ``spark.read.parquet`` gives partitioned, column-pruned,
predicate-pushed scans.  This module is just the catalog: table names →
paths → DataFrames, shared by the query registry, tests, and bench.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The events table stores nanosecond timestamps, which Spark refuses by
    # default (PARQUET_TYPE_ILLEGAL).  Read them as BIGINT nanos; the query
    # layer normalizes to exact integer microseconds (queries/events.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
