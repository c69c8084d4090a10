"""Parquet table catalog for the test-data layout (TESTDATA.md).

The reference's source operator is the MOF partitioned scan (SURVEY §2.1
O1: offset/length AIO reads of raw map-output files).  Spark's source layer
subsumes it: ``spark.read.parquet`` gives partitioned, column-pruned,
predicate-pushed scans.  This module is just the catalog: table names →
paths → DataFrames, shared by the query registry, tests, and bench.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
    # Compatibility shim: if the events parquet stores *nanosecond*
    # timestamps (one historical layout of the test data), Spark refuses
    # them by default (PARQUET_TYPE_ILLEGAL); this conf reads them as
    # BIGINT nanos instead.  It is a no-op for micro/millisecond layouts.
    # Either way the query layer normalizes via ``event_micros`` below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, name))


def event_micros(df: DataFrame, col: str = "ts") -> Column:
    """Exact BIGINT epoch-microseconds for an event-time column, whatever
    physical type the parquet stored.

    The test data's events table has shipped as both int64 *nanoseconds*
    (read as BIGINT via nanosAsLong) and parquet ``timestamp[us]`` (read as
    TIMESTAMP_NTZ); queries must not care.  This sniffs the bound schema and
    emits the right expression — pure column arithmetic either way, so it
    stays inside whole-stage codegen and costs nothing at any scale.
    DuckDB's ``epoch_us(ts)`` is the oracle-side twin (exact for both
    layouts: ns values truncate, µs values pass through).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # int64 nanoseconds → integer-divide to exact microseconds.
        return F.expr(f"({col} div 1000)")
    if isinstance(dt, TimestampNTZType):
        # Naive wall time → epoch micros treating the wall clock as UTC
        # (DuckDB's epoch_us does the same).  timestampdiff on two NTZ
        # values never consults the session time zone, so this is exact
        # on any host tz with no session mutation (a cast-to-TIMESTAMP
        # here would silently shift under a non-UTC driver session).
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    if isinstance(dt, TimestampType):
        # Instant-carrying type: unix_micros is tz-independent by
        # definition.
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt}; "
        "expected BIGINT nanos or TIMESTAMP/TIMESTAMP_NTZ"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
