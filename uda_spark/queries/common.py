"""Shared helpers for the query suite.

Numeric discipline (why every money aggregate goes through decimal):
double summation is order-dependent, and Spark's partial-aggregation order
is nondeterministic across runs and cluster widths.  Casting 2-dp money
columns to DECIMAL(18,2) makes the sum exact (order-independent), and the
final CAST to DOUBLE is then a deterministic function of an exact rational
— bit-identical between Spark and DuckDB.  Counts are cast to BIGINT on
both sides (DuckDB sums of INT return HUGEINT otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uda_spark.sources.tables import load_table

# DuckDB/Spark-identical SQL fragments for exact money aggregation.


def dsql(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


def dsum_sql(col: str, alias: str) -> str:
    return f"CAST(SUM({dsql(col)}) AS DOUBLE) AS {alias}"


def davg_sql(col: str, alias: str) -> str:
    return f"CAST(SUM({dsql(col)}) AS DOUBLE) / COUNT({col}) AS {alias}"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Sum of extendedprice*(1-discount): exact decimal product then sum.
REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

CHARGE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2))) * "
    "(1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)"
)


def revenue_expr():
    """DataFrame-side twin of REVENUE_SQL: exact decimal
    extendedprice*(1-discount) — keep the two in sync."""
    from pyspark.sql import functions as F

    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


# ---------------------------------------------------------------------------
# Per-run scratch directories for queries that round-trip through storage.

_SCRATCH_DIRS: list[str] = []


def run_scratch_dir(prefix: str, sf_dir: str) -> str:
    """A scratch directory unique to THIS call — never shared between
    concurrent runs.

    Queries that write an intermediate artifact and read it back (the
    persisted-sketch merge, the foreachBatch parquet sink, the shard
    manifest) previously keyed the path only by the sf-dir basename, so
    two concurrent runs at the same scale factor raced (one run's
    overwrite clobbering the other's read-back).  Including the pid and
    a fresh uuid component per call removes the race entirely; a
    best-effort ``atexit`` sweep bounds accumulation within the process
    lifetime.
    """
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    path = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{os.getpid()}_{uuid.uuid4().hex[:8]}",
    )
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )
    _SCRATCH_DIRS.append(path)
    return path
