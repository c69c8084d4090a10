"""File-format scans and sinks (SURVEY §2.2: the reference reads only raw
MOF byte files; our engine must cover the standard format surface).

Readers return DataFrames with explicit schemas (never inference in
production paths — schema inference is a full extra pass at 100 TB).
Writers expose the layout knobs that matter at scale: partitioning
columns (partition pruning on read), max records per file (no
giant-file stragglers), and compression.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """One row per line, column ``value`` — the randomtextwriter-style
    input for wordcount workloads."""
    return spark.read.text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Parquet sink with layout control.

    ``partition_by`` columns become directory partitions → scans with
    equality/range predicates on them prune whole directories (the read-
    side analog of the reference's per-partition MOF files, O1/O2).
    """
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time, so later equi-joins/aggregations on those columns skip the
    exchange entirely — the persistent version of kv.partition_and_merge
    (pre-shuffled data at rest, as the reference's MOFs are).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module is on the classpath.

    Avro is an *external* Spark module (spark-avro jar) since 2.4; this
    container ships without it, so callers must gate.  The probe is a
    driver-side class lookup — no job, no I/O.
    """
    try:
        # the same resolution spark.read.format("avro") performs (a bare
        # Class.forName is NOT enough: the avro classes can be present in
        # the distribution jar while the data source stays unregistered)
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Avro scan (row-oriented container format, the common Kafka/Hadoop
    interchange).  Raises a clear error when the spark-avro module is
    absent instead of Spark's opaque ClassNotFound chain.

    LZO note (reference O12, src/Merger/LzoDecompressor.cc:151-167): Spark
    ships no LZO codec at all (GPL licensing); snappy/lz4/zstd cover the
    streaming-decompression capability across every format here.
    """
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath (external module since "
            "Spark 2.4); add org.apache.spark:spark-avro to use Avro I/O"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro is not on the classpath (external module since "
            "Spark 2.4); add org.apache.spark:spark-avro to use Avro I/O"
        )
    df.write.mode(mode).format("avro").save(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (both are
    columnar with min/max stripe stats); schema optional because ORC
    footers carry it, but passing one skips the footer read on the
    driver for wide directory listings."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """Native XML sink (built into Spark 4 — the former spark-xml)."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def read_xml(
    spark: SparkSession, path: str, schema: StructType, row_tag: str = "row"
) -> DataFrame:
    """Explicit-schema XML scan; inference would be an extra full pass.

    ``ignoreSurroundingSpaces`` is pinned off so a write/read roundtrip
    preserves leading/trailing whitespace in string values (the reader's
    default trims them, silently corrupting whitespace-bearing columns).
    Caveat XML cannot fix: an empty element decodes as null, so the
    roundtrip maps empty string -> null; don't use this sink for columns
    where that distinction matters.
    """
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", "false")
        .schema(schema)
        .load(path)
    )
