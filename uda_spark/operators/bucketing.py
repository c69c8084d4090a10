"""Bucketed tables — pre-partitioned storage for shuffle-free joins/aggs.

The 100 TB story: a fact table that is joined or aggregated on the same
key every day should pay its shuffle ONCE, at write time.  Spark's
bucketing persists the hash-partitioning in the table layout (N bucket
files per partition, hashed on the bucket key, optionally sorted within
each bucket).  Every later sort-merge join or aggregation on that key
then reads the buckets co-located: **zero Exchange in the plan**, and
with ``sortBy`` also zero Sort.  Filters on the bucket key prune to a
single bucket (``SelectedBucketsCount`` in the scan).

This is the closest Spark analog of the reference's static partition
placement: UDA's MOF files are hash-partitioned map outputs addressed by
(jobId, mapId, reduceId) through an index (src/MOFServer/IndexInfo.cc:
237-274, plugins/mlx-2.x/.../UdaPluginSH.java:107-144) — partitioning
decided at write time, readers fetch exactly their partition.  Bucketing
is the declarative, catalog-tracked version of the same idea.

Scale notes:
- Bucket count is the join parallelism ceiling for the shuffle-free
  path: pick ~= cluster cores at target scale (e.g. 4096 for a
  1000-executor cluster), not the toy counts used in tests.
- Both sides must agree on bucket count (or be a multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- One output task writes each bucket per partition — repartition by the
  bucket key before writing to avoid small-file explosion
  (tasks × buckets files otherwise).
- ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` (default on)
  downgrades bucketed scans that no join/agg exploits — filter-only
  queries lose bucket pruning unless it is turned off.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_stale(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND its warehouse directory.

    A managed table whose session died leaves its location behind while
    the (in-memory) catalog forgets it — the next ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS even in overwrite mode.  Clearing
    both makes the write idempotent across crashed runs.
    """
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = Path(warehouse) / table.lower()
    if loc.exists():
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sorted_within: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Repartitions on the bucket key first so each bucket is written by
    exactly one task — without this, every task writes a sliver of every
    bucket and a 10k-task job creates 10k×buckets files.
    """
    _drop_stale(df.sparkSession, table)
    writer = (
        df.repartition(buckets, key)
        .write.format(fmt)
        .mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sorted_within:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key``: sort-merge, no exchange.

    The ``merge`` hint pins sort-merge join (a broadcast would also skip
    the shuffle, but proves nothing about the layout); with both sides
    bucketed and sorted on ``key`` the plan has neither Exchange nor
    Sort — the map-side merge the reference does in C++
    (src/Merger/MergeQueue.h:299-321) falls out of the table layout.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, key, how)
