"""SparkSession factory with shuffle-tuned defaults.

The reference fixes its exchange/merge behavior at INIT time (comparator,
codec, buffer pool — src/Merger/reducer.cc:56-133).  Our analog is a session
factory that pins the configs that matter for a large shuffle-heavy cluster:
AQE (runtime re-plan + skew join — the analog of UDA's hybrid merge and
anti-hotspot fetch ordering, src/Merger/MergeManager.cc:58-91), snappy
shuffle compression (O12, src/Merger/reducer.cc:439-450), Arrow for any
JVM<->Python hand-off (the analog of the DirectByteBuffer J2C feed,
plugins/shared/.../UdaPlugin.java:435-555).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    try:
        return max(2, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "uda_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for shuffle-heavy analytics.

    Defaults are chosen to scale: at 100 TB you would raise
    ``shuffle_partitions`` (or let AQE coalesce from a high initial number)
    and the same code runs unchanged — nothing here assumes local mode.
    """
    cpus = _default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Exchange layer (SURVEY §2.1 O3): size the shuffle for the core
        # count; AQE coalesces small post-shuffle partitions at runtime.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # O12 analog: compressed shuffle streams.
        .config("spark.shuffle.compress", "true")
        .config("spark.io.compression.codec", "snappy")
        # Deterministic timestamp semantics for oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow-batched Python hand-off (J2CQueue analog).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables up to 64 MB broadcast instead of shuffling the
        # fact side — at 100 TB the fact table never moves for dim joins.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan layer: pushdown + pruning must reach the parquet reader.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("UDA_SPARK_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
