"""UDA acceptance-workload queries (SURVEY §2.3): terasort, sort,
wordcount, pi — each as an oracle-checked query; dfsio is covered by
bench.py (throughput metric, no oracle semantics to check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.functions import portable
from uda_spark.operators import kv as KV
from uda_spark.operators import sort as SRT
from uda_spark.operators.workloads import wordcount
from uda_spark.queries.common import t
from uda_spark.registry import register

PI_SAMPLES = 1_000_000
_PI_X = portable.lcg_unit("id", 1103515245, 12345)
_PI_Y = portable.lcg_unit("id", 69069, 1)
_PI_INSIDE = f"IF(({_PI_X}) * ({_PI_X}) + ({_PI_Y}) * ({_PI_Y}) <= 1.0, 1, 0)"


@register(
    "terasort_rank",
    oracle="""
SELECT ROW_NUMBER() OVER (ORDER BY k) AS rnk, k AS key_hex
FROM (SELECT md5('ts|' || event_id::VARCHAR) AS k FROM events)
""",
    tags=("workload", "sort"),
)
def terasort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terasort slice: derive binary keys, total-order sort them, emit the
    global rank (teravalidate checks order; the rank IS the order).

    Binary sort of unhex(md5) equals DuckDB's lexicographic sort of the
    hex string (unsigned bytewise — CompareFunc.cc:70-73 semantics).
    Global rank uses the scalable range-partition + offset pattern, not a
    single-partition window.
    """
    ev = t(spark, sf_dir, "events").select(
        F.md5(F.concat(F.lit("ts|"), F.col("event_id").cast("string"))).alias("key_hex")
    )
    keyed = ev.select(F.unhex("key_hex").alias("key_bin"), "key_hex")
    ranked = SRT.global_rank(keyed, ["key_bin"], alias="rnk")
    return ranked.select("rnk", "key_hex")


@register(
    "sort_by_key",
    oracle="""
SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rnk,
       l_orderkey, l_linenumber
FROM lineitem
WHERE l_orderkey % 5 = 0
""",
    tags=("workload", "sort"),
)
def sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortByKey workload equivalent (typed keys instead of raw bytes)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey", "l_linenumber"
    )
    return SRT.global_rank(li, ["l_orderkey", "l_linenumber"], alias="rnk").select(
        "rnk", "l_orderkey", "l_linenumber"
    )


@register(
    "wordcount_documents",
    oracle="""
SELECT w AS word, COUNT(*)::BIGINT AS cnt
FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
WHERE w <> ''
GROUP BY w
""",
    tags=("workload", "aggregation", "text"),
)
def wordcount_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wordcount acceptance workload over the documents table."""
    return wordcount(t(spark, sf_dir, "documents"), "text")


@register(
    "kv_partition_merge",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    tags=("workload", "kv"),
)
def kv_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core dataflow (O3-O5): hash-exchange + per-partition
    merge-sort.  Pure rearrangement — oracle is the identity projection;
    sortedness itself is asserted in tests via validate_sorted."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    return KV.partition_and_merge(li, ["l_orderkey", "l_linenumber"])


@register(
    "kv_reduce_by_key",
    oracle="""
SELECT user_id, event_type, COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id, event_type
""",
    tags=("workload", "kv", "aggregation"),
)
def kv_reduce_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition+merge+reduce (O11/O13 consumer) with map-side combine."""
    ev = t(spark, sf_dir, "events")
    return KV.reduce_merged(
        ev,
        ["user_id", "event_type"],
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "pi_estimate",
    oracle=f"""
SELECT SUM({_PI_INSIDE})::BIGINT * 4.0 / {PI_SAMPLES} AS pi_est
FROM range(0, {PI_SAMPLES}) r(id)
""",
    tags=("workload",),
)
def pi_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo pi from a deterministic integer LCG — identical sample
    stream in both engines; reference tolerance 0.1 (defaultsConf.sh:70-72)
    asserted in tests."""
    return (
        spark.range(PI_SAMPLES)
        .select(F.expr(_PI_INSIDE).cast("long").alias("inside"))
        .agg((F.sum("inside") * 4.0 / PI_SAMPLES).alias("pi_est"))
    )
