"""Data-quality and product-analytics queries: column profiling (the
ANALYZE TABLE primitive), anomaly flagging over rollups, cohort
retention.  All exact-integer or deterministic-double arithmetic
(functions/portable.py discipline), so every query value-hash matches
its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.queries.common import t
from uda_spark.registry import register

_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "profile_orders",
    oracle="""
SELECT * FROM (
"""
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name, COUNT(*)::BIGINT AS n_rows,
       (COUNT(*) - COUNT({c}))::BIGINT AS n_nulls,
       COUNT(DISTINCT {c})::BIGINT AS n_distinct FROM orders"""
        for c in _ORDERS_COLS
    )
    + "\n)",
    tags=("quality", "profiling", "aggregation"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile — null and exact distinct counts per
    column in ONE scan: per-column aggregates computed side by side in a
    single Aggregate node (count_distinct on several columns at once is
    planned as one expand + aggregate pass), then unpivoted to a
    (column_name, n_rows, n_nulls, n_distinct) row per column.

    This is the metadata-collection primitive behind join planning,
    layout choices (which column is worth Z-ordering or bucketing), and
    data-quality gates — at 100 TB you run it once per ingest batch,
    never per query.
    """
    orders = t(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _ORDERS_COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _ORDERS_COLS)
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(_ORDERS_COLS)}, {stack}) AS (column_name, n_nulls, n_distinct)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


ANOM_Z = 3  # |z| >= 3 flags an anomaly


@register(
    "events_hourly_anomalies",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) * 3600 AS bucket_epoch,
         COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*)::BIGINT AS nb,
         SUM(n_events)::BIGINT AS s, SUM(n_events * n_events)::BIGINT AS sq
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.bucket_epoch, h.n_events,
       round((h.n_events - CAST(s.s AS DOUBLE) / s.nb) /
             sqrt((CAST(s.sq AS DOUBLE) - CAST(s.s AS DOUBLE) * s.s / s.nb) / s.nb), 6)
         AS zscore,
       (abs((h.n_events - CAST(s.s AS DOUBLE) / s.nb) /
            sqrt((CAST(s.sq AS DOUBLE) - CAST(s.s AS DOUBLE) * s.s / s.nb) / s.nb))
        >= {ANOM_Z}) AS is_anomaly
FROM hourly h JOIN stats s ON h.event_type = s.event_type
WHERE s.sq * s.nb > s.s * s.s
""",
    tags=("quality", "events", "aggregation"),
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly flagging on the hourly rollup: per-type population
    z-scores computed from EXACT integer sum / sum-of-squares (the
    mergeable two-moment aggregate — the same partial-aggregation shape
    as any sum), then one deterministic double division per row.

    At scale the stats relation is |event_types| rows broadcast back
    onto the rollup — the rollup itself is the only corpus-scale input,
    and it is already materialized by the continuous-aggregate layer
    (events_hourly_rollup / events_daily_from_hourly).
    """
    from uda_spark.sources.tables import event_micros

    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("ts_us", event_micros(ev))
        .groupBy(
            "event_type",
            F.expr("(ts_us div 3600000000) * 3600").alias("bucket_epoch"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("nb")
    var = (F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("nb")) / F.col("nb")
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), on="event_type")
        .where(F.col("sq") * F.col("nb") > F.col("s") * F.col("s"))
        .select(
            "event_type",
            "bucket_epoch",
            "n_events",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) >= ANOM_Z).alias("is_anomaly"),
        )
    )


RETENTION_WEEKS = 4
_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "events_cohort_retention",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id),
sizes AS (SELECT cohort_week, COUNT(*)::BIGINT AS cohort_size FROM cohort GROUP BY cohort_week),
ret AS (
  SELECT c.cohort_week, CAST(a.week - c.cohort_week AS INT) AS week_offset,
         COUNT(DISTINCT a.user_id)::BIGINT AS n_active
  FROM act a JOIN cohort c ON a.user_id = c.user_id
  WHERE a.week - c.cohort_week BETWEEN 0 AND {RETENTION_WEEKS - 1}
  GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_size,
       round(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
""",
    tags=("quality", "events", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    tracked for {RETENTION_WEEKS} weekly offsets — the
    product-analytics companion to funnel analysis.

    Scale shape: activity distinct-reduces events to (user, week) rows
    first (the only corpus-scale exchange); cohorts are a per-user min;
    the retention join co-partitions on user_id and aggregates to a
    |weeks| x |offsets| grid.
    """
    from uda_spark.sources.tables import event_micros

    ev = t(spark, sf_dir, "events")
    act = (
        ev.withColumn("ts_us", event_micros(ev))
        .select("user_id", F.expr(f"ts_us div {_WEEK_US}").alias("week"))
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    ret = (
        act.join(cohort, on="user_id")
        .withColumn("week_offset", (F.col("week") - F.col("cohort_week")).cast("int"))
        .where(F.col("week_offset").between(0, RETENTION_WEEKS - 1))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), on="cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )
