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


BASKET_TOP = 30


@register(
    "basket_copurchase_pairs",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
norders AS (SELECT COUNT(DISTINCT l_orderkey)::BIGINT AS n FROM li),
item AS (SELECT l_partkey, COUNT(*)::BIGINT AS n FROM li GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*)::BIGINT AS n_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT part_a, part_b, n_ab FROM pair
  ORDER BY n_ab DESC, part_a, part_b LIMIT {BASKET_TOP}
)
SELECT r.part_a, r.part_b, r.n_ab, ia.n AS n_a, ib.n AS n_b,
       round(CAST(r.n_ab AS DOUBLE) * (SELECT n FROM norders) / (ia.n * ib.n), 6) AS lift
FROM ranked r JOIN item ia ON ia.l_partkey = r.part_a
              JOIN item ib ON ib.l_partkey = r.part_b
""",
    tags=("quality", "analytics", "join"),
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in the
    same order, ranked by pair count, with lift = P(a,b)/(P(a)P(b)) —
    the co-purchase/recommendation primitive.

    Scale shape: the pair explosion is a self-join on the basket key,
    so its size is sum(basket_size²)/2 — bounded by the max basket, not
    the corpus (TPC-H baskets are ≤ 7 items; a retail feed is dozens).
    Item counts broadcast back onto the top pairs; n_orders is a scalar.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(F.count_distinct("l_orderkey").alias("n"))
    item = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(b, on="k")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
    )
    ranked = pair.orderBy(F.desc("n_ab"), "part_a", "part_b").limit(BASKET_TOP)
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        ranked.join(F.broadcast(ia), on="part_a")
        .join(F.broadcast(ib), on="part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double") * F.col("n") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


_DIFF_V2 = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 97 <> 0
UNION ALL
SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 103 = 0
"""

_DIFF_ROWHASH = (
    "md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' || "
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' || "
    "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' || o_orderpriority)"
)


@register(
    "table_diff_orders",
    oracle=f"""
WITH v1 AS (SELECT *, {_DIFF_ROWHASH} AS rh FROM orders),
v2 AS (SELECT *, {_DIFF_ROWHASH} AS rh FROM ({_DIFF_V2})),
j AS (
  SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
         v1.rh AS rh1, v2.rh AS rh2
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
),
tagged AS (
  SELECT k, CASE WHEN rh1 IS NULL THEN 'added'
                 WHEN rh2 IS NULL THEN 'deleted'
                 WHEN rh1 <> rh2 THEN 'changed'
                 ELSE 'unchanged' END AS change_type
  FROM j
)
SELECT change_type, COUNT(*)::BIGINT AS n_rows,
       CAST(SUM(k % 1000003) AS BIGINT) AS key_checksum
FROM tagged GROUP BY change_type
""",
    tags=("quality", "cdc", "join"),
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC without a log): classify every key across two
    table versions as added / deleted / changed / unchanged by
    full-outer-joining on the key and comparing per-row digests — the
    validation step after any migration, backfill, or MERGE, and the
    change feed when the source system has no CDC stream.

    Scale: the join co-partitions both versions on the key; the
    exchange carries (key, 32-byte digest), never full rows — the same
    digests-not-bodies discipline as exact dedup and table_digest.  The
    simulated v2 applies deterministic deletes (every 97th key), updates
    (every 101st) and inserts (every 103rd shifted) to the same orders
    table both engines read.
    """
    orders = t(spark, sf_dir, "orders")
    rowhash = (
        "md5(concat(CAST(o_custkey AS STRING), '|', o_orderstatus, '|', "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING), '|', "
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'), '|', o_orderpriority))"
    )
    v2 = (
        orders.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 103 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    h1 = orders.select("o_orderkey", F.expr(rowhash).alias("rh1"))
    h2 = v2.select("o_orderkey", F.expr(rowhash).alias("rh2"))
    j = h1.join(h2, on="o_orderkey", how="full_outer")
    tagged = j.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("rh1").isNull(), "added")
        .when(F.col("rh2").isNull(), "deleted")
        .when(F.col("rh1") != F.col("rh2"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return tagged.groupBy("change_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("k") % 1000003).cast("long").alias("key_checksum"),
    )
