"""Relational surface, part 2: subqueries (correlated EXISTS / IN /
scalar), grouping sets, LIKE predicates, HAVING, percentiles, and a
bucketed range join — completing the SURVEY §2.2 category checklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.operators import join as J
from uda_spark.operators import setops as S
from uda_spark.queries.common import revenue_expr, REVENUE_SQL, dsum_sql, t
from uda_spark.registry import register


def _revenue():
    return revenue_expr()


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("relational", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted): correlated EXISTS — planned as a left-semi join
    on orderkey; the lineitem side carries only (orderkey, shipdate)."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-04-01 00:00:00'"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q12_late_shipments",
    oracle="""
SELECT o_orderpriority,
       SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
                THEN 1 ELSE 0 END)::BIGINT AS late_count,
       COUNT(*)::BIGINT AS total_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("relational", "join", "aggregation"),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): shipping-delay buckets per priority."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.when(
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) > 60, 1
    ).otherwise(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum(late).cast("long").alias("late_count"), F.count("*").alias("total_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE) AS promo_revenue,
       {REVENUE_SQL} AS total_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
""",
    tags=("relational", "join", "aggregation"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (adapted): promo vs total revenue; part is a broadcast dim."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-02-01 00:00:00'"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(_revenue()).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_parts",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS pk, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*)::BIGINT AS n_small,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem JOIN avg_qty ON l_partkey = pk
WHERE l_quantity < CAST(2 AS DOUBLE) * aq / 10
""",
    tags=("relational", "subquery", "aggregation"),
)
def q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted): correlated scalar subquery (per-part average)
    — planned as an aggregate + re-join on partkey, both sides shuffling
    once on the same key (co-partitioned join)."""
    li = t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("aq")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.lit(2).cast("double") * F.col("aq") / 10)
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("small_revenue"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS ok, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey, total_qty
FROM big JOIN orders ON o_orderkey = ok
         JOIN customer ON c_custkey = o_custkey
""",
    tags=("relational", "subquery", "aggregation"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (adapted): HAVING over a grouped subquery, joined back to
    dims.  The HAVING filter shrinks the join input before any wide join."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 150)
        .select("ok", F.col("q").cast("double").alias("total_qty"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("ok"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
    )


@register(
    "q19_bracket_join",
    oracle="""
SELECT COUNT(*)::BIGINT AS n_matches,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("relational", "join", "filter"),
)
def q19_bracket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted): disjunctive bracket predicates over a
    broadcast-dim join — the OR-of-ANDs stays a post-join filter while the
    equi-key keeps the join hash-based."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.count("*").alias("n_matches"), F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "in_subquery_segments",
    oracle="""
SELECT o_orderstatus, COUNT(*)::BIGINT AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'))
GROUP BY o_orderstatus
""",
    tags=("relational", "subquery"),
)
def in_subquery_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join against a filtered broadcast dim."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    return (
        J.semi_join(orders, F.broadcast(cust), on=[orders.o_custkey == cust.c_custkey])
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "grouping_sets_sales",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(CAST(year(l_shipdate) AS INT), -1) AS ship_year,
       COUNT(*)::BIGINT AS n_rows,
       {dsum_sql('l_extendedprice', 'sum_price')}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), (l_returnflag, year(l_shipdate)))
""",
    tags=("relational", "aggregation"),
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): one Expand + one
    exchange for three grouping shapes."""
    t_li = t(spark, sf_dir, "lineitem")
    t_li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(CAST(year(l_shipdate) AS INT), -1) AS ship_year,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM _gs_lineitem
GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), (l_returnflag, year(l_shipdate)))
"""
    )


@register(
    "like_name_patterns",
    oracle="""
SELECT p_brand,
       SUM(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END)::BIGINT AS n_small,
       SUM(CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END)::BIGINT AS n_bolt,
       SUM(CASE WHEN p_name LIKE '%ed%' THEN 1 ELSE 0 END)::BIGINT AS n_ed
FROM part GROUP BY p_brand
""",
    tags=("relational", "filter", "scalar"),
)
def like_name_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix/suffix/infix predicates (prefix LIKE can push down as a
    string-range scan filter)."""
    part = t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.sum(F.when(F.col("p_name").like("small%"), 1).otherwise(0)).cast("long").alias("n_small"),
        F.sum(F.when(F.col("p_name").like("%bolt"), 1).otherwise(0)).cast("long").alias("n_bolt"),
        F.sum(F.when(F.col("p_name").like("%ed%"), 1).otherwise(0)).cast("long").alias("n_ed"),
    )


@register(
    "percentile_order_values",
    oracle="""
SELECT o_orderstatus,
       CAST(floor(quantile_cont(o_totalprice, 0.5) * 100 + CAST(1 AS DOUBLE) / 2) AS BIGINT) AS median_cents,
       CAST(floor(quantile_cont(o_totalprice, 0.9) * 100 + CAST(1 AS DOUBLE) / 2) AS BIGINT) AS p90_cents
FROM orders GROUP BY o_orderstatus
""",
    tags=("relational", "aggregation"),
)
def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per group, emitted as
    integer cents (floor of an identical double is engine-deterministic)."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr(
            "CAST(floor(percentile(o_totalprice, CAST(1 AS DOUBLE)/2) * 100 + CAST(1 AS DOUBLE)/2) AS BIGINT)"
        ).alias("median_cents"),
        F.expr(
            "CAST(floor(percentile(o_totalprice, CAST(9 AS DOUBLE)/10) * 100 + CAST(1 AS DOUBLE)/2) AS BIGINT)"
        ).alias("p90_cents"),
    )


@register(
    "range_join_value_buckets",
    oracle="""
WITH buckets(bucket_name, lo, hi) AS (
  VALUES ('low', CAST(0 AS DOUBLE), CAST(50 AS DOUBLE)),
         ('mid', CAST(50 AS DOUBLE), CAST(200 AS DOUBLE)),
         ('high', CAST(200 AS DOUBLE), CAST(1000 AS DOUBLE))
)
SELECT bucket_name, COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN buckets ON value >= lo AND value < hi
GROUP BY bucket_name
""",
    tags=("relational", "join", "range"),
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events against value brackets.

    The bracket table is tiny → broadcast nested-loop with the range
    predicate, which is the right physical plan; for two LARGE sides the
    scalable pattern is bucketing both sides by floor(value/width) and
    equi-joining bucket±1 (see operators/join.py notes)."""
    ev = t(spark, sf_dir, "events")
    buckets = ev.sparkSession.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000.0)],
        ["bucket_name", "lo", "hi"],
    )
    return (
        ev.join(F.broadcast(buckets), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("bucket_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "window_range_30d_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS sum_30d
FROM orders
""",
    tags=("relational", "window", "range-frame"),
)
def window_range_30d_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per customer, the rolling 30-day
    order-value sum (peers by *time distance*, not row count — the frame
    the reference's row-stream model cannot express at all).

    Spark's ``rangeBetween`` needs a numeric ordering key, so the
    timestamp is mapped to epoch *days* (``unix_date`` — timezone-free
    for NTZ data) and the frame is ±30 days; the oracle uses the native
    INTERVAL frame over the timestamp — identical because these
    timestamps are midnight-aligned and day arithmetic is fixed-width in
    naive time.  Decimal accumulation keeps the sum association-order
    independent.

    Scale shape: one hash exchange on o_custkey, then a per-partition
    sort — same cost envelope as any other window; no extra shuffle for
    the range frame itself.
    """
    from pyspark.sql.window import Window

    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("sum_30d"),
    )


@register(
    "setops_all_suppliers",
    oracle="""
WITH h1 AS (SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'),
     h2 AS (SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-04-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1995-07-01 00:00:00')
SELECT 'common' AS tag, l_suppkey FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2)
UNION ALL
SELECT 'q1_extra' AS tag, l_suppkey FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
""",
    tags=("relational", "setops", "multiset"),
)
def setops_all_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset (bag) semantics, preserving
    per-key multiplicity: shipments per supplier common to both quarters
    vs. surplus in Q1.  Complements ``setops_customers`` (distinct
    forms).

    Plans as an aggregate of per-side counts + a join (Catalyst rewrites
    intersectAll/exceptAll to count-min replication) — one exchange per
    side on the value columns, no row-at-a-time logic.
    """
    li = t(spark, sf_dir, "lineitem")

    def quarter(start: str, end: str) -> DataFrame:
        return li.where(
            (F.col("l_shipdate") >= F.expr(f"TIMESTAMP '{start} 00:00:00'"))
            & (F.col("l_shipdate") < F.expr(f"TIMESTAMP '{end} 00:00:00'"))
        ).select("l_suppkey")

    h1, h2 = quarter("1995-01-01", "1995-04-01"), quarter("1995-04-01", "1995-07-01")
    common = S.intersect(h1, h2, keep_duplicates=True).select(
        F.lit("common").alias("tag"), "l_suppkey"
    )
    extra = S.difference(h1, h2, keep_duplicates=True).select(
        F.lit("q1_extra").alias("tag"), "l_suppkey"
    )
    return S.union_all(common, extra)


@register(
    "window_percent_rank_balances",
    oracle="""
SELECT s_suppkey, s_nationkey,
       round(PERCENT_RANK() OVER w, 6) AS pct_rank,
       round(CUME_DIST() OVER w, 6) AS cume
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
""",
    tags=("relational", "window"),
)
def window_percent_rank_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions: percent_rank and cume_dist of
    each supplier's balance within its nation — the normalized-rank
    surface (ties share values by definition, so the output is
    deterministic without a tiebreak column).  One exchange on the
    window key.
    """
    from pyspark.sql import Window as W

    sup = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_share_of_total_balances",
    oracle="""
WITH b AS (
  SELECT s_suppkey, s_nationkey, CAST(s_acctbal AS DECIMAL(18,2)) AS bal
  FROM supplier WHERE s_acctbal > 0
)
SELECT s_suppkey, s_nationkey,
       CAST(bal AS DOUBLE) AS acctbal,
       round(CAST(bal AS DOUBLE) /
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey) AS DOUBLE), 6)
         AS nation_share
FROM b
""",
    tags=("relational", "window"),
)
def window_share_of_total_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of its nation's total
    balance — the unordered partition-aggregate window (SUM OVER
    PARTITION BY with no ORDER BY), the one window shape the suite
    didn't yet exercise.  The partition total accumulates in exact
    DECIMAL (an unordered double window sum would be
    partitioning-dependent); only the final share divides as double.
    """
    from pyspark.sql import Window as W

    sup = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 0)
        .select(
            "s_suppkey",
            "s_nationkey",
            F.col("s_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    w = W.partitionBy("s_nationkey")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.col("bal").cast("double").alias("acctbal"),
        F.round(
            F.col("bal").cast("double") / F.sum("bal").over(w).cast("double"), 6
        ).alias("nation_share"),
    )


@register(
    "join_null_safe_types",
    oracle="""
WITH a AS (
  SELECT NULLIF(event_type, 'error') AS k, COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
b AS (
  SELECT NULLIF(event_type, 'error') AS k, COUNT(DISTINCT user_id)::BIGINT AS n_users
  FROM events GROUP BY 1
)
SELECT a.k AS type_key, a.n_events, b.n_users
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    tags=("relational", "join", "null-semantics"),
)
def join_null_safe_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the NULL
    group — here 'error' events collapsed to NULL via NULLIF — matches
    across sides instead of silently dropping, the semantics every
    dimension join over nullable keys needs (a plain `=` join would
    lose the NULL bucket without any error).

    Both sides are tiny aggregates; the join carries |types| rows.
    """
    ev = t(spark, sf_dir, "events")
    k = F.expr("nullif(event_type, 'error')")
    a = ev.groupBy(k.alias("k")).agg(F.count("*").alias("n_events"))
    b = ev.groupBy(k.alias("k")).agg(F.count_distinct("user_id").alias("n_users"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("type_key"), "n_events", "n_users"
    )


BLOOM_BITS = 126   # m: filter width in bits (2 words x 63 usable bits —
                   # bit 63 stays clear: DuckDB checks 1::BIGINT << 63)
BLOOM_K = 2        # hash functions per key


def _bloom_pos_duck(key: str, h: int) -> str:
    from uda_spark.functions import portable

    expr = "'" + str(h) + "|' || CAST(" + key + " AS VARCHAR)"
    return f"({portable.hash60(expr, 'duck')} % {BLOOM_BITS})"


def _bloom_pos_spark(key: str, h: int) -> str:
    from uda_spark.functions import portable

    expr = "concat('" + str(h) + "|', CAST(" + key + " AS STRING))"
    return f"({portable.hash60(expr, 'spark')} % {BLOOM_BITS})"


@register(
    "join_bloom_prefilter",
    oracle=f"""
WITH dim AS (SELECT s_suppkey AS key FROM supplier WHERE s_acctbal < 0),
dim_pos AS (
  SELECT key, {_bloom_pos_duck('key', 0)} AS pos FROM dim
  UNION ALL
  SELECT key, {_bloom_pos_duck('key', 1)} AS pos FROM dim
),
bloom AS (
  SELECT pos // 63 AS word, bit_or(1::BIGINT << (pos % 63)) AS bits
  FROM dim_pos GROUP BY pos // 63
),
probe AS (SELECT DISTINCT l_suppkey AS key FROM lineitem),
probe_pos AS (
  SELECT key, {_bloom_pos_duck('key', 0)} AS pos FROM probe
  UNION ALL
  SELECT key, {_bloom_pos_duck('key', 1)} AS pos FROM probe
),
checks AS (
  SELECT p.key,
         CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::BIGINT << (p.pos % 63))) != 0
              THEN 1 ELSE 0 END AS hit
  FROM probe_pos p LEFT JOIN bloom b ON b.word = p.pos // 63
),
verdict AS (
  SELECT key, CASE WHEN SUM(hit) = {BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass
  FROM checks GROUP BY key
),
truth AS (
  SELECT v.key, v.bloom_pass,
         CASE WHEN dim.key IS NOT NULL THEN 1 ELSE 0 END AS in_dim
  FROM verdict v LEFT JOIN dim ON dim.key = v.key
)
SELECT COUNT(*)::BIGINT AS n_probe,
       SUM(in_dim)::BIGINT AS n_exact,
       SUM(bloom_pass)::BIGINT AS n_bloom_pass,
       SUM(CASE WHEN bloom_pass = 1 AND in_dim = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_false_pos,
       SUM(CASE WHEN bloom_pass = 0 AND in_dim = 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_false_neg
FROM truth
""",
    tags=("join", "scale", "sketch"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, measured: build a 126-bit
    filter over a dimension key set, probe the fact side's keys through
    it, and report exact-match / bloom-pass / false-positive counts
    (false negatives must be 0 — a Bloom filter never lies negative).

    Why it matters at 100 TB: when the dimension is too big to
    broadcast raw but its BITMAP fits anywhere (here: 2 longs), the
    bloom prunes the fact scan BEFORE the shuffle — the same
    fact-bytes-never-move discipline as the reference's map-side
    combine (SURVEY §1.5), and the manual twin of Spark's runtime
    row-level filtering.  The filter build is one aggregate over the
    dim keys; the probe is a broadcast join against a WORDS-sized
    relation + pure integer bit tests.

    The deliberately small width (126 bits) makes false positives
    actually OCCUR at test scale, so the FP accounting — the part a
    deployment must monitor — is what the oracle pins, not just the
    happy path.
    """
    from uda_spark.functions import portable  # noqa: F401  (used via helpers)

    dim = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("key")
    )
    dim_pos = dim.select(
        "key", F.expr(_bloom_pos_spark("key", 0)).alias("pos")
    ).unionAll(dim.select("key", F.expr(_bloom_pos_spark("key", 1)).alias("pos")))
    bloom = (
        dim_pos.select(
            F.expr("pos div 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("bv"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bv)").alias("bits"))
    )
    probe = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("key")
    ).distinct()
    probe_pos = probe.select(
        "key", F.expr(_bloom_pos_spark("key", 0)).alias("pos")
    ).unionAll(probe.select("key", F.expr(_bloom_pos_spark("key", 1)).alias("pos")))
    checks = probe_pos.join(
        F.broadcast(bloom), on=F.expr("word = pos div 63"), how="left"
    ).select(
        "key",
        F.when(
            F.col("bits").isNotNull()
            & (
                F.expr("bits & shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
                != 0
            ),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    verdict = checks.groupBy("key").agg(
        F.when(F.sum("hit") == BLOOM_K, 1).otherwise(0).alias("bloom_pass")
    )
    truth = verdict.join(
        dim.withColumn("in_dim", F.lit(1)), on="key", how="left"
    ).select("bloom_pass", F.coalesce("in_dim", F.lit(0)).alias("in_dim"))
    return truth.agg(
        F.count("*").cast("long").alias("n_probe"),
        F.sum("in_dim").cast("long").alias("n_exact"),
        F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
        F.sum(
            F.when((F.col("bloom_pass") == 1) & (F.col("in_dim") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.sum(
            F.when((F.col("bloom_pass") == 0) & (F.col("in_dim") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_neg"),
    )
