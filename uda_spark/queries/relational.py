"""Relational surface queries (SURVEY §2.2) on the TPC-H-ish tables.

Each query is the DataFrame formulation (Catalyst plans pushdown, pruning,
broadcast, partial agg) paired with a DuckDB oracle.  Plan-quality notes
per query describe why the shape scales to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uda_spark.operators import agg as A
from uda_spark.operators import join as J
from uda_spark.operators import setops as S
from uda_spark.queries.common import revenue_expr, CHARGE_SQL, REVENUE_SQL, davg_sql, dsum_sql, t
from uda_spark.registry import register

def _revenue():
    return revenue_expr()


def _charge():
    return _revenue() * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)"))


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity', 'sum_qty')},
       {dsum_sql('l_extendedprice', 'sum_base_price')},
       {REVENUE_SQL} AS sum_disc_price,
       {CHARGE_SQL} AS sum_charge,
       {davg_sql('l_quantity', 'avg_qty')},
       {davg_sql('l_extendedprice', 'avg_price')},
       {davg_sql('l_discount', 'avg_disc')},
       COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "aggregation", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (adapted to this schema).

    Scale shape: scan with shipdate pushed to parquet, map-side partial agg
    on 6 tiny groups, one exchange of partial states — shuffle bytes are
    O(groups), independent of table size.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.expr("TIMESTAMP '2000-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            A.dsum("l_quantity", "sum_qty"),
            A.dsum("l_extendedprice", "sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            A.davg("l_quantity", "avg_qty"),
            A.davg("l_extendedprice", "avg_price"),
            A.davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {REVENUE_SQL} AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("relational", "join", "aggregation"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (adapted): top unshipped orders by revenue.

    Scale shape: customer filter broadcast to orders (dim-side), the
    orders⋈lineitem join shuffles on orderkey, top-10 via
    TakeOrderedAndProject (no global sort materialization).
    """
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.expr("TIMESTAMP '1998-03-15 00:00:00'")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.expr("TIMESTAMP '1998-03-15 00:00:00'")
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    grouped = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )
    return (
        grouped.select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {REVENUE_SQL} AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("relational", "join", "aggregation"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (adapted): revenue by nation where supplier and customer
    share the nation.

    Scale shape: region/nation/supplier/customer are dims → broadcast;
    only orders⋈lineitem shuffles (on orderkey).  Catalyst + AQE handle
    the join ordering.
    """
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
    )
    li = t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
                  cust.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == F.col("c_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(F.sum(_revenue()).cast("double").alias("revenue"))


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       COUNT(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("relational", "filter", "aggregation"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — every predicate must reach the parquet
    scan (asserted in tests via plans.pushed_filters)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {REVENUE_SQL} AS revenue, c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("relational", "join", "aggregation"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (adapted): top customers by returned-item revenue."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-10-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS net_price
FROM lineitem
WHERE l_quantity >= 45 AND l_returnflag = 'A'
""",
    tags=("relational", "filter"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+selection — Catalyst must prune the scan to 6 columns and
    push both predicates (asserted in plan tests)."""
    li = t(spark, sf_dir, "lineitem")
    return li.where((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "A")).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        _revenue().cast("double").alias("net_price"),
    )


@register(
    "join_broadcast_dim",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*)::BIGINT AS n_orders,
       {dsum_sql('o_totalprice', 'total_value')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("relational", "join"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with explicit broadcast: the orders side never shuffles for
    the join — the shape every 100 TB dim join must take."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        J.broadcast_join(orders, cust, on=[orders.o_custkey == cust.c_custkey])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), A.dsum("o_totalprice", "total_value"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
    tags=("relational", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence check without duplication or payload
    shuffle of the right side."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return J.semi_join(cust, orders, on=[cust.c_custkey == orders.o_custkey]).select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("relational", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return J.anti_join(cust, orders, on=[cust.c_custkey == orders.o_custkey]).select(
        "c_custkey", "c_name"
    )


@register(
    "join_outer_agg",
    oracle=f"""
SELECT c_custkey,
       COUNT(o_orderkey)::BIGINT AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_value
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
    tags=("relational", "join"),
)
def join_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving zero-order customers."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*)::BIGINT AS n_rows,
       {dsum_sql('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("relational", "aggregation"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass (Expand + single exchange)."""
    li = t(spark, sf_dir, "lineitem")
    return A.rollup_agg(
        li, ["l_returnflag", "l_linestatus"], F.count("*").alias("n_rows"), A.dsum("l_quantity", "sum_qty")
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "n_rows",
        "sum_qty",
    )


@register(
    "agg_cube",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       {dsum_sql('o_totalprice', 'total_value')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "aggregation"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tab totals via CUBE."""
    orders = t(spark, sf_dir, "orders")
    return A.cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        F.count("*").alias("n_orders"),
        A.dsum("o_totalprice", "total_value"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
        "n_orders",
        "total_value",
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("relational", "distinct"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate with map-side partial dedup."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("relational", "sort", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: planned as TakeOrderedAndProject — each task retains k rows,
    no global sort (SURVEY §2.2 'Limit / top-k')."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(100)


@register(
    "setops_customers",
    oracle="""
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only95' AS tag, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
""",
    tags=("relational", "setops"),
)
def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result (tagged)."""
    orders = t(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{y}-01-01 00:00:00'"))
                & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{y + 1}-01-01 00:00:00'"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year(1995), year(1996)
    both = S.intersect(y95, y96).select(F.lit("both").alias("tag"), "o_custkey")
    only95 = S.difference(y95, y96).select(F.lit("only95").alias("tag"), "o_custkey")
    return S.union_all(both, only95)


@register(
    "window_rank_orders",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
""",
    tags=("relational", "window"),
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — one exchange on the window key; Spark's
    WindowGroupLimit pushes the rank filter below the sort."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


@register(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
    tags=("relational", "window"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer; decimal accumulation keeps the window
    sum association-order independent (engine-exact)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


@register(
    "scalar_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_up,
       length(p_name)::BIGINT AS name_len,
       substr(p_brand, 1, 3) AS brand3,
       split_part(p_type, ' ', 1) AS type_head,
       round(p_retailprice, 1) AS price_r,
       CAST(p_size % 7 AS INT) AS size_mod,
       round(sqrt(p_size), 6) AS size_sqrt,
       CAST(abs(p_size - 25) AS INT) AS size_dev
FROM part
""",
    tags=("relational", "scalar"),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function gauntlet (string/math) — all JVM-side built-ins,
    entirely inside whole-stage codegen."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_brand", 1, 3).alias("brand3"),
        F.substring_index("p_type", " ", 1).alias("type_head"),
        F.round("p_retailprice", 1).alias("price_r"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.round(F.sqrt("p_size"), 6).alias("size_sqrt"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dev"),
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
FROM orders
WHERE o_orderkey % 10 = 0
""",
    tags=("relational", "scalar"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/arithmetic parity."""
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
    )


@register(
    "string_agg_nations",
    oracle="""
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("relational", "aggregation"),
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (sorted collect_list → deterministic)."""
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )
