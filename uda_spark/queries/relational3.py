"""Relational surface, part 3: the remaining TPC-H query shapes
(Q2, Q7, Q8, Q9, Q11, Q13, Q15, Q16, Q20, Q21, Q22), adapted to this
schema (no partsupp table, no commit/receipt dates, no phone/comment
columns — each adaptation preserves the original query's *shape*:
correlated min-subquery, multi-nation volume join, market-share ratio,
scalar-subquery HAVING, outer-join distribution, NOT-IN/anti, and the
EXISTS / NOT EXISTS pair).

Reference context: the reference engine (Mellanox/UDA) has no relational
operators at all — values are opaque bytes (see SURVEY.md §2.2,
src/Merger/StreamRW.cc:334-404 record framing); this surface is what a
Spark-native engine must provide for the same workloads' analytics layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.queries.common import revenue_expr, REVENUE_SQL, dsum_sql, t
from uda_spark.registry import register


def _revenue():
    return revenue_expr()


# --------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated scalar-min subquery)
# --------------------------------------------------------------------------

_Q2_COST = "l_extendedprice / l_quantity"


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN({_Q2_COST}) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
FROM cost
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
  AND supply_cost = (SELECT MIN({_Q2_COST})
                     FROM lineitem l2
                     JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                     JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                     WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
""",
    tags=("relational", "subquery", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: supply cost = min unit price observed in
    lineitem, since there is no partsupp table): for each LARGE part,
    the EUROPE supplier(s) offering the minimum cost.

    Scale shape: the correlated scalar subquery is decorrelated by hand
    into one aggregate per (part, supplier) plus a per-part min — two
    shuffles on partkey, no repeated subquery execution.  supplier,
    nation, region are broadcast; lineitem is the only big input and is
    scanned once.
    """
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")

    euro_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(f"MIN({_Q2_COST})").alias("supply_cost"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = cost.groupBy("l_partkey").agg(F.min("supply_cost").alias("min_cost"))
    return (
        cost.join(min_cost, on="l_partkey")
        .where(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       {REVENUE_SQL} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("relational", "join", "aggregation"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year.

    Scale shape: supplier+nation broadcast onto lineitem (map-side),
    orders⋈customer and lineitem⋈orders shuffle on their keys; the
    nation-pair predicate prunes most rows before the fact-fact shuffle
    because the supplier-side filter is applied pre-join.
    """
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.expr("TIMESTAMP '1996-01-01 00:00:00'"),
            F.expr("TIMESTAMP '1997-12-31 00:00:00'"),
        )
    )
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_revenue()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------
# Q8 — market share of one nation within a region
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
WITH all_nations AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
           (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
""",
    tags=("relational", "join", "aggregation"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of ECONOMY-part revenue sold into ASIA,
    by order year.

    Scale shape: part/supplier/nation/region broadcast; the only
    fact-fact shuffles are lineitem⋈orders and orders⋈customer on their
    natural keys.  Both sums are exact decimals; the share is one double
    division per group — deterministic across partitionings.
    """
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    reg = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = t(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n2_key"))
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    cust = t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    joined = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(
                t(spark, sf_dir, "supplier").join(
                    F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------

_Q9_AMOUNT_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    " - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))"
)


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM({_Q9_AMOUNT_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
    tags=("relational", "join", "aggregation"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: cost = retailprice × quantity, since there is
    no partsupp.ps_supplycost): profit on red parts by supplier nation
    and order year.

    Scale shape: part LIKE-filter broadcast onto lineitem prunes the fact
    early; the only shuffle of full width is lineitem⋈orders.  All money
    math is exact decimal; one final cast to double.
    """
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp_nat = t(spark, sf_dir, "supplier").join(
        F.broadcast(t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    amount = _revenue() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    joined = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        "n_name", F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(amount).cast("double").alias("sum_profit"))


# --------------------------------------------------------------------------
# Q11 — important stock (HAVING over a scalar subquery)
# --------------------------------------------------------------------------

_Q11_VALUE = "CAST(l_extendedprice AS DECIMAL(18,2))"


@register(
    "q11_important_parts",
    oracle=f"""
WITH scoped AS (
  SELECT l_partkey, {_Q11_VALUE} AS v
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey = 3
)
SELECT l_partkey AS p_partkey, CAST(SUM(v) AS DOUBLE) AS value
FROM scoped
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE) >
       (SELECT CAST(SUM(v) AS DOUBLE) * CAST(0.001 AS DOUBLE) FROM scoped)
""",
    tags=("relational", "subquery", "aggregation"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: part value = lineitem revenue from NATION_3
    suppliers, no partsupp): parts whose value exceeds 0.1% of the total.

    Scale shape: the scalar subquery is a one-row aggregate broadcast
    into the HAVING — the fact is scanned once, grouped once; the total
    reuses the same scoped relation.  Exact decimal sums make the
    threshold comparison deterministic.
    """
    supp = t(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    scoped = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("v"))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("v").cast("double").alias("value"))
    total = scoped.agg(
        (F.sum("v").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double group-by)
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM c_orders GROUP BY c_count
""",
    tags=("relational", "join", "aggregation"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: the NOT LIKE comment filter becomes an
    order-priority filter): distribution of non-urgent order counts per
    customer, including zero-order customers via the left outer join.

    Scale shape: shuffle on custkey for the outer join + first group-by
    (one exchange — Catalyst reuses the join partitioning for the
    aggregate), then a tiny second exchange on c_count.
    """
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    c_orders = (
        t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier (aggregate = scalar max of the same aggregate)
# --------------------------------------------------------------------------

_Q15_WINDOW = (
    "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
)


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {REVENUE_SQL} AS total_revenue
  FROM lineitem WHERE {_Q15_WINDOW}
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""",
    tags=("relational", "subquery", "aggregation"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in 1996Q1.

    Scale shape: one shuffle to build revenue0 (map-side partial sums on
    suppkey), a one-row max broadcast back — the classic "view + scalar
    subquery" plan with no re-computation of the view.
    """
    rev = (
        t(spark, sf_dir, "lineitem")
        .where(F.expr(_Q15_WINDOW))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (NOT IN + count distinct)
# --------------------------------------------------------------------------


@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tags=("relational", "join", "subquery"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: "complaint" suppliers = negative account
    balance, no comment column): distinct supplier count per qualifying
    (brand, type, size).

    Scale shape: the NOT IN is a broadcast anti-join (supplier is tiny);
    part filter broadcasts onto lineitem; the distinct count shuffles
    once on the group key with partial distinct aggregation map-side.
    """
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN chain → semi joins)
# --------------------------------------------------------------------------


@register(
    "q20_promotion_suppliers",
    oracle="""
SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 40
  )
""",
    tags=("relational", "subquery", "join"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: "excess availability" = shipped more than 40
    units of one small part in 1996, no partsupp.availqty): NATION_7
    suppliers meeting the bar.

    Scale shape: two nested INs become two semi joins — part filter
    broadcast into lineitem, the grouped HAVING relation semi-joined to
    supplier.  Only (suppkey, partkey, qty) flows through the shuffle.
    """
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = (
        t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    qualifying = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nat = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------

_Q21_LATE = "l_shipdate > o_orderdate + INTERVAL 60 DAY"
_Q21_LATE_SPARK = "l_shipdate > o_orderdate + INTERVAL 60 DAYS"


@register(
    "q21_suppliers_kept_waiting",
    oracle=f"""
WITH f_orders AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
lines AS (
  SELECT l_orderkey, l_suppkey, CASE WHEN {_Q21_LATE} THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN f_orders ON o_orderkey = l_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lines GROUP BY l_orderkey
)
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM (SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lines l JOIN per_order p ON l.l_orderkey = p.l_orderkey
      WHERE l.late = 1 AND p.n_supp > 1 AND p.n_late_supp = 1) w
JOIN supplier ON s_suppkey = w.l_suppkey
GROUP BY s_name
""",
    tags=("relational", "subquery", "join"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: "late" = shipped >60 days after the order
    date, no commit/receipt dates): suppliers who were the sole late
    supplier on a multi-supplier finalized order.

    Scale shape: the EXISTS/NOT-EXISTS pair is decorrelated into
    per-order window aggregates (distinct suppliers, distinct late
    suppliers) over the SAME joined relation — one shuffle on orderkey,
    one scan of each fact.  The first formulation (group-by + join-back)
    scanned and joined lineitem⋈orders twice; windows over the join's
    existing orderkey partitioning halved the exchange count.
    """
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = (
        t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.expr(f"CASE WHEN {_Q21_LATE_SPARK} THEN 1 ELSE 0 END").alias("late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lines.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    waiting = (
        flagged.where(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar avg subquery + anti join)
# --------------------------------------------------------------------------

_Q22_NATIONS = "(1, 3, 5, 7, 9, 11, 13)"


@register(
    "q22_sales_opportunity",
    oracle=f"""
SELECT c_nationkey AS cntrycode, COUNT(*)::BIGINT AS numcust,
       {dsum_sql('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_nationkey IN {_Q22_NATIONS}
  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey IN {_Q22_NATIONS})
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
    tags=("relational", "subquery", "join"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: country code = nation key, no phone column;
    "never ordered" = no urgent orders, which is non-degenerate at this
    order density): rich customers in target nations with no urgent
    orders.

    Scale shape: the scalar avg is a one-row broadcast; NOT EXISTS is a
    shuffle anti-join on custkey projecting only o_custkey from orders.
    The avg is an exact-decimal sum divided once — deterministic.
    """
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return rich.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )
