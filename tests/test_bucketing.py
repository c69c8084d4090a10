"""Bucketed-layout tests: the plans, not just the values.

Bucketing must never change results (the oracle-parity test covers
``join_bucketed_colocated``'s values); what it must change is the plan —
these tests pin the shuffle-free join/agg and bucket pruning so a layout
regression fails CI.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from uda_spark.operators.bucketing import colocated_join, write_bucketed
from uda_spark.plans import explain as X
from uda_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    customer = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    write_bucketed(orders, "tb_orders", "custkey", buckets=4)
    write_bucketed(customer, "tb_customer", "custkey", buckets=4)
    return orders, customer


def test_colocated_join_has_no_shuffle(spark, bucketed):
    joined = colocated_join(spark, "tb_orders", "tb_customer", "custkey")
    joined.collect()  # execute so the AQE final plan is inspected
    assert X.count_exchanges(joined) == 0, X.plan_str(joined, mode="simple")


def test_unbucketed_join_does_shuffle(spark, bucketed):
    orders, customer = bucketed
    plain = orders.hint("merge").join(customer, "custkey")
    plain.collect()
    assert X.count_exchanges(plain) == 2, X.plan_str(plain, mode="simple")


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed):
    agg = spark.table("tb_orders").groupBy("custkey").agg(F.sum("price"))
    agg.collect()
    assert X.count_exchanges(agg) == 0, X.plan_str(agg, mode="simple")


def test_bucket_pruning_on_key_filter(spark, bucketed):
    # autoBucketedScan (default on) downgrades a bucketed scan to a plain
    # one when no join/agg exploits the distribution — which also forfeits
    # bucket pruning on filter-only queries.  Pin it off to assert pruning.
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        pruned = spark.table("tb_orders").where(F.col("custkey") == 7)
        plan = X.plan_str(pruned, mode="formatted", final_only=False)
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        spark.conf.set(key, old)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    orders, customer = bucketed
    got = sorted(
        tuple(r)
        for r in colocated_join(spark, "tb_orders", "tb_customer", "custkey")
        .select("custkey", "price", "c_mktsegment")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in orders.join(customer, "custkey")
        .select("custkey", "price", "c_mktsegment")
        .collect()
    )
    assert got == want
