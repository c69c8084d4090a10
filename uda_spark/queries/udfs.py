"""Queries exercising the Python UDF surface (pandas UDFs + grouped-map),
each with an exact DuckDB oracle (see functions/udfs.py for the
determinism discipline that makes this possible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.functions.udfs import (
    median_by_group,
    pd_token_count,
    pd_vowel_count,
    zscore_by_group,
)
from uda_spark.queries.common import t
from uda_spark.registry import register


@register(
    "udf_scalar_text_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens_udf,
       CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels
FROM documents
""",
    tags=("udf", "text"),
)
def udf_scalar_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDFs (Arrow-batched) over the documents table."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        pd_token_count(F.col("text")).alias("n_tokens_udf"),
        pd_vowel_count(F.col("text")).alias("n_vowels"),
    )


@register(
    "udf_grouped_zscore",
    oracle="""
WITH stats AS (
  SELECT lang,
         COUNT(*)::BIGINT AS n,
         SUM(n_chars)::BIGINT AS s,
         SUM(n_chars * n_chars)::BIGINT AS s2
  FROM documents GROUP BY lang
)
SELECT doc_id, d.lang,
       CASE WHEN n > 1 AND (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) > 0
            THEN CAST(floor((n_chars - CAST(s AS DOUBLE) / n)
                            / sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
                            * 10000 + CAST(1 AS DOUBLE) / 2) AS BIGINT)
            ELSE 0 END AS z_bp
FROM documents d JOIN stats USING (lang)
""",
    tags=("udf", "aggregation"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score of document length
    (basis points).  One exchange on the group key; Python receives whole
    groups as Arrow batches."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return zscore_by_group(docs, "lang", "n_chars", "doc_id")


@register(
    "udf_grouped_agg_median",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5) AS median_cents
FROM orders GROUP BY o_orderstatus
""",
    tags=("udf", "aggregation"),
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: exact integer-cents median."""
    orders = t(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    return median_by_group(orders, "o_orderstatus", F.col("cents"), "median_cents")


@register(
    "udf_cogroup_order_lines",
    oracle="""
SELECT o.o_orderkey,
       COUNT(l.l_orderkey)::BIGINT AS n_lines,
       CAST(COALESCE(SUM(l.l_quantity), 0) AS DOUBLE) AS total_qty,
       o.o_totalprice
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 20 = 0
GROUP BY o.o_orderkey, o.o_totalprice
""",
    tags=("udf", "cogroup", "join"),
)
def udf_cogroup_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas transform: orders and lineitem cogrouped on a
    BUCKET of orderkey, each bucket pair handed to one Python function —
    the arbitrary two-sided grouped-map surface (custom join logic,
    per-key reconciliation) that a plain join can't express in general.

    Cogrouping on the raw key would make one Python invocation per
    order: correct, but the per-call interpreter + pandas-construction
    overhead (~1 ms) dominates when groups are tiny — at sf0.1 that is
    7.5k calls doing microseconds of real work each, and at 100 TB it is
    hundreds of millions.  Bucketing the key space (xxhash64 % 512)
    amortizes the overhead: one call per bucket, and the per-key
    reconciliation runs VECTORIZED inside pandas (groupby + merge), so
    the Python-call count is a constant knob while per-call work scales
    with rows.  Raise ``n_buckets`` with corpus size so a bucket's two
    sides stay executor-memory-resident.

    The pandas fn computes per-order line counts/quantity so the LEFT
    JOIN aggregate oracle can check it exactly: counts are ints and
    quantities are integral-valued doubles, so pandas' sum order cannot
    change the result.  Scale shape: one shuffle per side on the bucket,
    Arrow-batched group hand-off, output is one row per order.
    """
    import pandas as pd

    n_buckets = 512

    def fill(key, orders_pdf, lines_pdf):
        if not len(orders_pdf):
            # line-only bucket (no matching orders) contributes nothing —
            # the cogroup surface hands us both dangling sides
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "n_lines": pd.Series(dtype="int64"),
                    "total_qty": pd.Series(dtype="float64"),
                    "o_totalprice": pd.Series(dtype="float64"),
                }
            )
        if len(lines_pdf):
            agg = (
                lines_pdf.groupby("l_orderkey")["l_quantity"]
                .agg(n_lines="count", total_qty="sum")
                .reset_index()
            )
        else:
            agg = pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "n_lines": pd.Series(dtype="int64"),
                    "total_qty": pd.Series(dtype="float64"),
                }
            )
        out = orders_pdf.merge(
            agg, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].astype("int64"),
                "n_lines": out["n_lines"].fillna(0).astype("int64"),
                "total_qty": out["total_qty"].fillna(0.0).astype("float64"),
                "o_totalprice": out["o_totalprice"].astype("float64"),
            }
        )

    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.pmod(F.xxhash64("o_orderkey"), F.lit(n_buckets)).alias("bkt"),
        )
    )
    lines = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 20 == 0)
        .select(
            "l_orderkey",
            "l_quantity",
            F.pmod(F.xxhash64("l_orderkey"), F.lit(n_buckets)).alias("bkt"),
        )
    )
    return (
        orders.groupBy("bkt")
        .cogroup(lines.groupBy("bkt"))
        .applyInPandas(
            fill,
            schema="o_orderkey long, n_lines long, total_qty double, o_totalprice double",
        )
    )


@register(
    "udtf_order_metrics",
    oracle="""
SELECT o_orderkey, 'price_per_key' AS metric,
       o_totalprice / (o_orderkey + 1) AS value
FROM orders WHERE o_orderkey % 50 = 0
UNION ALL
SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
FROM orders WHERE o_orderkey % 50 = 0
""",
    tags=("udf", "udtf"),
)
def udtf_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 4 surface): each
    order row fans out to one row per derived metric via a LATERAL join —
    the table-function escape hatch for row→many-rows logic that scalar
    UDFs can't express (parsers, exploders, generators).

    Completes the UDF/UDAF/UDTF trio (scalar + grouped-agg pandas UDFs
    and grouped-map/cogrouped transforms are the other queries here).
    Values are IEEE results of exact inputs (double price, integer key),
    so the UNPIVOT-style UNION ALL oracle matches exactly.  Scale: the
    UDTF is applied map-side under the lateral join — no shuffle; Python
    row cost is bounded by the pre-filter.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, metric string, value double")
    class OrderMetrics:
        def eval(self, o_orderkey: int, o_totalprice: float):
            yield o_orderkey, "totalprice", o_totalprice
            yield o_orderkey, "price_per_key", o_totalprice / (o_orderkey + 1)

    spark.udtf.register("order_metrics", OrderMetrics)
    from uda_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT m.o_orderkey, m.metric, m.value
        FROM orders o, LATERAL order_metrics(o.o_orderkey, o.o_totalprice) m
        WHERE o.o_orderkey % 50 = 0
        """
    )
