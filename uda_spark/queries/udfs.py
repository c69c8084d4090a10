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
