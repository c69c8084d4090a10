"""Text-analysis queries over the documents table (north-star ops):
token statistics, language ID, quality scoring, fingerprinting.

Spark side is pure higher-order functions over the token array — no
Python, no shuffle before the final (tiny) aggregation; at 100 TB these
are map-only passes.  Every derived value is engine-portable
(functions/portable.py + functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uda_spark.functions import portable, text as TXT
from uda_spark.queries.common import t
from uda_spark.registry import register

_SP_TOKS = portable.tokens("text", "spark")
_DU_TOKS = portable.tokens("text", "duck")


@register(
    "text_token_stats",
    oracle=f"""
WITH base AS (SELECT doc_id, {_DU_TOKS} AS toks, n_chars FROM documents)
SELECT doc_id,
       CAST({TXT.token_count('toks', 'duck')} AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       CAST({TXT.stopword_hits('toks', 'duck')} AS BIGINT) AS n_stopwords,
       {TXT.fingerprint('toks', 'duck')} AS fingerprint
FROM base
""",
    tags=("text", "north-star"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + order-sensitive rolling-hash fingerprint."""
    docs = t(spark, sf_dir, "documents").withColumn("toks", F.expr(_SP_TOKS))
    return docs.select(
        "doc_id",
        F.expr(TXT.token_count("toks", "spark")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_uniq_tokens"),
        F.expr(TXT.stopword_hits("toks", "spark")).cast("long").alias("n_stopwords"),
        F.expr(TXT.fingerprint("toks", "spark")).alias("fingerprint"),
    )


@register(
    "text_quality_langid",
    oracle=f"""
WITH base AS (SELECT doc_id, lang, {_DU_TOKS} AS toks, n_chars FROM documents)
SELECT doc_id,
       {TXT.quality_score_ppm('toks', 'n_chars', 'duck')} AS quality_ppm,
       {TXT.lang_predict('toks', 'duck')} AS lang_pred,
       CAST(CASE WHEN {TXT.lang_predict('toks', 'duck')} = lang THEN 1 ELSE 0 END AS INT)
         AS lang_match
FROM base
""",
    tags=("text", "north-star"),
)
def text_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score + marker-vocabulary language-ID heuristic per doc."""
    docs = t(spark, sf_dir, "documents").withColumn("toks", F.expr(_SP_TOKS))
    pred = F.expr(TXT.lang_predict("toks", "spark"))
    return docs.select(
        "doc_id",
        F.expr(TXT.quality_score_ppm("toks", "n_chars", "spark")).alias("quality_ppm"),
        pred.alias("lang_pred"),
        F.when(pred == F.col("lang"), 1).otherwise(0).cast("int").alias("lang_match"),
    )


@register(
    "text_quality_by_source",
    oracle=f"""
WITH base AS (SELECT source, {_DU_TOKS} AS toks, n_chars FROM documents)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM({TXT.quality_score_ppm('toks', 'n_chars', 'duck')}) // COUNT(*) AS avg_quality_ppm,
       CAST(SUM({TXT.token_count('toks', 'duck')}) AS BIGINT) AS total_tokens
FROM base GROUP BY source
""",
    tags=("text", "north-star", "aggregation"),
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation view: per-source quality/size profile.

    Integer ppm scores sum exactly; the integer-division average is
    engine-exact by construction.
    """
    docs = t(spark, sf_dir, "documents").withColumn("toks", F.expr(_SP_TOKS))
    q = F.expr(TXT.quality_score_ppm("toks", "n_chars", "spark"))
    ntok = F.expr(TXT.token_count("toks", "spark"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr(f"sum({TXT.quality_score_ppm('toks', 'n_chars', 'spark')}) div count(*)").alias("avg_quality_ppm"),
        F.sum(ntok).cast("long").alias("total_tokens"),
    )


@register(
    "text_bpe_token_hist",
    oracle="""
WITH tk AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]') AS toks
  FROM documents
)
SELECT len(toks)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_docs
FROM tk GROUP BY 1
""",
    tags=("text", "north-star"),
)
def text_bpe_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-document token counts under a BPE-ish regex
    tokenizer (letter runs | digit runs | single punctuation) — the
    pre-merge vocabulary a byte-pair encoder starts from.

    Pure map-side regexp (identical RE semantics in both engines for
    this character-class-only pattern) + one tiny exchange on the
    histogram key.
    """
    toks = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"
    return (
        t(spark, sf_dir, "documents")
        .select(F.size(F.expr(toks)).cast("long").alias("n_tokens"))
        .groupBy("n_tokens")
        .agg(F.count("*").alias("n_docs"))
    )


TFIDF_TOP_K = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, unnest({portable.tokens('text', 'duck')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tk GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df FROM tk GROUP BY term
),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(CAST(tf.tf AS DOUBLE) * ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TFIDF_TOP_K}
""",
    tags=("text", "north-star", "aggregation"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic text-relevance
    pipeline as three aggregations: term frequency per (doc, term),
    document frequency per term, corpus size; idf = ln((N+1)/(df+1)).

    Scale shape: ONE explode; DF is derived from the TF relation (each
    (doc, term) row counts once toward the term's document frequency), so
    the corpus is scanned and exploded once, not twice.  The DF relation
    is vocabulary-sized and broadcast back onto TF; top-k per doc is a
    bounded window.  Every tfidf input is an exact integer, so ln() and
    the product are bit-identical across engines; ties break on the term
    itself.
    """
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(F.expr(portable.tokens("text", "spark"))).alias("term")
    )
    # no persist: both consumers of tf hang off the same exchange, which
    # Spark reuses (ReusedExchange) — caching measured strictly slower
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df), on="term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log((F.lit(n_docs) + F.lit(1)) / (F.col("df") + F.lit(1)).cast("double"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("tfidf", F.round("tfidf", 6))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rnk")
    )
