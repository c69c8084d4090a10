"""Similarity search over embedding columns (north-star).

Two tiers, same semantics:
  * ``knn_bruteforce`` — exact top-k cosine.  The query set is broadcast
    (it is small by definition); the corpus is scanned once map-side and
    reduced with a per-query top-k window.  At 100 TB the corpus never
    shuffles — only (query, candidate, score) rows after per-partition
    pre-pruning.
  * ``lsh_knn`` — sign-random-projection LSH: deterministic pseudo-random
    hyperplanes derived from md5 bits bucket the corpus; only same-bucket
    pairs are scored.  The scale path when brute force is too wide.

Scores use exact fixed-point integer dot products (functions/portable.py)
so results are bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uda_spark.functions import portable


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    iv = portable.int_vec(vec_col, "spark")
    out = df.select(
        F.col(id_col).alias(f"{prefix}_id"), F.expr(iv).alias(f"{prefix}_vec")
    )
    norm = portable.int_dot(f"{prefix}_vec", f"{prefix}_vec", "spark")
    return out.withColumn(f"{prefix}_norm", F.expr(norm))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan + windowed top-k.

    Output: (query_id, neighbor_id, score) — score rounded to 6 dp, ties
    broken by neighbor id for full determinism.
    """
    c = _prep(corpus, id_col, vec_col, "c")
    q = _prep(queries, id_col, vec_col, "q")
    dot = portable.int_dot("q_vec", "c_vec", "spark")
    score = portable.cosine_from_ints(dot, "q_norm", "c_norm")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(F.expr(score), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def srp_buckets(df: DataFrame, id_col: str, vec_col: str, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection bucket id per vector.

    Hyperplane p's component for dimension d is +1/-1 from a portable hash
    bit (md5(p|d) first hex char >= '8') — deterministic, no stored model.
    Bucket = the n_planes sign bits packed into an int.
    """
    iv = portable.int_vec(vec_col, "spark")
    prepped = df.select(F.col(id_col), F.expr(iv).alias("_v"))
    # dot with hyperplane p: sum_d (v[d] * sign(p, d))
    proj = (
        f"transform(sequence(0, {n_planes - 1}), p -> "
        f"aggregate(zip_with(_v, sequence(0, size(_v) - 1), "
        f"(x, d) -> IF(substr(md5(concat(cast(p AS STRING), '|', cast(d AS STRING))), 1, 1) >= '8', x, -x)), "
        f"0L, (acc, x) -> acc + x))"
    )
    bucket = (
        f"aggregate(zip_with({proj}, sequence(1, {n_planes}), "
        f"(s, i) -> IF(s >= 0, shiftleft(1L, {n_planes} - i), 0L)), 0L, (a, b) -> a + b)"
    )
    return prepped.select(F.col(id_col), F.expr(bucket).alias("bucket"))


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    top_k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only same-SRP-bucket candidates.

    One exchange on the bucket id; candidate set shrinks ~2^n_planes-fold.
    Recall is traded for scan width — the knob a 100 TB deployment tunes.
    """
    cb = srp_buckets(corpus, id_col, vec_col, n_planes).withColumnRenamed(id_col, "c_id")
    qb = srp_buckets(queries, id_col, vec_col, n_planes).withColumnRenamed(id_col, "q_id")
    c = _prep(corpus, id_col, vec_col, "c").join(cb, on="c_id")
    q = _prep(queries, id_col, vec_col, "q").join(qb, on="q_id")
    dot = portable.int_dot("q_vec", "c_vec", "spark")
    score = portable.cosine_from_ints(dot, "q_norm", "c_norm")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(F.expr(score), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
