"""Similarity-search queries over the embeddings table (north-star).

Scores are exact fixed-point integer dot products (functions/portable.py)
— order-independent, so identical across engines and partitionings; the
final cosine double is a deterministic function of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.functions import portable
from uda_spark.operators import similarity as SIM
from uda_spark.queries.common import t
from uda_spark.registry import register

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors

_IV = portable.int_vec("embedding", "duck")


@register(
    "sim_embedding_norms",
    oracle=f"""
WITH iv AS (SELECT vec_id, label, {_IV} AS v FROM embeddings)
SELECT vec_id, label,
       CAST({portable.int_dot('v', 'v', 'duck')} AS BIGINT) AS norm_sq_fp,
       round(sqrt(CAST({portable.int_dot('v', 'v', 'duck')} AS DOUBLE)) / {portable.FIXED_POINT}, 6)
         AS l2_norm
FROM iv
""",
    tags=("similarity", "north-star"),
)
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via exact fixed-point arithmetic (map-only)."""
    emb = t(spark, sf_dir, "embeddings")
    iv = emb.select(
        "vec_id", "label", F.expr(portable.int_vec("embedding", "spark")).alias("v")
    )
    norm_sq = F.expr(portable.int_dot("v", "v", "spark"))
    return iv.select(
        "vec_id",
        "label",
        norm_sq.alias("norm_sq_fp"),
        F.round(F.sqrt(norm_sq.cast("double")) / portable.FIXED_POINT, 6).alias("l2_norm"),
    )


@register(
    "sim_knn_bruteforce",
    oracle=f"""
WITH iv AS (SELECT vec_id, {_IV} AS v FROM embeddings),
n AS (SELECT vec_id, v, {portable.int_dot('v', 'v', 'duck')} AS nsq FROM iv),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({portable.cosine_from_ints(portable.int_dot('q.v', 'c.v', 'duck'), 'q.nsq', 'c.nsq')}, 6)
           AS score
  FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "north-star", "join"),
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query set × one corpus scan + windowed
    top-k (operators/similarity.py).  The corpus never shuffles."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    out = SIM.knn_bruteforce(emb, queries, "vec_id", "embedding", top_k=TOP_K)
    return out.select("query_id", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))


@register(
    "sim_label_centroid_dist",
    oracle=f"""
WITH iv AS (SELECT vec_id, label, {_IV} AS v FROM embeddings),
-- exact integer per-label centroid numerators (×FIXED_POINT), dims unrolled
dims AS (
  SELECT label, d, SUM(v[d + 1]) AS s, COUNT(*)::BIGINT AS n
  FROM iv, range(0, 64) r(d)
  GROUP BY label, d
),
means AS (
  SELECT label, n, CAST(s AS DOUBLE) / n / {portable.FIXED_POINT} AS m FROM dims
)
SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
       round(sqrt(SUM(m * m)), 6) AS centroid_l2
FROM means GROUP BY label
""",
    tags=("similarity", "north-star", "aggregation"),
)
def sim_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid L2 norm — the IVF coarse-quantizer building block
    (centroids are what an IVF index partitions the corpus by).

    Numerators stay exact integers through the aggregation; the division
    and norm are deterministic double ops on exact inputs.
    """
    emb = t(spark, sf_dir, "embeddings")
    iv = emb.select("label", F.expr(portable.int_vec("embedding", "spark")).alias("v"))
    dims = (
        iv.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    )
    means = dims.withColumn(
        "m", F.col("s").cast("double") / F.col("n") / portable.FIXED_POINT
    )
    return means.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_l2"),
    )


LSH_PLANES = 4
LSH_TABLES = 8
EMB_DIM = 64

_SRP_BUCKETS_SQL = SIM.srp_buckets_duck_sql(LSH_PLANES, LSH_TABLES, EMB_DIM)


@register(
    "sim_lsh_knn",
    oracle=f"""
WITH iv AS (SELECT vec_id, {_IV} AS v FROM embeddings),
n AS (SELECT vec_id, v, {portable.int_dot('v', 'v', 'duck')} AS nsq FROM iv),
buckets AS ({_SRP_BUCKETS_SQL}),
cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
  FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT cand.q_id AS query_id, cand.c_id AS neighbor_id,
         round({portable.cosine_from_ints(portable.int_dot('q.v', 'c.v', 'duck'), 'q.nsq', 'c.nsq')}, 6)
           AS score
  FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.c_id
)
SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "north-star", "approx"),
)
def sim_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-random-projection buckets (the scale path
    — candidates shrink ~2^n_planes-fold per table).

    The hyperplanes are deterministic md5 bits, so the oracle embeds the
    sign matrix as literals and recomputes the same buckets, candidates,
    and ranking — the approximation itself is value-hash checked, not
    just recall-tested (recall >= 0.4 vs brute force is still asserted
    in tests/test_approx_ops.py)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    out = SIM.lsh_knn(
        emb, queries, "vec_id", "embedding",
        top_k=TOP_K, n_planes=LSH_PLANES, n_tables=LSH_TABLES,
    )
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("int").alias("rank")
    )


QUANT_BITS = 8
_QMAX = (1 << (QUANT_BITS - 1)) - 1


@register(
    "sim_quantized_knn",
    oracle=f"""
WITH iv AS (SELECT vec_id, {_IV} AS v FROM embeddings),
ma AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM iv),
qv AS (SELECT vec_id, {portable.quant_vec('v', 'm', _QMAX, 'duck')} AS q FROM ma),
n AS (SELECT vec_id, q, {portable.int_dot('q', 'q', 'duck')} AS nsq FROM qv),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({portable.cosine_from_ints(portable.int_dot('q.q', 'c.q', 'duck'), 'q.nsq', 'c.nsq')}, 6)
           AS score
  FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "north-star", "approx"),
)
def sim_quantized_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine over int8-quantized embeddings — the memory-bounded
    ANN tier (4× smaller codes, 4× more corpus per executor).

    Quantization is exact integer arithmetic from the fixed-point
    domain, so the oracle recomputes the identical codes and ranking:
    the quantization error itself is value-hash checked.  Recall vs the
    float-width exact ranking is asserted in tests/test_approx_ops.py.
    """
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    out = SIM.quantized_knn(
        emb, queries, "vec_id", "embedding", top_k=TOP_K, bits=QUANT_BITS
    )
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("int").alias("rank")
    )


PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace
PQ_SUB = EMB_DIM // PQ_M

_PQ_D2 = (
    f"list_sum(list_transform(range(1, {PQ_SUB + 1}), "
    f"i -> (s.sv[i] - c.cent[i]) * (s.sv[i] - c.cent[i])))"
)


@register(
    "sim_pq_knn",
    oracle=f"""
WITH iv AS (SELECT vec_id, {_IV} AS v FROM embeddings),
subs AS (
  SELECT vec_id, m, list_slice(v, m * {PQ_SUB} + 1, m * {PQ_SUB} + {PQ_SUB}) AS sv
  FROM iv, range(0, {PQ_M}) r(m)
),
c0 AS (
  SELECT m, vec_id AS cid, list_transform(sv, x -> CAST(x AS DOUBLE)) AS cent
  FROM subs WHERE vec_id < {PQ_K}
),
a1 AS (
  SELECT vec_id, m, sv, cid FROM (
    SELECT s.vec_id, s.m, s.sv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY {_PQ_D2}, c.cid) AS rn
    FROM subs s JOIN c0 c ON s.m = c.m
  ) WHERE rn = 1
),
c1 AS (
  SELECT m, cid, cent,
         ROW_NUMBER() OVER (PARTITION BY m ORDER BY cid) - 1 AS pos
  FROM (
    SELECT m, cid, list(CAST(s AS DOUBLE) / n ORDER BY d) AS cent FROM (
      SELECT m, cid, d, SUM(sv[d + 1]) AS s, COUNT(*)::BIGINT AS n
      FROM a1, range(0, {PQ_SUB}) r(d) GROUP BY m, cid, d
    ) GROUP BY m, cid
  )
),
codes AS (
  SELECT vec_id, m, pos FROM (
    SELECT s.vec_id, s.m, c.pos,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY {_PQ_D2}, c.cid) AS rn
    FROM subs s JOIN c1 c ON s.m = c.m
  ) WHERE rn = 1
),
codes_l AS (SELECT vec_id, list(pos ORDER BY m) AS codes FROM codes GROUP BY vec_id),
lut0 AS (
  SELECT s.vec_id AS q_id, s.m, c.cid, {_PQ_D2} AS d2
  FROM subs s JOIN c1 c ON s.m = c.m
  WHERE s.vec_id < {N_QUERIES}
),
lut_m AS (SELECT q_id, m, list(d2 ORDER BY cid) AS dl FROM lut0 GROUP BY q_id, m),
lut AS (SELECT q_id, list(dl ORDER BY m) AS lt FROM lut_m GROUP BY q_id),
scored AS (
  SELECT l.q_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(0, {PQ_M}),
           m -> l.lt[m + 1][c.codes[m + 1] + 1])) AS approx
  FROM codes_l c CROSS JOIN lut l
  WHERE l.q_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       round(sqrt(approx) / {portable.FIXED_POINT}, 6) AS adc_dist,
       CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "north-star", "approx"),
)
def sim_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k — the 32× compression ANN tier
    (8 one-byte codes stand in for 64 floats per corpus vector).

    Codebooks are a deterministic single Lloyd iteration per subspace;
    queries score candidates via a broadcast (m × k) lookup table, so
    the coded corpus is scanned map-side and never shuffles.  Both the
    training and the ADC approximation are exact enough to value-hash:
    the oracle unrolls codebook training, encoding, and table lookups in
    SQL.  Recall vs brute force is asserted in tests/test_approx_ops.py.
    """
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    out = SIM.pq_knn(
        emb, queries, "vec_id", "embedding",
        top_k=TOP_K, m=PQ_M, k=PQ_K, dim=EMB_DIM,
    )
    return out.select(
        "query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int").alias("rank")
    )
