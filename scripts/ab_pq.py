"""A/B: map-side PQ assignment (broadcast codebook row, argmin in one
projection) vs the first-cut join + row_number window formulation
(throwaway measurement backing the PLANS.md sim_pq_knn note)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from uda_spark import cache
from uda_spark.functions import portable
from uda_spark.operators import similarity as SIM
from uda_spark.session import get_spark
from uda_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
M, K, DIM = 8, 16, 64
SUB = DIM // M


def encode_window(corpus: DataFrame, codebook: DataFrame) -> DataFrame:
    """First-cut formulation: explode to (vector, subspace) rows, join
    the codebook, rank candidates with a per-(vector, subspace) window."""
    subs = SIM._pq_subvectors(corpus, "vec_id", "embedding", M, SUB)
    w = Window.partitionBy("_id", "m").orderBy("dist2", "cid")
    codes = (
        subs.join(F.broadcast(codebook), "m")
        .withColumn("dist2", F.expr(SIM._PQ_DIST2))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_id", "m", "pos")
    )
    return (
        codes.groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "pos"))).alias("cp"))
        .select(F.col("_id").alias("vec_id"), F.expr("transform(cp, e -> e.pos)").alias("codes"))
    )


def synth(spark, n: int) -> DataFrame:
    """n deterministic 64-dim vectors (md5-derived) — scale the A/B past
    the tiny test corpus."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> "
            "CAST(conv(substring(md5(concat(CAST(id AS STRING), ':', CAST(d AS STRING))), 1, 6), 16, 10) AS FLOAT)"
            " / 16777216.0)"
        ).alias("embedding"),
    )


def main() -> None:
    spark = get_spark("ab_pq", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if SF.startswith("synth:"):
        emb = synth(spark, int(SF.split(":")[1])).localCheckpoint()
    else:
        emb = load_table(spark, SF, "embeddings")
    codebook = SIM.pq_train_codebooks(emb, "vec_id", "embedding", M, K, DIM)
    codebook.count()  # materialize the persisted codebook once, outside timing

    def best_of(fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    a = best_of(lambda: SIM.pq_encode(emb, codebook, "vec_id", "embedding", M, DIM).collect())
    b = best_of(lambda: encode_window(emb, codebook).collect())
    print(f"map-side encode:   {a:.3f}s  (projection only, no exchange)")
    print(f"join+window encode:{b:.3f}s  ({b / a:.2f}x)")
    cache.release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
