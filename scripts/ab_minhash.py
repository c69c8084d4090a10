"""A/B: HOF minhash_near_dup_pairs vs relational variant (throwaway)."""
from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

from uda_spark import cache
from uda_spark.functions import portable
from uda_spark.operators import dedup as D
from uda_spark.operators.dedup import with_shingles
from uda_spark.session import get_spark
from uda_spark.registry import all_specs

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def minhash_pairs_hof(
    df, text_col, id_col, n_hashes=16, bands=4, k=3, jaccard_threshold=0.5
):
    rows_per_band = n_hashes // bands
    sh = cache.tracked_persist(
        with_shingles(df, text_col, k)
        .select(
            F.col(id_col).alias("doc"),
            F.array_distinct("shingles").alias("sset"),
            F.expr(portable.minhash_sig("shingles", n_hashes, "spark")).alias("sig"),
        )
    )
    banded = sh.select(
        "doc",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bh', "
                f"md5(array_join(slice(sig, b * {rows_per_band} + 1, {rows_per_band}), '|'))))"
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sets = sh.select("doc", "sset")
    return (
        cand.join(sets.withColumnsRenamed({"doc": "doc_a", "sset": "set_a"}), on="doc_a")
        .join(sets.withColumnsRenamed({"doc": "doc_b", "sset": "set_b"}), on="doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(set_a, set_b))"))
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(set_a) + size(set_b) - n_inter)"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def run(tag, fn):
    best = None
    for _ in range(3):
        cache.release_persisted()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best:.3f}s")
    return best


spark = get_spark("ab_minhash", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
    "noop"
).mode("overwrite").save()

spec = all_specs()["dedup_minhash_near_pairs"]
corpus_fn = None
# replicate the query's corpus
import uda_spark.queries.dedup as QD

corpus = QD._corpus_near(spark, SF)

a = run("hof", lambda: minhash_pairs_hof(corpus, "text", "doc_id", 16, 4, 3, QD.JACCARD_T))
b = run("relational", lambda: D.minhash_near_dup_pairs(corpus, "text", "doc_id", 16, 4, 3, QD.JACCARD_T))
print(f"speedup: {a / b:.2f}x")
spark.stop()
