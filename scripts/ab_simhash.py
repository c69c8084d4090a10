"""A/B: HOF simhash60 vs relational explode+codegen-aggregate simhash.

Throwaway measurement harness (min-of-2 per variant, bench-style noop sink).
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

from uda_spark.functions import portable
from uda_spark.operators import dedup as D
from uda_spark.session import get_spark
from uda_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def simhash_relational(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = portable.tokens(text_col, "spark")
    tok = df.select(F.col(id_col), F.explode(F.expr(toks)).alias("t"))
    m = "concat(md5(t), md5(concat('x', t)))"
    bits = tok.select(
        F.col(id_col),
        *[
            F.expr(f"CAST(conv(substring({m}, {15 * g + 1}, 15), 16, 10) AS BIGINT)").alias(f"b{g}")
            for g in range(4)
        ],
    )
    ones = []
    for i in range(1, 61):
        g, o = (i - 1) // 15, (i - 1) % 15
        shift = 4 * (14 - o) + 3
        ones.append(F.sum(F.expr(f"shiftright(b{g}, {shift}) & 1")).alias(f"o{i}"))
    grouped = bits.groupBy(id_col).agg(F.count("*").alias("n"), *ones)
    sig = " + ".join(
        f"IF(2 * o{i} - n >= 0, {1 << (60 - i)}L, 0L)" for i in range(1, 61)
    )
    return grouped.select(F.col(id_col), F.expr(sig).alias("sig"))


def run(tag, fn):
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best:.3f}s")
    return best


spark = get_spark("ab_simhash", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF, "documents")
spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
    "noop"
).mode("overwrite").save()

a = run("hof", lambda: D.simhash_signatures(docs, "text", "doc_id"))
b = run("relational", lambda: simhash_relational(docs, "text", "doc_id"))

# sanity: identical signatures
diff = (
    D.simhash_signatures(docs, "text", "doc_id")
    .withColumnRenamed("sig", "sig_a")
    .join(simhash_relational(docs, "text", "doc_id"), on="doc_id")
    .where(F.col("sig_a") != F.col("sig"))
    .count()
)
print(f"mismatches: {diff}")
print(f"speedup: {a / b:.2f}x")
spark.stop()
