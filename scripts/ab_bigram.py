"""A/B: recompute vs persist of the (doc_id, gram) bigram explode in
text_bigram_logprob, at inflated synthetic corpus scales — pins the
crossover point the PLANS.md round-5 note deferred (measurement backing
the SCALING.md bigram-LM entry and the BIGRAM_PERSIST_DB default).

Usage: python scripts/ab_bigram.py [sf_dir] [inflations...]
Each inflation N replicates every sf document N times (distinct doc_ids,
same text), so the bigram vocabulary stays fixed while the corpus-side
explode — the thing the persist would cache — scales linearly.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from uda_spark.cache import release_persisted
from uda_spark.queries.text import bigram_logprob_scores
from uda_spark.session import get_spark
from uda_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
INFLATIONS = [int(a) for a in sys.argv[2:]] or [1, 20, 100, 300]


def inflate(docs: DataFrame, n: int) -> DataFrame:
    reps = docs.sparkSession.range(n).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * n + F.col("rep")).alias("doc_id"), "text"
    )


def run(docs: DataFrame, persist: bool) -> float:
    best = None
    for _ in range(2):
        release_persisted()
        docs.sparkSession.catalog.clearCache()
        t0 = time.perf_counter()
        bigram_logprob_scores(docs, persist_db=persist).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    release_persisted()
    return best


def main() -> None:
    spark = get_spark("ab_bigram")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF, "documents").select("doc_id", "text")
    n_docs = base.count()
    print(f"# base docs: {n_docs} ({SF})")
    for n in INFLATIONS:
        docs = inflate(base, n)
        t_re = run(docs, persist=False)
        t_pe = run(docs, persist=True)
        print(
            f"inflate x{n} ({n_docs * n} docs): recompute {t_re:.2f}s"
            f" persist {t_pe:.2f}s ratio {t_pe / t_re:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
