#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed once as a warm-up-free wall-clock measurement of
the full pipeline (scan → plan → execute → collect-to-driver count).  The
headline metric is the sum over the query set.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from uda_spark.cache import release_persisted
from uda_spark.registry import all_specs
from uda_spark.session import get_spark

# Headline set: one representative per operator family (SURVEY §2).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q9_product_profit",
    "q21_suppliers_kept_waiting",
    "join_outer_agg",
    "window_rank_orders",
    "kv_partition_merge",
    "terasort_rank",
    "wordcount_documents",
    "events_sessionize",
    "events_asof_signup",
    "dedup_minhash_near_pairs",
    "dedup_simhash_near_pairs",
    "sim_knn_bruteforce",
    "sim_lsh_knn",
    "text_token_stats",
    "text_tfidf_top_terms",
]

# Extended tier (round 5+): marquee operators added after the headline
# set froze.  Timed separately (min-of-2) and reported under
# "extended_queries" — NEVER summed into the headline total, which stays
# comparable across rounds only because its query set never changes.
EXTENDED = [
    "sim_pq_knn",
    "sim_ivfpq_knn",
    "events_scd2_user_type",
    "events_funnel_steps",
    "text_chunk_windows",
    "text_cms_heavy_hitters",
    "graph_triangle_stats",
    "lineitem_abc_analysis",
    # late round-5 additions
    "text_bigram_logprob",
    "sim_matryoshka_knn",
    "multimodal_phash_near_dup",
    "join_bloom_prefilter",
    "pipeline_weighted_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("uda_spark_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # Warm up the JVM (codegen, shuffle machinery, parquet footers) so the
    # first measured query isn't charged for session startup.
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # Three measured iterations per query, report the min: the host runs
    # other tenants, so single cold samples swing ±80%; min-of-3 is the
    # steady-state estimate.  clearCache() between iterations drops any
    # persist()ed intermediates so every iteration re-executes the FULL
    # pipeline (JVM/codegen warmth is kept — that is the point).
    ITERS = 3
    timings: dict[str, float | None] = {}
    for name in HEADLINE:
        spec = specs[name]
        best = None
        # A query that errors records null instead of killing the whole
        # run — one regression must not zero the round's perf signal.
        try:
            for _ in range(ITERS):
                release_persisted()  # drop tracked handles from the previous run
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                # noop sink executes the FULL plan (all columns, sorts kept) —
                # count() would let Catalyst eliminate sorts and prune the plan.
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            timings[name] = None
            print(f"# {name}: FAILED ({type(exc).__name__}: {exc})", file=sys.stderr)

    ext_timings: dict[str, float | None] = {}
    for name in EXTENDED:
        spec = specs[name]
        best = None
        try:
            for _ in range(2):
                release_persisted()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            ext_timings[name] = round(best, 3)
            print(f"# ext {name}: {ext_timings[name]:.3f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            ext_timings[name] = None
            print(f"# ext {name}: FAILED ({type(exc).__name__}: {exc})", file=sys.stderr)

    failed = sorted(n for n, v in timings.items() if v is None)
    # A failed query must never make the round LOOK faster: the headline
    # total is only comparable across rounds when it sums the same query
    # set, so any failure nulls the total (per-query numbers remain).
    total = None if failed else round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "all_ok": not failed,
                "unit": "sec",
                # Each per-query number is already the MIN over this many
                # full-pipeline executions inside this single process (the
                # host has ±80% cold-run variance; min-of-N is the
                # steady-state estimate even when the harness runs us once).
                "iters_per_query": ITERS,
                "queries": timings,
                "extended_queries": ext_timings,
                "failed_queries": failed,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
