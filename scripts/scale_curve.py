#!/usr/bin/env python
"""Scale-curve probe: time a representative query slice at sf0.001 /
sf0.01 / sf0.1 (100× input growth) and record the per-decade wall-time
ratios.  A plan that would die at 100 TB shows super-linear growth
already at these sizes (quadratic candidate generation, single-task
funnels); the operators here are designed to grow ~linearly in input
bytes with a constant overhead floor at tiny scale.

Writes one JSON line to stdout and SCALECURVE.json at the repo root.
Run:  python scripts/scale_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uda_spark.cache import release_persisted  # noqa: E402
from uda_spark.registry import all_specs  # noqa: E402
from uda_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "q1_pricing_summary",       # scan + partial agg
    "terasort_rank",            # global sort
    "dedup_minhash_near_pairs", # banded LSH
    "sim_knn_bruteforce",       # broadcast scan + top-k merge
    "text_tfidf_top_terms",     # explode + multi-stage agg
    "events_sessionize",        # keyed window
    "text_bigram_logprob",      # double explode + shuffle join on gram
    "pipeline_epoch_shuffle",   # one exchange + in-partition sort
    # round-6 additions
    "pipeline_temperature_mixture",  # map-side mixing vs broadcast rates
    "pipeline_curriculum_phases",    # per-source exact-order-statistic sort
    "pipeline_retrieval_e2e",        # composed dedup->CC->PQ->RRF pipeline
    # round-7 additions
    "dedup_prefix_filter_pairs",     # exact ssjoin (length+positional+cap guards)
    "ml_auc_rank_sum",               # distinct-score-group rank sums
    "pipeline_dataset_card",         # grouping-sets digest card
    "ml_pr_threshold_sweep",         # one corpus pass + broadcast threshold grid
    "sketch_histogram_quantiles",    # mergeable log-bucket histogram
    "events_cusum_changepoint",      # daily series + exact argmax
    "pipeline_model_eval_e2e",       # one persisted pass, long-form metrics
    "graph_degree_histogram",        # pair explode + bounded-bucket agg
    # round-8 additions
    "ml_auc_by_segment",             # per-segment partitioned rank windows
    "ml_chi_square_independence",    # one pass -> bounded contingency cells
    "ml_ndcg_at_k",                  # broadcast-queries corpus scan + k rows/query
    "sim_binary_hamming_knn",        # 8-byte signature scan, popcount ranking
    "dq_k_anonymity",                # two-level grouped audit
    "sim_late_interaction_maxsim",   # nested-HOF multivector scoring, no explode
    "events_survival_km",            # grouped spans + bounded ordered fold
    "ml_lift_deciles",               # two-pass global rank -> 10-row readout
    "pipeline_token_budget_pack",    # grouped range-partitioned cumsum packing
    "dq_referential_integrity",      # per-edge join-agg, broadcast small parents
    "dq_schema_profile",             # column-pruned per-column distinct scans
    "ml_ks_statistic",               # fused multi-column range-partitioned cumsum
    "dq_benford_firstdigit",         # filtered scan -> 9-digit bounded readout
    "text_bm25_topk",                # two map-only corpus passes + top-k, no explode
    "events_acf_daily",              # one fact pass -> O(days) lag self-join
    "ml_bootstrap_ci_mean",          # 64-conditional-column single-row aggregate
    "events_pareto_front",           # sort-based skyline via range-partitioned cummax
    "dq_freshness_lag",              # one fact pass -> (stream, day) bounded rollup
    "ml_conformal_interval",         # integer-rational OLS residual rank (two-pass)
    "ml_cohens_kappa",               # one corpus pass -> bounded confusion cells
    "text_gini_tokens",              # map-only counts -> two-pass rank -> 1 row
    "events_trend_mk",               # one fact pass -> O(days^2) tiny sign pairs
    "ml_psi_score_drift",            # two bounded aggregates -> 10-row PSI readout
    "pipeline_lorenz_deciles",       # map-only counts -> global_ntile -> 10 rows
    "events_burstiness_fano",        # one fact pass -> per-stream dispersion row
    "sim_recall_at_k_curve",         # two audited kNN tiers + a (q x k)-row join
    "pipeline_mixture_entropy",      # map-only source sums -> 1-row entropy
    "events_runs_test",              # daily rollup -> calendar-bounded lag window
    "ml_brier_score",                # one exchange -> 1-row proper-score readout
    "text_dup_ngram_coverage",       # gram-hash explode -> two exchanges -> 1 row
    "ml_mcc_ece",                    # one per-user pass -> bounded dual summary
    "sim_topk_diversity",            # audited top-k self-join, (q x k^2) bounded
    "text_ttr_by_source",            # one explode + (source, term) partial agg
    "dedup_rate_by_source",          # digest triples only; bounded source rollup
    "text_js_divergence_sources",    # drift-TVD shape, per-term micro-nat integers
    "ml_log_loss",                   # one exchange -> 1-row cross-entropy
    "orders_pareto_8020",            # range-partitioned cumsum -> 1-row 80/20 point
]
ITERS = 3


def main() -> None:
    # Optional argv: query names to (re)measure; their rows MERGE into the
    # existing SCALECURVE.json so adding a query doesn't re-run the world.
    only = set(sys.argv[1:])
    run_list = [q for q in QUERIES if not only or q in only]
    unknown = only - set(QUERIES)
    if unknown:
        sys.exit(f"not in QUERIES: {sorted(unknown)}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "uda_spark_scale_curve", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out: dict = {"metric": "scale_curve", "unit": "sec", "iters": ITERS, "queries": {}}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALECURVE.json"
    )
    if only and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        out["queries"].update(prior.get("queries", {}))
    for name in run_list:
        times = {}
        for sf in SFS:
            best = None
            for _ in range(ITERS):
                t0 = time.monotonic()
                specs[name].fn(spark, sf).collect()
                dt = time.monotonic() - t0
                release_persisted()
                best = dt if best is None else min(best, dt)
            times[os.path.basename(sf)] = round(best, 3)
        sfs = list(times)
        ratios = [
            round(times[b] / times[a], 2) for a, b in zip(sfs, sfs[1:])
        ]
        out["queries"][name] = {"sec": times, "ratio_per_10x": ratios}
        print(f"# {name}: {times} ratios {ratios}", file=sys.stderr)
    line = json.dumps(out)
    print(line)
    with open(path, "w") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
