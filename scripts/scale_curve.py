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

# ---------------------------------------------------------------------------
# Round-9 breadth extension (VERDICT r08 next #6): every registered query
# measured >=0.5s at sf0.1 in the full-registry sweep (scripts/time_all.py,
# TIMEALL.json) that the curated list above does not already track, plus
# the queries registered after that sweep ran.  Names only; the curated
# list keeps its per-query plan notes.
EXTENDED = (
    "agg_cube",
    "agg_rollup",
    "approx_distinct_users",
    "approx_percentile_prices",
    "array_order_profiles",
    "basket_copurchase_pairs",
    "dedup_cluster_canonical",
    "dedup_cluster_canonical_star",
    "dedup_cluster_size_histogram",
    "dedup_cluster_survivor",
    "dedup_containment_pairs",
    "dedup_embedding_near_pairs",
    "dedup_embedding_near_pairs_lsh",
    "dedup_semdedup_clusters",
    "dedup_fingerprint",
    "dedup_incremental_crawl",
    "dedup_lsh_recall_eval",
    "dedup_minhash_calibration",
    "dedup_minhash_signatures",
    "dedup_simhash_near_pairs",
    "dedup_simhash_signatures",
    "dfsio_roundtrip",
    "dq_constraint_report",
    "dq_iqr_outlier_audit",
    "dq_order_reconciliation",
    "events_asof_forward",
    "events_asof_nearest",
    "events_asof_signup",
    "events_asof_tolerance",
    "events_attribution_touchpoints",
    "events_bot_score",
    "events_cohort_retention",
    "events_concurrency_curve",
    "events_entropy_rate",
    "events_funnel_steps",
    "events_gap_fill",
    "events_hourly_anomalies_mad",
    "events_interarrival_stats",
    "events_key_skew_profile",
    "events_markov_transitions",
    "events_peak_days",
    "events_poisson_dispersion",
    "events_props_map_stats",
    "events_props_variant",
    "events_purchase_session_lookup",
    "events_rolling_active_users",
    "events_scd2_temporal_join",
    "events_scd2_user_type",
    "events_session_busy_overlap",
    "events_theil_sen_trend",
    "events_time_to_convert",
    "events_top_trigrams",
    "events_user_entropy",
    "events_value_winsorize",
    "features_target_encoding_oof",
    "federated_mixed_format_scan",
    "geo_grid_neighbor_pairs",
    "graph_cluster_density",
    "graph_pagerank_neardup",
    "graph_triangle_stats",
    "grouping_sets_sales",
    "hll_sketch_persisted_rollup",
    "join_bloom_prefilter",
    "join_broadcast_dim",
    "join_bucketed_colocated",
    "join_dpp_partitioned_orders",
    "join_outer_agg",
    "kmeans_embeddings",
    "kv_partition_merge",
    "kv_pyds_roundtrip",
    "kv_pyds_stream_ingest",
    "kv_sequencefile_roundtrip",
    "kv_vint_stream_roundtrip",
    "layout_zorder_events",
    "lineitem_abc_analysis",
    "lineitem_ship_lag_histogram",
    "merge_orders_refresh",
    "ml_correlation_matrix",
    "ml_linear_fit_price_qty",
    "ml_ols_two_features",
    "ml_quantile_loss",
    "ml_spearman_corr",
    "multimodal_audio_loudness",
    "multimodal_decode_stats",
    "multimodal_feature_knn",
    "multimodal_phash_near_dup",
    "multimodal_resize_stats",
    "multimodal_scene_changes",
    "orc_roundtrip_part",
    "orders_argmax_latest",
    "orders_cohort_ltv",
    "orders_open_backlog",
    "orders_rfm_segments",
    "part_supplier_hhi",
    "percentile_order_values",
    "pipeline_corpus_refresh_e2e",
    "pipeline_dedup_token_savings",
    "pipeline_domain_balance",
    "pipeline_leakage_safe_split",
    "pipeline_shard_manifest",
    "pipeline_training_data",
    "pivot_priority_by_nation",
    "profile_orders",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity_parts",
    "q18_large_volume_customers",
    "q19_bracket_join",
    "q20_promotion_suppliers",
    "q21_suppliers_kept_waiting",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "range_join_value_buckets",
    "recursive_cte_part_ancestors",
    "schema_evolution_scan",
    "setops_all_suppliers",
    "setops_customers",
    "sim_ann_recall_eval",
    "sim_embedding_outliers",
    "sim_filtered_knn",
    "sim_hybrid_rrf",
    "sim_ivf_knn",
    "sim_ivfpq_knn",
    "sim_knn_margin_audit",
    "sim_label_centroid_dist",
    "sim_lsh_knn",
    "sim_matryoshka_knn",
    "sim_pq_incremental_serve",
    "sim_pq_knn",
    "sim_quantized_knn",
    "sim_radius_search",
    "sketch_histogram_persisted_merge",
    "sketch_kmv_intersection",
    "sort_by_key",
    "sql_api_supplier_balances",
    "stats_scaled_moments",
    "streaming_cms_user_sketch",
    "streaming_dedup_watermarked",
    "streaming_distinct_users",
    "streaming_enrich_static",
    "streaming_foreachbatch_sink",
    "streaming_freshness_lag",
    "streaming_histogram_quantiles",
    "streaming_hourly_rollup",
    "streaming_running_totals",
    "streaming_sessionize",
    "streaming_sliding_rollup",
    "streaming_stream_stream_join",
    "table_diff_orders",
    "table_digest_orders",
    "text_blocklist_filter",
    "text_bpe_train_merges",
    "text_cms_heavy_hitters",
    "text_decontaminate",
    "text_hashing_features",
    "text_inverted_index",
    "text_langid_confusion",
    "text_ngram_jaccard_pairs",
    "text_novelty_score",
    "text_pmi_bigrams",
    "text_quality_langid",
    "text_readability_flesch",
    "text_repetition_stats",
    "text_simpson_diversity",
    "text_source_drift_tvd",
    "text_token_stats",
    "text_unigram_logprob",
    "text_zipf_slope",
    "udf_cogroup_order_lines",
    "udf_grouped_zscore",
    "udf_scalar_text_stats",
    "udtf_order_metrics",
    "window_ntile_deciles",
    "window_order_gaps",
    "window_range_30d_sum",
    "window_rank_orders",
    "window_running_sum",
    "ml_two_proportion_ztest",
    "ml_paired_bootstrap_delta",
    "sim_ivf_balance_audit",
    "text_char_entropy",
    "dq_ship_date_consistency",
    "text_heaps_law_fit",
    "events_cuped_adjusted_ab",
    "sim_recall_vs_nprobe",
    # round-9 second-session additions
    "ml_youden_j_threshold",
    "ml_cramers_v",
    "ml_mrr_at_k",
    "ml_average_precision_at_k",
    "ml_kruskal_wallis",
    "text_perplexity_filter",
    "sim_centroid_drift",
    "pipeline_epoch_repetition",
    "ml_brier_decomposition",
    "events_seasonal_strength",
    "ml_fairness_equalized_odds",
    "ml_wilcoxon_signed_rank",
    "dq_uniqueness_audit",
    "graph_assortativity",
    "text_tokenizer_fertility",
    "ml_friedman_test",
    "pipeline_greedy_pack_nosplit",
    "ml_cochran_q",
    "sim_pq_distortion",
    # round-9 TIMEALL refresh: newly >=0.5s at sf0.1
    "events_ab_welch_test",
    "events_daily_from_hourly",
    "events_ewma_value",
    "events_hourly_anomalies",
    "events_lateness_profile",
    "events_user_activity",
    "hll_sketch_two_level",
    "join_null_safe_types",
    "join_semi",
    "lateral_top_orders",
    "multimodal_frame_sample",
    "orders_seasonality_index",
    "pipeline_sequence_packing",
    "pipeline_stratified_sample",
    "q22_sales_opportunity",
    "text_chunk_dedup",
    "text_pii_redact",
    "udf_grouped_agg_median",
    # round-10 TIMEALL refresh: newly >=0.5s at sf0.1
    "dedup_exact",
    "in_subquery_segments",
    "like_name_patterns",
    "ml_mcnemar_paired",
    "q14_promo_revenue",
    # round-10 additions
    "ml_auprc",
    "ml_delong_auc_variance",
    "events_diff_in_diff",
    "ml_anova_oneway",
    "ml_fdr_bh_segments",
    "ml_srm_check",
    "ml_ab_power_mde",
    "ml_tost_equivalence",
    "events_msprt_always_valid",
    # round-11 additions (>=0.5s at sf0.1, measured this round)
    "dedup_threshold_sweep",
    "dedup_cluster_purity",
    "events_rfm_migration",
    "events_retention_curve_fit",
    "ml_levene_brown_forsythe",
    "ml_hosmer_lemeshow",
    "ml_theil_u_association",
    "ml_qini_uplift",
    # round-12 additions (>=0.5s at sf0.1, measured this round)
    "dedup_semdedup_hier_clusters",
    "dedup_threshold_sweep_lsh",
    # round-13 addition (sibling dedup_embedding_near_pairs_lsh measured
    # 2.3s at sf0.1 — same pipeline plus the knob arithmetic)
    "dedup_lsh_scaled_planes_pairs",
)


# Machine-readable exclusion registry (VERDICT r09 #4): every registered
# query NOT in QUERIES/EXTENDED must appear here with its floor timing
# and reason, and tests/test_scale_accounting.py asserts
# len(tracked) + len(EXCLUDED) == len(all_specs()) with no overlap — a
# new query can no longer silently skip curve tracking.  Exclusion
# criterion: the full-registry sweep (scripts/time_all.py, TIMEALL.json)
# measured the query under 0.5 s at sf0.1, i.e. at the session-overhead
# floor documented in SCALING.md — a 3-point curve there measures JVM
# overhead, not data scaling.  If a later sweep lifts a query past the
# floor, move it to EXTENDED and re-run this script for just that name.
EXCLUDED: dict[str, str] = {
    "ml_paired_t_test": "overhead floor: 0.373s at sf0.1 (round-11 measurement, warm session min-of-2)",
    "csv_roundtrip_supplier": "overhead floor: 0.477s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "date_functions": "overhead floor: 0.240s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "distinct_pairs": "overhead floor: 0.226s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "events_dow_hour_heatmap": "overhead floor: 0.351s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "events_holt_forecast": "overhead floor: 0.483s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "events_hourly_rollup": "overhead floor: 0.426s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "events_props_extract": "overhead floor: 0.299s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "filter_project": "overhead floor: 0.339s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "join_anti": "overhead floor: 0.318s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "json_roundtrip_nation": "overhead floor: 0.328s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "kv_reduce_by_key": "overhead floor: 0.454s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "ml_calibration_bins": "overhead floor: 0.384s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "ml_confusion_report": "overhead floor: 0.499s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "pi_estimate": "overhead floor: 0.333s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "pipeline_compaction_plan": "overhead floor: 0.394s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "pipeline_train_val_test_split": "overhead floor: 0.303s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "pipeline_weighted_sample": "overhead floor: 0.328s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "q6_forecast_revenue": "overhead floor: 0.321s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "sample_stratified_hash": "overhead floor: 0.373s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "scalar_functions": "overhead floor: 0.321s at sf0.1 (round-12 warm min-of-3 re-measurement; the r12 TIMEALL single-iter 1.874s was cold-run contention)",
    "sim_embedding_norms": "overhead floor: 0.280s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "skew_salted_agg": "overhead floor: 0.389s at sf0.1 (round-12 warm min-of-3 re-measurement; the r12 TIMEALL single-iter 0.741s was cold-run contention)",
    "string_agg_nations": "overhead floor: 0.319s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "text_bpe_token_hist": "overhead floor: 0.335s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "text_chunk_windows": "overhead floor: 0.297s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "text_fuzzy_part_pairs": "overhead floor: 0.421s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "text_quality_by_source": "overhead floor: 0.399s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "text_roundtrip_documents": "overhead floor: 0.436s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "topk_orders": "overhead floor: 0.209s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "unpivot_order_metrics": "overhead floor: 0.197s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "window_percent_rank_balances": "overhead floor: 0.276s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "window_share_of_total_balances": "overhead floor: 0.344s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "wordcount_documents": "overhead floor: 0.311s at sf0.1 (TIMEALL r10 full-registry sweep)",
    "xml_roundtrip_region": "overhead floor: 0.399s at sf0.1 (TIMEALL r10 full-registry sweep)",
}

ITERS = 3


def main() -> None:
    # Optional argv: query names to (re)measure; their rows MERGE into the
    # existing SCALECURVE.json so adding a query doesn't re-run the world.
    only = set(sys.argv[1:])
    all_names = list(QUERIES) + [q for q in EXTENDED if q not in QUERIES]
    run_list = [q for q in all_names if not only or q in only]
    unknown = only - set(all_names)
    if unknown:
        sys.exit(f"not in QUERIES: {sorted(unknown)}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "uda_spark_scale_curve", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out: dict = {"metric": "scale_curve", "unit": "sec", "iters": ITERS,
                 "excluded": EXCLUDED, "queries": {}}
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
