#!/usr/bin/env python
"""Regenerate PLANS.md: the physical-plan quality report for the bench
headline queries — exchange/broadcast/codegen counts, pushed filters,
and read schemas per query, at the bench scale factor.

Run from the repo root:  python scripts/plan_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from uda_spark.plans import explain as X  # noqa: E402
from uda_spark.registry import all_specs  # noqa: E402
from uda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Beyond the bench headline: plan-quality evidence for the flagship
# pipeline, the iterative trainer, and the round-4 additions.
EXTRA = [
    "pipeline_training_data",
    "kmeans_embeddings",
    "dedup_incremental_crawl",
    "sim_quantized_knn",
    "text_pii_redact",
    "sim_ivf_knn",
    "text_ngram_jaccard_pairs",
    "layout_zorder_events",
    # round 5
    "sim_pq_knn",
    "sim_ivfpq_knn",
    "events_scd2_user_type",
    "events_funnel_steps",
    "text_chunk_windows",
    "graph_triangle_stats",
    "text_cms_heavy_hitters",
    "table_diff_orders",
    "basket_copurchase_pairs",
    "events_ewma_value",
    "events_cohort_retention",
    "events_concurrency_curve",
    "events_user_entropy",
    "orders_rfm_segments",
    "lineitem_abc_analysis",
    "orders_open_backlog",
    "profile_orders",
    "text_inverted_index",
    "text_chunk_dedup",
    "text_fuzzy_part_pairs",
    "pipeline_train_val_test_split",
    "sim_radius_search",
    "dedup_containment_pairs",
    "graph_cluster_density",
    "events_markov_transitions",
    "events_top_trigrams",
    "events_interarrival_stats",
    "events_props_map_stats",
    "lineitem_ship_lag_histogram",
    "orders_argmax_latest",
    "window_share_of_total_balances",
    "text_pmi_bigrams",
    "text_bigram_logprob",
    "text_hashing_features",
    "pipeline_domain_balance",
    "pipeline_epoch_shuffle",
    "events_value_winsorize",
    "sim_ann_recall_eval",
    "dedup_minhash_calibration",
    "dedup_cluster_survivor",
    "text_novelty_score",
    "join_bloom_prefilter",
    "pipeline_weighted_sample",
    "events_key_skew_profile",
    "multimodal_phash_near_dup",
    "kv_pyds_roundtrip",
    "sim_matryoshka_knn",
    "sim_hybrid_rrf",
    "pipeline_leakage_safe_split",
    "events_lateness_profile",
    "pipeline_shard_manifest",
    "sketch_kmv_intersection",
    "events_rolling_active_users",
    "events_scd2_temporal_join",
    "events_session_busy_overlap",
    "events_hourly_anomalies_mad",
    "events_bot_score",
    "sim_embedding_outliers",
    "orders_cohort_ltv",
    "part_supplier_hhi",
    "events_time_to_convert",
    "orders_seasonality_index",
    "federated_mixed_format_scan",
    # round 6
    "pipeline_retrieval_e2e",
    "pipeline_temperature_mixture",
    "pipeline_curriculum_phases",
    "text_blocklist_filter",
    "dedup_cluster_size_histogram",
    "join_dpp_partitioned_orders",
    "multimodal_audio_loudness",
    "text_source_drift_tvd",
    "events_attribution_touchpoints",
    "features_target_encoding_oof",
    "sim_filtered_knn",
    "sim_pq_incremental_serve",
    "geo_grid_neighbor_pairs",
    "pipeline_corpus_refresh_e2e",
    "ml_linear_fit_price_qty",
    "ml_correlation_matrix",
    "events_ab_welch_test",
    "dedup_prefix_filter_pairs",
    # round 7
    "dedup_lsh_recall_eval",
    "ml_auc_rank_sum",
    "ml_calibration_bins",
    "ml_confusion_report",
    "pipeline_dataset_card",
    "graph_degree_histogram",
    "ml_pr_threshold_sweep",
    "sketch_histogram_quantiles",
    "events_cusum_changepoint",
    "pipeline_model_eval_e2e",
    # round 8
    "sketch_histogram_persisted_merge",
    "ml_auc_by_segment",
    "ml_chi_square_independence",
    "ml_ndcg_at_k",
    "sim_binary_hamming_knn",
    "pipeline_compaction_plan",
    "streaming_histogram_quantiles",
    "dq_k_anonymity",
    "events_holt_forecast",
    "events_survival_km",
    "sim_late_interaction_maxsim",
    "ml_ols_two_features",
    "ml_lift_deciles",
    "pipeline_token_budget_pack",
    "dq_referential_integrity",
    "dq_schema_profile",
    "ml_ks_statistic",
    "dq_benford_firstdigit",
    "text_bm25_topk",
    "events_acf_daily",
    "ml_bootstrap_ci_mean",
    "events_pareto_front",
    "dq_freshness_lag",
    "ml_conformal_interval",
    "ml_cohens_kappa",
    "text_gini_tokens",
    "events_trend_mk",
    "ml_psi_score_drift",
    "pipeline_lorenz_deciles",
    "events_burstiness_fano",
    "sim_recall_at_k_curve",
    "pipeline_mixture_entropy",
    "events_runs_test",
    "ml_brier_score",
    "text_dup_ngram_coverage",
    "ml_mcc_ece",
    "sim_topk_diversity",
    "text_ttr_by_source",
    "dedup_rate_by_source",
    "text_js_divergence_sources",
    "ml_log_loss",
    "orders_pareto_8020",
]

# Everything at/after this marker in an existing PLANS.md is hand-written
# analysis (bench variance notes, per-round audits) and is preserved
# verbatim across regenerations.
MANUAL_MARKER = "<!-- manual-notes -->"


def main() -> None:
    spark = get_spark("uda_spark_plan_report", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    lines = [
        "# PLANS — physical-plan quality of the bench headline queries",
        "",
        f"Generated by `scripts/plan_report.py` at `{SF_DIR}`. Shuffle",
        "exchanges exclude broadcast exchanges (broadcasts are the cheap",
        "ones we want); every scan's pushed filters and read schema verify",
        "that predicate pushdown and column pruning reached parquet.",
        "",
        "| query | shuffles | broadcasts | codegen stages | scans |",
        "|---|---|---|---|---|",
    ]
    details: list[str] = []
    for name in HEADLINE + EXTRA:
        df = specs[name].fn(spark, SF_DIR)
        # Execute df's OWN query execution so the explain shows AQE's
        # FINAL plan (runtime coalescing applied, codegen ids annotated)
        # — the pre-execution adaptive plan carries neither, and a
        # noop-sink write would execute a separate wrapped plan.
        df.collect()
        n_ex = X.count_exchanges(df)
        n_bc = X.count_broadcasts(df)
        n_cg = X.codegen_stages(df)
        n_scans = X.count_scans(df)
        schemas = X.read_schemas(df)
        filters = [f for f in X.pushed_filters(df) if f]
        lines.append(f"| {name} | {n_ex} | {n_bc} | {n_cg} | {n_scans} |")
        details.append(f"\n## {name}\n")
        details.append(f"Plan-quality note: {specs[name].doc.splitlines()[0]}\n")
        if filters:
            details.append("Pushed filters:\n")
            details.extend(f"- `{f}`" for f in filters)
        if schemas:
            details.append("\nDistinct read schemas (pruned columns only):\n")
            details.extend(f"- `{s}`" for s in schemas)
    lines.append("")
    lines.extend(details)
    manual = ""
    try:
        with open("PLANS.md") as fh:
            prev = fh.read()
        if MANUAL_MARKER in prev:
            manual = prev[prev.index(MANUAL_MARKER):]
    except FileNotFoundError:
        pass
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
        if manual:
            fh.write("\n" + manual)
    print(f"wrote PLANS.md ({len(HEADLINE) + len(EXTRA)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
