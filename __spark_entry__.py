"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-join query on sf0.001.
``queries()`` — every declared operator (SURVEY §2 + LLM-pipeline
extensions), from ``pdtable_spark.queries.suite``.
``oracle_sql()`` — matching DuckDB SQL for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdtable_spark.queries.suite import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-join revenue by nation
    (exercises scans, broadcast dims, shuffle join, decimal-exact agg)."""
    return QUERIES["q5_region_volume"](spark, "/root/testdata/sf0.001")


#: Driver-row rotation (the driver reports exactly the first 50 queries).
#: Policy: OLDEST correctness evidence first, every round.  Round-13
#: head-50 (the executed round-12 runbook, VERDICT r12 task #1) = the
#: NINE queries registered this round from queries/pending_r13.py
#: (staged r12 with full oracles + sf0.001/0.01/sf1 MATCH evidence),
#: plus the 17 remaining r8-evidence rows (CORRECTNESS_r08 report
#: order, starting at pipeline_snapshot_diff), plus the 24 oldest
#: r9-evidence rows (CORRECTNESS_r09 report order) — 50 exactly.
#: Mechanically: new _PRIORITY = [9 new] + old[50:] + old[:50] (the
#: r12-window rows rotate to the tail), total 226.
#:
#: Honest cycle arithmetic: 226 registered queries through a 50-row
#: window is a ceil(226/50) = FIVE-round steady-state cycle, so a
#: query's driver evidence can be up to 4 rounds old by the time its
#: row rotates back in (at r13 close: 9+17+24=50 r13 / 26 r9 / 50 r10 /
#: 50 r11 / 50 r12; oldest remaining driver evidence = r9).  The local
#: gate is tighter than the driver window:
#: scripts/verify_all.sh sweeps ALL registered oracles twice per round
#: (default + partitions=7 layouts), so a rotted query is caught the
#: round it rots, not the round its driver row comes up.
_PRIORITY = [
    "pipeline_e2e_curation",
    "lake_zone_refresh_read",
    "lake_bloom_refresh_read",
    "stream_upsert_vacuum",
    "dedup_skewed_buckets",
    "lake_compact_refresh_read",
    "pipeline_shard_export",
    "q_bucketed_colocated_join",
    "stream_shard_ledger",
    "pipeline_snapshot_diff",
    "pipeline_facade_ops",
    "text_vocab_drift",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "pipeline_clean_corpus",
    "q_events_in_windows",
    "q_events_props_json",
    "q_events_sessions",
    "q_purchase_last_click",
    "q_purchase_nearest_click",
    "q_quantity_percentiles",
    "text_bpe_count",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "embedding_label_prop_agreement",
    "pipeline_novelty_ledger",
    "stream_novelty_ledger",
    "embedding_margin_mining",
    "text_distinct_ngrams",
    "pipeline_source_divergence",
    "pipeline_quantile_ledger",
    "stream_quantile_ledger",
    "embedding_sq_recall",
    "pipeline_forget_audit",
    "pipeline_filter_agreement",
    "text_collocations",
    "embedding_gram",
    "dedup_incremental_verified",
    "dedup_normalized",
    "dedup_spans",
    "pipeline_mixture_temperature",
    "q_user_skew_report",
    "text_ngram_novelty",
    "minhash_estimate_error",
    "q_label_centroids",
    "doc_cdc_chunks",
    "embedding_ivf_recall",
    "text_classifier_filter",
    "embedding_semantic_dedup",
    "embedding_near_dups",
    "stream_enriched_segments",
    "embedding_lsh_filtered",
    "multimodal_dedup",
    "pipeline_cluster_keywords",
    "embedding_ann_recall",
    "embedding_incremental_dedup",
    "dedup_keep_best",
    "pipeline_source_overlap",
    "pipeline_apply_mixture",
    "pipeline_leakage_safe_split",
    "dedup_clusters",
    "doc_chunks",
    "embedding_topk",
    "minhash_candidates",
    "multimodal_asset_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "pipeline_decontaminate",
    "pipeline_mix_report",
    "pipeline_pack_budget",
    "pipeline_source_stats",
    "pipeline_stratified_sample",
    "pipeline_train_split",
    "pipeline_weighted_sample",
    "embedding_margin_agreement",
    "embedding_pca_project",
    "pipeline_heavy_hitters",
    "stream_heavy_hitters",
    "text_lm_bigram_nll",
    "multimodal_image_meta",
    "q22_idle_customers",
    "q11_part_value",
    "q12_latency_priority",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "q21_late_sole_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q_corr_stats",
    "q_custkey_median_pandas",
    "q_customer_quartiles",
    "q_discount_rank_ties",
    "q_embedding_norms",
    "q_events_funnel",
    "q_events_interpolate",
    "q_events_outliers",
    "q_events_rolling",
    "q_fuzzy_part_names",
    "q_price_histogram",
    "q_price_trend_by_brand",
    "q_session_conversion",
    "q_user_retention",
    "simhash_fingerprints",
    "simhash_near_dups",
    "text_pii_redact",
    "text_repetition",
    "text_surprisal",
    "text_top_bigrams",
    "text_gopher_rules",
    "text_tfidf_keywords",
    "text_tfidf_agg",
    "pipeline_dataset_card",
    "stream_curate_survivors",
    "embedding_pq_topk",
    "text_repetition_signals",
    "text_c4_rules",
    "text_blocklist_filter",
    "pipeline_mixture_tokens",
    "pipeline_drift_report",
    "pipeline_drift_tvd",
    "pipeline_modern_recipe",
    "embedding_pq_refined",
    "embedding_pq_recall",
    "pipeline_model_quality_recipe",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    "embedding_gram_ledger",
    "stream_gram_ledger",
    "lake_zorder_cells",
    "pipeline_column_profile",
    "stream_upsert_changelog",
    "pipeline_json_profile",
    "pipeline_score_calibration",
    "stream_drift_monitor",
    "dedup_incremental",
    "embedding_ivf_topk",
    "embedding_lsh_topk",
    "pipeline_corpus_shuffle",
    "pipeline_length_buckets",
    "q10_returned_revenue",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q_big_spenders_having",
    "q_both_status_customers",
    "q_cube_returns",
    "q_customers_without_orders",
    "q_distinct_ship_modes",
    "q_events_hourly",
    "q_events_sliding",
    "q_idle_customers",
    "q_math_funcs",
    "q_min_price_supplier",
    "q_nation_customer_counts",
    "q_order_gaps",
    "q_orders_by_month",
    "q_part_brand_stats",
    "q_pivot_order_status",
    "q_range_frame_spend",
    "q_rollup_returns",
    "q_running_spend",
    "q_sql_grouping_sets",
    "q_string_funcs",
    "q_table_facade_units",
    "q_top_orders_per_customer",
    "lake_pruned_read",
    "embedding_ivf_staleness",
    "pipeline_json_extract_typed",
    "pipeline_json_infer_plan",
    "stream_ivf_staleness",
    "lake_hilbert_cells",
    "stream_sample_ledger",
    "pipeline_json_profile_diff",
    "lake_pruned_semi_read",
    "lake_bloom_pruned_read",
    "q_top_suppliers",
    "q_unpivot_measures",
    "stream_attribution",
    "stream_dedup",
    "stream_funnel_stateful",
    "stream_hourly_counts",
    "stream_session_windows",
    "stream_sessionize_stateful",
    "stream_sliding_counts",
    "text_bm25_topk",
    "pipeline_drift_psi",
    "pipeline_numeric_drift",
    "hybrid_rrf_topk",
    "pipeline_dsir_weights",
    "text_char_entropy",
    "text_line_dedup",
    "text_common_lines",
    "pipeline_threshold_sweep",
    "embedding_cluster_profile",
    "embedding_cluster_sample",
    "embedding_cluster_drift",
    "pipeline_curation_funnel",
    "pipeline_bloom_screen",
    "embedding_hard_negatives",
    "embedding_label_propagation",
    "embedding_truncation_recall",
    "embedding_hard_negative_recall",
    "pipeline_decon_funnel",
    "stream_bloom_screen",
    "multimodal_phash_dups",
    "pipeline_epochs_plan",
    "pipeline_semantic_pack",
    "pipeline_uncertainty_sample",
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "pipeline_source_cap",
    "text_vocab_coverage",
    "pipeline_k_anonymize",
    "pipeline_anonymity_report",
    "dedup_containment_pairs",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
