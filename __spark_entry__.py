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
#: Policy: OLDEST correctness evidence first, every round.  Round-7 head-50
#: = embedding_pq_refined / embedding_pq_recall (oracle respelled in r6,
#: never driver-reported since — both judge-verified r6 and locally
#: verified at sf0.01 + sf1), then the TWO queries NEW this round
#: (pipeline_score_calibration — both calibration spellings value-pinned
#: in one frame; stream_drift_monitor — the streaming drift replay as two
#: checkpointed waves), then 46 of the 48 queries whose latest driver row
#: is r4 — 50 exactly.  The r4 block's last two entries
#: (stream_sessionize_stateful, stream_sliding_counts) sit at 51-52 and
#: lead r8; both were re-verified in the r6 builder sf1 sweep and their
#: code is untouched since.  The r5- and r6-evidence blocks follow.
#:
#: ROUND-8 RUNBOOK: register the 34 queries/pending_r8.py entries under
#: @q (each already holds a full DuckDB oracle, a pytest gate row, and
#: sf0.001/sf0.01/sf1 MATCH evidence — see BENCH_SCALE.md), then lead
#: _PRIORITY with the two r4 stragglers + the 34 new + 14 oldest
#: r5-evidence rows = 50 exactly; the remaining r5 block clears in r9.
_PRIORITY = [
    "embedding_pq_refined",
    "embedding_pq_recall",
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
    "q_top_suppliers",
    "q_unpivot_measures",
    "stream_attribution",
    "stream_dedup",
    "stream_funnel_stateful",
    "stream_hourly_counts",
    "stream_session_windows",
    "stream_sessionize_stateful",
    "stream_sliding_counts",
    "dedup_clusters",
    "dedup_exact",
    "dedup_incremental_verified",
    "dedup_keep_best",
    "dedup_normalized",
    "dedup_spans",
    "doc_cdc_chunks",
    "doc_chunks",
    "embedding_ann_recall",
    "embedding_incremental_dedup",
    "embedding_ivf_recall",
    "embedding_lsh_filtered",
    "embedding_near_dups",
    "embedding_semantic_dedup",
    "embedding_topk",
    "minhash_candidates",
    "minhash_estimate_error",
    "multimodal_asset_stats",
    "multimodal_dedup",
    "ngram_jaccard_pairs",
    "pipeline_apply_mixture",
    "pipeline_clean_corpus",
    "pipeline_cluster_keywords",
    "pipeline_leakage_safe_split",
    "pipeline_mixture_temperature",
    "pipeline_source_overlap",
    "q_events_in_windows",
    "q_events_props_json",
    "q_events_sessions",
    "q_label_centroids",
    "q_purchase_last_click",
    "q_purchase_nearest_click",
    "q_quantity_percentiles",
    "q_user_skew_report",
    "stream_enriched_segments",
    "text_bpe_count",
    "text_classifier_filter",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_novelty",
    "text_quality",
    "text_token_count",
    "multimodal_features",
    "multimodal_frame_sample",
    "pipeline_decontaminate",
    "pipeline_mix_report",
    "pipeline_pack_budget",
    "pipeline_source_stats",
    "pipeline_stratified_sample",
    "pipeline_train_split",
    "pipeline_weighted_sample",
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
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
