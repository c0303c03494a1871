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
#: Policy: OLDEST correctness evidence first, every round.  Round-5 order:
#: the 14 queries whose only driver row is from r1 (judge-re-verified in r4
#: but needing fresh driver evidence), then every query NEW or CHANGED this
#: round — the verified-incremental/classifier/SemDeDup/stream-static/
#: filtered-ANN/binary-dedup/cluster-keywords/recall/incremental-embedding
#: block, the late-round additions (normalized/span dedup, temperature mix,
#: PQ + refined PQ, skew report, trigram novelty, Gopher rules, minhash
#: estimate error, label centroids, dataset card, CDC chunks, IVF recall),
#: plus dedup_keep_best / text_tfidf_keywords / embedding_near_dups (changed
#: tie-break / df-mode / cosine spellings) — then the r3-evidence block
#: (oldest remaining) filling out the 50 slots; its tail leads the next
#: round, ahead of the r4-reported set.
_PRIORITY = [
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
    "dedup_incremental_verified",
    "dedup_normalized",
    "dedup_spans",
    "pipeline_mixture_temperature",
    "embedding_pq_topk",
    "q_user_skew_report",
    "text_ngram_novelty",
    "embedding_pq_refined",
    "text_gopher_rules",
    "minhash_estimate_error",
    "q_label_centroids",
    "pipeline_dataset_card",
    "doc_cdc_chunks",
    "embedding_ivf_recall",
    "embedding_pq_recall",
    "stream_curate_survivors",
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
    "text_tfidf_keywords",
    "text_tfidf_agg",
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
    "dedup_incremental",
    "embedding_ivf_topk",
    "embedding_lsh_topk",
    "embedding_near_dups",
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
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
