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
#: Round-4 order: the 3 ANN queries (never driver-reported in any round),
#: then the 7 streaming queries (red in r3, fixed this round - the driver
#: row is the proof), then the 2 operators new this round, then the queries
#: whose only green row is from r1 (the first 38 of those fit in this
#: round's 50 slots; the 12-query tail leads the next rotation), then
#: r2/r3's reported set.  Re-rotate each round so every declared operator
#: keeps a recent correctness row.
_PRIORITY = [
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_near_dups",
    "stream_hourly_counts",
    "stream_attribution",
    "stream_sessionize_stateful",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup",
    "stream_funnel_stateful",
    "pipeline_corpus_shuffle",
    "pipeline_length_buckets",
    "dedup_incremental",
    "dedup_keep_best",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q14_promo_share",
    "q18_large_orders",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q_top_orders_per_customer",
    "q_orders_by_month",
    "q_part_brand_stats",
    "q_rollup_returns",
    "q_pivot_order_status",
    "q_unpivot_measures",
    "q_customers_without_orders",
    "q_top_suppliers",
    "q4_order_priority",
    "q_idle_customers",
    "q_min_price_supplier",
    "q_cube_returns",
    "q_both_status_customers",
    "q_string_funcs",
    "q_math_funcs",
    "q_big_spenders_having",
    "q_nation_customer_counts",
    "q_running_spend",
    "q_distinct_ship_modes",
    "q10_returned_revenue",
    "q_table_facade_units",
    "q_sql_grouping_sets",
    "q_order_gaps",
    "q_range_frame_spend",
    "q_events_hourly",
    "q_events_sliding",
    "q_events_sessions",
    "q_purchase_last_click",
    "q_events_in_windows",
    "q_events_props_json",
    "q_quantity_percentiles",
    "q_purchase_nearest_click",
    "dedup_exact",
    "text_token_count",
    "text_lang_id",
    "text_fingerprint",
    "text_quality",
    "text_bpe_count",
    "pipeline_clean_corpus",
    "ngram_jaccard_pairs",
    "text_pii_redact",
    "text_repetition",
    "pipeline_decontaminate",
    "doc_chunks",
    "pipeline_train_split",
    "q7_nation_volume",
    "q9_product_profit",
    "dedup_clusters",
    "minhash_candidates",
    "simhash_fingerprints",
    "simhash_near_dups",
    "q_custkey_median_pandas",
    "multimodal_asset_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "embedding_topk",
    "q8_market_share",
    "q11_part_value",
    "q12_latency_priority",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "q21_late_sole_supplier",
    "text_tfidf_keywords",
    "text_top_bigrams",
    "pipeline_stratified_sample",
    "pipeline_source_stats",
    "q_corr_stats",
    "q_events_funnel",
    "q_user_retention",
    "q_customer_quartiles",
    "q_events_outliers",
    "pipeline_pack_budget",
    "q_fuzzy_part_names",
    "q_price_histogram",
    "q_events_interpolate",
    "pipeline_weighted_sample",
    "q_events_rolling",
    "q_price_trend_by_brand",
    "q_discount_rank_ties",
    "pipeline_mix_report",
    "q_embedding_norms",
    "q_session_conversion",
    "text_surprisal",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
