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


#: Queries with no hard driver row yet, listed FIRST: the round-1 driver run
#: reported exactly the first 50 of 64 in registration order, so rotation
#: guarantees every declared operator a correctness row across rounds.
#: Round-2 additions (never reported) lead, then round-1's unreported 14.
_PRIORITY = [
    "text_surprisal",
    "q_session_conversion",
    "q_embedding_norms",
    "pipeline_mix_report",
    "q_discount_rank_ties",
    "stream_funnel_stateful",
    "q_price_trend_by_brand",
    "pipeline_weighted_sample",
    "q_events_rolling",
    "q_fuzzy_part_names",
    "q_price_histogram",
    "q_events_interpolate",
    "pipeline_pack_budget",
    "q_events_funnel",
    "q_user_retention",
    "q_customer_quartiles",
    "q_events_outliers",
    "text_tfidf_keywords",
    "text_top_bigrams",
    "pipeline_stratified_sample",
    "pipeline_source_stats",
    "q_corr_stats",
    "q8_market_share",
    "q11_part_value",
    "q12_latency_priority",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "q21_late_sole_supplier",
    "dedup_clusters",
    "pipeline_decontaminate",
    "doc_chunks",
    "pipeline_train_split",
    "q7_nation_volume",
    "q9_product_profit",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup",
    "text_pii_redact",
    "text_repetition",
    "minhash_candidates",
    "simhash_fingerprints",
    "simhash_near_dups",
    "q_custkey_median_pandas",
    "stream_hourly_counts",
    "stream_attribution",
    "stream_sessionize_stateful",
    "multimodal_asset_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "embedding_topk",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_near_dups",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
