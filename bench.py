"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to execute fully (count of a cached-nothing plan —
results are small aggregates, so count ≈ full execution).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

#: The headline set: one per operator family — scan+agg, join+topk, star
#: join, window, sessionization, as-of join, dedup (exact + minhash),
#: text stats, similarity search.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q10_returned_revenue",
    "q_top_orders_per_customer",
    "q_events_sessions",
    "q_purchase_last_click",
    "q_events_in_windows",
    "dedup_exact",
    "minhash_candidates",
    "text_fingerprint",
    "embedding_topk",
    "multimodal_features",
    "q8_market_share",
    "q_events_funnel",
    "text_tfidf_keywords",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pdtable_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pdtable_spark.operators import dedup
    from pdtable_spark.queries.suite import QUERIES, load

    BENCH_QUERIES = dict(QUERIES)
    # the suite's minhash query runs hash_fn="md5_60" (the DuckDB-checkable
    # verification mode); the headline benchmarks the PRODUCTION hash path
    BENCH_QUERIES["minhash_candidates"] = lambda s, d: dedup.minhash_dedup(
        load(s, d, "documents"), num_hashes=16, bands=4, jaccard_threshold=0.5
    )

    # warm the JVM + parquet footers + Python/Arrow workers once (not timed)
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings = {}
    for name in HEADLINE:
        best, n = None, 0
        for _ in range(2):  # min-of-2: first run pays codegen/JIT compile
            t0 = time.time()
            df = BENCH_QUERIES[name](spark, sf_dir)
            n = df.count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
