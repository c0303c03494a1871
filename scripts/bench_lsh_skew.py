"""Hot-bucket skew stress for the MinHash-LSH dedup path (VERDICT r11
task #6): the plan-contract tests pin the guard's SHAPE; this measures
its effect under load.

Takes the sf1 documents table and rewrites a deliberate fraction of
documents to ONE identical boilerplate text — all their shingles agree,
so every band maps them to the SAME bucket (the mirror-farm / template-
page shape).  Then times ``minhash_lsh_candidates`` with the hot-bucket
guard ON (max_bucket=1000: oversized buckets stream their k²/2 pairs
through per-bucket join tasks) vs OFF (max_bucket=None: the k-row bucket
collects into ONE aggregation row and expands k²/2 struct pairs inside a
single task's buffer).

Prints one JSON line per scenario plus the observed hot-bucket share.
Run on an idle machine: ``python scripts/bench_lsh_skew.py [sf_dir]
[hot_frac]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdtable_spark.operators.dedup import minhash_lsh_candidates

    mod = max(2, int(round(1.0 / HOT_FRAC)))
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % mod == 0,
                F.lit(
                    "standard boilerplate navigation header terms privacy "
                    "cookie notice subscribe footer copyright all rights "
                    "reserved contact about sitemap"
                ),
            ).otherwise(F.col("text")),
        )
        .persist()
    )
    n_docs = docs.count()
    n_hot = docs.filter(F.col("doc_id") % mod == 0).count()
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_hot": n_hot,
                "hot_bucket_share": round(n_hot / n_docs, 4),
                "hot_pairs_per_band": n_hot * (n_hot - 1) // 2,
            }
        )
    )

    def timed(label, max_bucket):
        t0 = time.time()
        n = minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, max_bucket=max_bucket
        ).count()
        dt = time.time() - t0
        print(json.dumps({"scenario": label, "sec": round(dt, 3), "pairs": n}))
        return dt

    # warm the JVM on the guarded path once, untimed
    minhash_lsh_candidates(docs, num_hashes=16, bands=4, max_bucket=1000).count()
    timed("lsh_guard_on_max1000", 1000)
    timed("lsh_guard_off", None)
    timed("lsh_guard_on_max1000_rerun", 1000)


if __name__ == "__main__":
    main()
