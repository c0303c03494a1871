"""Skew-stress benchmark: measure the hot-key pathologies the skew
toolkit exists for, and what each mitigation buys.

Builds a synthetic skewed dataset (one key owning ``HOT_FRACTION`` of all
rows — the celebrity-user / null-FK / empty-document shape), then times:

1. collect_list aggregation: plain vs salted_agg two-phase
2. fact⋈dim join on the skewed key: plain SMJ (AQE skew split) vs
   salted_join vs broadcast
3. AQE skew-join handling on/off for the plain join

Prints one JSON line per scenario; run on an idle machine
(``python scripts/bench_skew.py [n_rows]``).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
HOT_FRACTION = 0.5
N_KEYS = 10_000


def timed(label, df):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(json.dumps({"scenario": label, "sec": round(dt, 3), "rows": n}))
    return dt


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdtable_spark.operators.skew import salted_agg, salted_join

    # key 0 owns HOT_FRACTION of rows; the rest spread uniformly
    fact = (
        spark.range(N_ROWS)
        .withColumn(
            "k",
            F.when(F.col("id") % int(1 / HOT_FRACTION) == 0, F.lit(0)).otherwise(
                (F.xxhash64("id") % N_KEYS).cast("long")
            ),
        )
        .withColumn("v", (F.col("id") % 1000).cast("double"))
        .persist()
    )
    fact.count()
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    ).persist()
    dim.count()

    # 1. non-algebraic aggregation (collect_list cannot combine map-side)
    plain_agg = fact.groupBy("k").agg(F.size(F.collect_list("v")).alias("n"))
    salted = salted_agg(
        fact,
        ["k"],
        partial_aggs=[F.collect_list("v").alias("vs")],
        final_aggs=[F.size(F.flatten(F.collect_list("vs"))).alias("n")],
    )
    timed("agg_collect_plain", plain_agg)
    timed("agg_collect_salted", salted)

    # 2. join on the skewed key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("join_plain_aqe_skew_on", fact.join(dim, "k"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed("join_plain_aqe_skew_off", fact.join(dim, "k"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("join_salted", salted_join(fact, dim, ["k"], salt=16))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    timed("join_broadcast_dim", fact.join(F.broadcast(dim), "k"))


if __name__ == "__main__":
    main()
