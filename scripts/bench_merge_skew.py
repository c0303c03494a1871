"""Hot-key skew stress for the streaming CDC MERGE (VERDICT r12 task
#4): the upsert oracles pin WHAT the merge emits; this measures the
merge under a deliberately hot merge key at sf1.

Shape: a wave re-keys a ``hot_frac`` share of ALL orders onto ONE merge
key (each stamped ``seq=o_orderkey``, so last-writer-wins must reduce
the hot group to its max-seq row) and leaves the rest unique.  The skew
concentration point is the within-batch dedup — the full-outer MERGE
join itself never sees the skew, because after dedup the batch is
key-unique by construction.  Two measurements:

1. the DEDUP STEP in isolation, both spellings, min-of-2 warm:
   the shipped ``max(struct(seq, comps...))`` aggregate (partial
   map-side combine — the hot group shrinks before the shuffle) vs the
   pre-r13 ``row_number`` window (every hot duplicate shuffles into ONE
   window task; AQE cannot split a window partition);
2. the shipped END-TO-END merge (seed wave + skewed wave through
   ``upsert_stream``) so the whole path is priced under the skew.

Prints one JSON line per measurement.  Run on an idle machine:
``python scripts/bench_merge_skew.py [sf_dir] [hot_frac ...]``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
HOT_FRACS = [float(a) for a in sys.argv[2:]] or [0.0, 0.05, 0.25]


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
    from pdtable_spark.streaming.ingest import upsert_stream

    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .persist()
    )
    n = o.count()
    print(json.dumps({"sf_dir": SF_DIR, "n_orders": n}), flush=True)

    def wave(hot_frac):
        mod = 0 if hot_frac <= 0 else max(2, int(round(1.0 / hot_frac)))
        w = o.withColumn("seq", F.col("k"))
        if mod:
            w = w.withColumn(
                "k",
                F.when(F.col("k") % mod == 0, F.lit(-1).cast("long")).otherwise(
                    F.col("k")
                ),
            ).withColumn(
                "status",
                F.when(F.col("k") == -1, F.lit("H")).otherwise(F.col("status")),
            )
        return w

    def dedup_agg(w):
        return (
            w.groupBy("k")
            .agg(F.max(F.struct("seq", "status", "cents")).alias("__w"))
            .select("k", "__w.status", "__w.cents")
        )

    def dedup_window(w):
        win = Window.partitionBy("k").orderBy(
            F.desc("seq"), F.desc("status"), F.desc("cents")
        )
        return (
            w.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .select("k", "status", "cents")
        )

    # --- 1. the dedup step in isolation, min-of-2 warm ---------------------
    for frac in HOT_FRACS:
        w = wave(frac).persist()
        w.count()  # materialize the skewed input outside the timed region
        for label, fn in (("agg", dedup_agg), ("window", dedup_window)):
            best = None
            for _ in range(2):
                t0 = time.time()
                nk = fn(w).count()
                el = time.time() - t0
                best = el if best is None or el < best else best
            print(
                json.dumps(
                    {
                        "measure": "dedup_only",
                        "hot_frac": frac,
                        "dedup": label,
                        "sec": round(best, 2),
                        "n_unique_keys": nk,
                    }
                ),
                flush=True,
            )
        w.unpersist()

    # --- 2. the shipped end-to-end merge under the skew ---------------------
    for frac in HOT_FRACS:
        d = tempfile.mkdtemp(prefix="merge_skew_")
        try:
            land, tdir, cdir = f"{d}/land", f"{d}/table", f"{d}/log"
            seed = o.filter(F.col("k") % 2 == 0).withColumn(
                "seq", F.lit(0).cast("long")
            )
            seed.write.parquet(land, mode="append")
            s = spark.readStream.schema(
                "k long, status string, cents long, seq long"
            ).parquet(land)
            upsert_stream(s, tdir, cdir, f"{d}/ckpt", "k", seq_col="seq")
            wave(frac).write.parquet(land, mode="append")
            s = spark.readStream.schema(
                "k long, status string, cents long, seq long"
            ).parquet(land)
            t0 = time.time()
            upsert_stream(s, tdir, cdir, f"{d}/ckpt", "k", seq_col="seq")
            el = time.time() - t0
            n_log = (
                spark.read.parquet(cdir).filter(F.col("batch_id") == 1).count()
            )
            print(
                json.dumps(
                    {
                        "measure": "merge_e2e",
                        "hot_frac": frac,
                        "dedup": "agg (shipped)",
                        "sec": round(el, 2),
                        "n_log_rows_batch1": n_log,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
