"""Round-9 regression diagnosis (VERDICT r8 #1): are the r7→r8 extended
drifts operator code or bench-session context?

Git evidence first: the suspected pair-engine commits (53aaa6a, 87fa928)
land BEFORE the round-7 boundary commit (9b869d9), so BENCH_r07 already
measured them; dedup.py is byte-identical r7→r8 and the similarity.py r8
diff is purely additive — none of the four regressed queries' operator
code changed.  What DID change in the bench window: the warm-up +
extended list grew ~44 → 75 rows, all sharing one JVM.

This script measures the four flagged queries two ways in two FRESH
sessions with bench.py's exact session config:

- mode=isolated : warm the query itself once, then min-of-3.
- mode=loaded   : replicate the bench context — run the FULL
  HEADLINE+EXTENDED warm-up pass first, then min-of-3 of the four.

isolated ≈ r7 values + loaded ≈ r8 values ⇒ session-context regression
(JIT code-cache / broadcast-debris pressure from the grown warm-up), not
an operator regression.  Run each mode as its own process:

    python scripts/diagnose_regression.py isolated
    python scripts/diagnose_regression.py loaded
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGGED = [
    "embedding_lsh_topk",
    "dedup_winnow_pairs",
    "embedding_semantic_dedup",
    "stream_funnel_stateful",
]

R7 = {"embedding_lsh_topk": 1.221, "dedup_winnow_pairs": 1.765,
      "embedding_semantic_dedup": 1.718, "stream_funnel_stateful": 2.380}
R8 = {"embedding_lsh_topk": 1.911, "dedup_winnow_pairs": 2.034,
      "embedding_semantic_dedup": 2.189, "stream_funnel_stateful": 3.352}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "isolated"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    def table_bytes(entry):
        if os.path.isfile(entry):
            return os.path.getsize(entry)
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(entry, "**", "*.parquet"), recursive=True)
            if os.path.isfile(p)
        )

    largest = max(
        (table_bytes(p) for p in glob.glob(os.path.join(sf_dir, "*.parquet"))),
        default=128 << 20,
    )
    mpb = max(2 << 20, largest // int(cpus))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pdtable_spark-diagnose")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", str(mpb))
        .config("spark.sql.files.openCostInBytes", str(128 << 10))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pdtable_spark.queries.suite import QUERIES

    if mode == "loaded":
        # the bench's exact pre-timing context: one warm-up execution of
        # every headline+extended row (bench.py builds a few extra
        # serving rows; the registered set is the bulk of the context)
        import bench

        names = [n for n in bench.HEADLINE] + [
            n for n in bench.EXTENDED if n in QUERIES
        ]
        t0 = time.time()
        for n in names:
            QUERIES[n](spark, sf_dir).count()
        print(f"# warmup of {len(names)} rows took {round(time.time() - t0, 1)}s",
              file=sys.stderr)
    else:
        spark.range(64).repartition(int(cpus)).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        for n in FLAGGED:
            QUERIES[n](spark, sf_dir).count()  # per-query warm only

    out = {}
    for n in FLAGGED:
        best = None
        for _ in range(3):
            t0 = time.time()
            QUERIES[n](spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        out[n] = round(best, 3)
    print(json.dumps({
        "mode": mode,
        "timings": out,
        "vs_r7": {n: round(out[n] / R7[n], 2) for n in FLAGGED},
        "vs_r8": {n: round(out[n] / R8[n], 2) for n in FLAGGED},
    }))


if __name__ == "__main__":
    main()
