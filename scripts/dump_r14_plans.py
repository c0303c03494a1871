"""Dump `.explain("formatted")` for the round-14-touched queries into
/root/repo/plans/r14/<query>_<tag>.txt  (tag = before|after).

Usage: python scripts/dump_r14_plans.py <tag> [query ...]
Run from the repo root whose code should produce the plans (the r13
clone for "before", the working tree for "after"); output always lands
in /root/repo/plans/r14/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUT_DIR = "/root/repo/plans/r14"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: queries touched this round (kept in sync with OPTIMIZATION_r14.md)
DEFAULT = [
    "minhash_candidates",
    "text_fingerprint",
    "dedup_skewed_buckets",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from pdtable_spark.session import get_session

    spark = get_session("r14-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    from pdtable_spark.operators import dedup
    from pdtable_spark.queries.suite import QUERIES, load

    Q = dict(QUERIES)
    # the bench's production-hash minhash spelling (the headline cell)
    Q["minhash_candidates"] = lambda s, d: dedup.minhash_dedup(
        load(s, d, "documents"), num_hashes=16, bands=4, jaccard_threshold=0.5
    )
    for mod in ("pending_r12", "pending_r14"):
        m = __import__(f"pdtable_spark.queries.{mod}", fromlist=["*"])
        for name, (fn, _sql) in getattr(m, f"PENDING_{mod[-3:].upper()}", {}).items():
            Q.setdefault(name, fn)

    for name in names:
        df = Q[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
