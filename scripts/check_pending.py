"""Targeted oracle sweep over registered suite queries — the per-name
counterpart of scripts/check_oracles.py (which sweeps everything).

Usage: python scripts/check_pending.py [sf_dir] [query ...]
       (no query names = the round-11 block, queries/pending_r11.py, plus
        the staged queries/pending_r12.py entries; any suite or staged
        name can be passed explicitly)

Runs each (spark_fn, duckdb_sql) pair side-by-side and compares
sorted-by-column-name value tuples, exactly like the driver's gate.
Exit code 0 iff every requested query MATCHes.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pdtable_spark.queries.pending_r12 import PENDING_R12
    from pdtable_spark.queries.suite import ORACLES, QUERIES

    # default: the newest registered blocks (r12/r13, now in QUERIES)
    # plus the staged r14 entries — the rows most worth re-sweeping
    from pdtable_spark.queries.pending_r13 import PENDING_R13
    from pdtable_spark.queries.pending_r14 import PENDING_R14

    names = sys.argv[2:] or (
        list(PENDING_R12) + list(PENDING_R13) + list(PENDING_R14)
    )
    parts = os.environ.get("CHECK_ORACLES_PARTS", "8")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception:
            pass  # a scale dir may carry only the tables its queries read

    rc = 0
    for name in names:
        if name in QUERIES:
            fn, sql = QUERIES[name], ORACLES[name]
        elif name in PENDING_R14:
            fn, sql = PENDING_R14[name]
        elif name in PENDING_R13:
            fn, sql = PENDING_R13[name]
        else:
            sys.exit(
                f"unknown query {name!r}: not registered and not staged "
                "in pending_r13/pending_r14"
            )
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(sql)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
        ok = sorted(s_cols) == sorted(o_cols) and _key_rows(
            s_cols, s_rows
        ) == _key_rows(o_cols, o_rows)
        print(
            ("MATCH " if ok else "FAIL  ")
            + f"{name}: {len(s_rows)} vs {len(o_rows)} rows, {time.time() - t0:.1f}s",
            flush=True,
        )
        rc |= 0 if ok else 1
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
