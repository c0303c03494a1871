"""Single-node throughput: this engine vs the reference implementation on
the SAME StarTable CSV workload (the reference publishes no numbers —
BASELINE.md — so we measure it directly).

Workload: lineitem at $SPARK_GRAFT_SF_DIR rendered as StarTable CSV
(one **lineitem block per file, N files).  Three measurements:

1. reference ``pdtable.read_csv``  (pandas, single thread — its only mode)
2. our driver-side ``read_csv(to='parsed')``  (same single-thread grain)
3. our distributed ``scan_csv`` on local[$SPARK_GRAFT_CPUS]

Prints one JSON line: {"rows": N, "ref_sec": a, "ours_driver_sec": b,
"ours_spark_sec": c, "speedup_vs_ref": a/c}.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_FILES = int(os.environ.get("N_FILES", CPUS))
OUT = "/tmp/pdtable_bench_csv"


def render_files() -> int:
    """lineitem parquet → N StarTable CSV files; returns total rows."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, "
        f"l_discount, l_returnflag, CAST(l_shipdate AS VARCHAR) AS l_shipdate "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    os.makedirs(OUT, exist_ok=True)
    header = (
        "**lineitem;\nall\n"
        "l_orderkey;l_partkey;l_suppkey;l_quantity;l_extendedprice;l_discount;l_returnflag;l_shipdate\n"
        "-;-;-;-;-;-;text;datetime\n"
    )
    per = (len(rows) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        chunk = rows[i * per : (i + 1) * per]
        with open(f"{OUT}/part-{i:04d}.csv", "w") as f:
            f.write(header)
            for r in chunk:
                f.write(";".join(str(v) for v in r) + "\n")
            f.write("\n")
    return len(rows)


def time_reference() -> float:
    sys.path.insert(0, "/root/reference")
    import pdtable as ref

    t0 = time.time()
    n = 0
    for i in range(N_FILES):
        for _k, _b in ref.read_csv(f"{OUT}/part-{i:04d}.csv"):
            n += 1
    el = time.time() - t0
    assert n == N_FILES
    return el


def time_ours_driver() -> float:
    from pdtable_spark.io.csv import read_csv
    from pdtable_spark.parsers.blocks import BlockType

    t0 = time.time()
    n = 0
    for i in range(N_FILES):
        for k, _b in read_csv(f"{OUT}/part-{i:04d}.csv", to="parsed"):
            if k == BlockType.TABLE:
                n += 1
    el = time.time() - t0
    assert n == N_FILES
    return el


def time_ours_spark(expect_rows: int) -> float:
    from pdtable_spark.session import get_session
    from pdtable_spark.io.csv import scan_csv

    spark = get_session("bench-vs-ref")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Python/Arrow workers (not timed)
    spark.range(1000).count()
    spark.range(64).repartition(int(CPUS)).mapInPandas(lambda it: it, "id long").count()
    t0 = time.time()
    t = scan_csv(spark, f"{OUT}/part-*.csv", "lineitem")
    n = t.df.count()
    el = time.time() - t0
    assert n == expect_rows, (n, expect_rows)
    return el


def main():
    rows = render_files()
    ref_sec = time_reference()
    ours_driver = time_ours_driver()
    ours_spark = time_ours_spark(rows)
    print(
        json.dumps(
            {
                "rows": rows,
                "n_files": N_FILES,
                "ref_sec": round(ref_sec, 2),
                "ours_driver_sec": round(ours_driver, 2),
                "ours_spark_sec": round(ours_spark, 2),
                "speedup_vs_ref": round(ref_sec / ours_spark, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
