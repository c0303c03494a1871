"""Generate bench-grade sf1 data (10× sf0.1) by key-offset replication.

Correctness runs use the driver-provided testdata unmodified; this larger
set exists ONLY to measure scaling behavior one order of magnitude up
(VERDICT r1 item 6).  Replicas offset every join key consistently so query
selectivities and join fan-outs stay realistic; documents get a per-replica
text suffix and embeddings a tiny first-dimension jitter so dedup/ANN
workloads don't degenerate into pure duplicate explosions.

Usage: python scripts/make_sf1.py [out_dir]   (default .benchdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
R = 10  # replication factor
OFF = 100_000_000  # key offset per replica (above any base key)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def gen(table: str, select: str):
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'), "
            f"range({R}) t(r)) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimension tables pass through unreplicated
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    gen("customer", f"c_custkey + r*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen(
        "orders",
        f"o_orderkey + r*{OFF} AS o_orderkey, o_custkey + r*{OFF} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    gen(
        "lineitem",
        f"l_orderkey + r*{OFF} AS l_orderkey, l_partkey + r*{OFF} AS l_partkey, "
        f"l_suppkey + r*{OFF} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    gen("part", f"p_partkey + r*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    gen("supplier", f"s_suppkey + r*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen(
        "events",
        # TIMESTAMP_NS matches the driver testdata's physical type, so the
        # engine exercises the same ns->us read path at sf1
        f"event_id + r*{OFF} AS event_id, CAST(ts AS TIMESTAMP_NS) AS ts, "
        f"user_id + r*{OFF} AS user_id, event_type, value, props",
    )
    gen(
        "documents",
        f"doc_id + r*{OFF} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE text || ' r' || CAST(r AS VARCHAR) END AS text, "
        "lang, source, n_chars",
    )
    gen(
        "embeddings",
        f"vec_id + r*{OFF} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "list_prepend(CAST(embedding[1] + r * 0.001 AS FLOAT), embedding[2:]) END AS embedding, "
        "label",
    )


if __name__ == "__main__":
    main()
