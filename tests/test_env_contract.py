"""Environment contract: how THIS Spark build reads the events parquet.

Round-3 regression class: the testdata stores ``ts`` as parquet
TIMESTAMP(NANOS), and the way Spark surfaces that column shifted between
versions (legacy ``nanosAsLong`` bigint vs native ``timestamp_ntz``).  A
source adapter that hard-codes one arrival type silently corrupts every
event time when the reader behavior drifts.  These tests pin the contract
both adapters rely on: batch (``io/parquet.py``) and stream
(``streaming/windows.py``) must agree on the decoded values, whatever the
arrival type is.
"""

import shutil

from pdtable_spark.io.parquet import read_nanos_parquet
from pdtable_spark.streaming import read_events_stream, run_to_memory

SF_DIR = "/root/testdata/sf0.001"


def test_batch_ts_decodes_to_2024_epoch(spark):
    """Whatever dtype the reader surfaces, the decoded timestamps must land
    in the data's real range (2024), not 1970 (ns/µs confusion) and not
    beyond 2100 (µs read as ns)."""
    df = read_nanos_parquet(spark, f"{SF_DIR}/events.parquet")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    lo, hi = df.selectExpr("min(ts)", "max(ts)").first()
    assert lo.year >= 2000, f"ts decoded into the past: {lo}"
    assert hi.year <= 2100, f"ts decoded into the future: {hi}"


def test_stream_ts_equals_batch_ts(spark, tmp_path):
    """The streaming source must decode the exact same (event_id, ts) pairs
    as the batch reader — the invariant that silently broke in round 3."""
    d = tmp_path / "events_env"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    q = run_to_memory(
        read_events_stream(spark, str(d)).select("event_id", "ts"), "t_env_contract"
    )
    q.stop()
    got = {r.event_id: r.ts for r in spark.table("t_env_contract").collect()}
    want = {
        r.event_id: r.ts
        for r in read_nanos_parquet(spark, f"{SF_DIR}/events.parquet")
        .select("event_id", "ts")
        .collect()
    }
    assert len(got) == len(want)
    # collect() renders timestamp and timestamp_ntz to the same naive
    # datetimes under a UTC session tz — compare values directly
    assert got == want


def test_stream_explicit_ntz_schema_is_cast_to_timestamp(spark, tmp_path):
    """Documented contract: an EXPLICIT schema requesting timestamp_ntz for
    the event-time column still arrives as `timestamp` (watermarks reject
    ntz, so the cast is unconditional), with values unchanged under a UTC
    session tz.  Only the bigint ns→µs rewrite is probe-only."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    d = tmp_path / "events_ntz"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    batch = read_nanos_parquet(spark, f"{SF_DIR}/events.parquet")
    if dict(batch.dtypes)["ts"] != "timestamp_ntz":
        import pytest

        pytest.skip("this Spark build does not surface TIMESTAMP(NANOS) as ntz")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", TimestampNTZType()),
        ]
    )
    sdf = read_events_stream(spark, str(d), schema=schema)
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    q = run_to_memory(sdf.select("event_id", "ts"), "t_env_ntz")
    q.stop()
    got = {r.event_id: r.ts for r in spark.table("t_env_ntz").collect()}
    want = {r.event_id: r.ts for r in batch.select("event_id", "ts").collect()}
    assert got == want


def test_query_registry_contract():
    """The driver contract's invariants: every oracle belongs to a declared
    query, the rotation list is exactly the registry (no dups, no ghosts),
    and every oracle is syntactically valid DuckDB SQL against the fixture
    schemas (DESCRIBE — parse/bind only, no execution)."""
    import duckdb

    import __spark_entry__ as entry
    from pdtable_spark.queries.suite import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    ordered = list(entry.queries())
    assert len(ordered) == len(set(ordered))
    assert set(ordered) == set(QUERIES)
    assert list(entry.oracle_sql()) == [k for k in ordered if k in ORACLES]

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in ORACLES.items():
        try:
            con.execute(f"DESCRIBE {sql}")
        except Exception as exc:  # pragma: no cover - the assert carries it
            raise AssertionError(f"oracle for {name!r} fails to parse: {exc}")


def test_r8_block_oracles(spark):
    """The round-8 block (staged r7, registered r8) stays under its own
    correctness gate: each (spark, oracle) pair runs side-by-side at
    sf0.001 — row count, column names, and order-insensitive values must
    match (the driver's comparison, minus the pandas canonicalization
    layer) — and every entry must actually be REGISTERED in the suite."""
    import duckdb

    from pdtable_spark.queries.suite import ORACLES, QUERIES
    from pdtable_spark.queries.suite_r8 import R8_QUERIES

    for name, (fn, sql) in R8_QUERIES.items():
        assert QUERIES.get(name) is fn, f"{name} not registered"
        assert ORACLES.get(name) == sql, f"{name} oracle not registered"

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, R8_QUERIES)


def test_pending_r9_oracles(spark):
    """The round-9 block (staged r8, registered r9) stays under its own
    correctness gate: each (spark, oracle) pair runs side-by-side at
    sf0.001 — and every entry must actually be REGISTERED in the suite
    (the r8-block discipline)."""
    import duckdb

    from pdtable_spark.queries.pending_r9 import PENDING_R9
    from pdtable_spark.queries.suite import ORACLES, QUERIES

    for name, (fn, sql) in PENDING_R9.items():
        assert QUERIES.get(name) is fn, f"{name} not registered"
        assert ORACLES.get(name) == sql, f"{name} oracle not registered"

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R9)


def test_pending_r10_oracles(spark):
    """The round-10 block (staged r9, registered r10) stays under its
    own correctness gate: each (spark, oracle) pair runs side-by-side at
    sf0.001 — and every entry must actually be REGISTERED in the suite
    (the r8/r9-block discipline)."""
    import duckdb

    from pdtable_spark.queries.pending_r10 import PENDING_R10
    from pdtable_spark.queries.suite import ORACLES, QUERIES

    for name, (fn, sql) in PENDING_R10.items():
        assert QUERIES.get(name) is fn, f"{name} not registered"
        assert ORACLES.get(name) == sql, f"{name} oracle not registered"

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R10)


def test_pending_r11_oracles(spark):
    """The staged round-11 queries are under the correctness gate BEFORE
    registration (the suite_r8/pending_r9/pending_r10 staging
    discipline): each (spark, oracle) pair runs side-by-side at sf0.001
    in pytest, so staged queries cannot rot between rounds."""
    import duckdb

    from pdtable_spark.queries.pending_r11 import PENDING_R11

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R11)


def test_pending_r12_oracles(spark):
    """The staged round-12 queries are under the correctness gate BEFORE
    registration (the suite_r8/pending_r9/pending_r10/pending_r11
    staging discipline): each (spark, oracle) pair runs side-by-side at
    sf0.001 in pytest, so staged queries cannot rot between rounds."""
    import duckdb

    from pdtable_spark.queries.pending_r12 import PENDING_R12

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R12)


def test_pending_r13_oracles(spark):
    """The staged round-13 queries are under the correctness gate BEFORE
    registration (the suite_r8…pending_r12 staging discipline): each
    (spark, oracle) pair runs side-by-side at sf0.001 in pytest, so
    staged queries cannot rot between rounds."""
    import duckdb

    from pdtable_spark.queries.pending_r13 import PENDING_R13

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R13)


def test_pending_r14_oracles(spark):
    """The staged round-14 queries are under the correctness gate BEFORE
    registration (the suite_r8…pending_r13 staging discipline): each
    (spark, oracle) pair runs side-by-side at sf0.001 in pytest, so
    staged queries cannot rot between rounds."""
    import duckdb

    from pdtable_spark.queries.pending_r14 import PENDING_R14

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    _oracle_pair_gate(spark, con, PENDING_R14)


def _oracle_pair_gate(spark, con, entries):
    from scripts.check_oracles import oracle_dtype_problems, spark_dtype_problems

    for name, (fn, sql) in entries.items():
        sdf = fn(spark, "/root/testdata/sf0.001")
        # the driver-compat dtype gate (round-2 lesson) must hold BEFORE
        # registration, not surface as a red driver row after it
        assert not oracle_dtype_problems(con, sql), name
        assert not spark_dtype_problems(sdf), name
        got = sorted(map(tuple, sdf.collect()))
        cur = con.execute(sql)
        want = sorted(map(tuple, cur.fetchall()))
        assert [f.name for f in sdf.schema.fields] == [
            d[0] for d in cur.description
        ], name
        assert got == want, (name, got[:3], want[:3])
