"""Scale-utility tests: parquet metadata round-trip (incl. partitioned
writes), salted joins/aggs equivalence with unsalted plans."""

import pytest
from pyspark.sql import functions as F

from pdtable_spark.io.parquet import read_parquet, write_parquet
from pdtable_spark.operators.skew import salted_agg, salted_join, top_frequent_keys
from pdtable_spark.table import Table


@pytest.fixture
def places(spark):
    df = spark.createDataFrame(
        [("home", 0.0, 1), ("work", 14.5, 0), ("beach", 2.0, 1)],
        "place string, distance double, segment int",
    )
    t = Table(df, name="places", destinations={"all"})
    t._set_unit("distance", "km")
    return t


def test_parquet_round_trip(spark, places, tmp_path):
    path = str(tmp_path / "places.parquet")
    write_parquet(places, path)
    back = read_parquet(spark, path)
    assert back.name == "places"
    assert back.destinations == {"all"}
    assert back.column_metadata["distance"].unit == "km"
    assert places.equals(back)


def test_parquet_partitioned_write_prunes(spark, places, tmp_path):
    path = str(tmp_path / "places_part.parquet")
    write_parquet(places, path, partition_by=["segment"])
    back = read_parquet(spark, path)
    # unit survives even for the partition column (sidecar restore)
    assert back.column_metadata["distance"].unit == "km"
    assert back.count() == 3
    plan = back.df.filter(F.col("segment") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(segment" in plan


def test_salted_join_matches_plain(spark, sf_dir="/root/testdata/sf0.001"):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    plain = o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    salted = salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"], salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(left, right, ["k"], how="left", salt=4).collect()
    assert len(out) == 3
    assert {r.k: r.w for r in out} == {1: "x", 2: None, 3: None}


def test_salted_agg_collect(spark):
    df = spark.createDataFrame(
        [("hot", i % 5) for i in range(100)] + [("cold", 99)], "k string, v int"
    )
    out = salted_agg(
        df,
        ["k"],
        salt=8,
        partial_aggs=[F.collect_set("v").alias("vs")],
        final_aggs=[F.array_sort(F.array_distinct(F.flatten(F.collect_list("vs")))).alias("vs")],
    ).collect()
    got = {r.k: list(r.vs) for r in out}
    assert got == {"hot": [0, 1, 2, 3, 4], "cold": [99]}


def test_top_frequent_keys(spark):
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2 + [(None,)], "k string")
    rows = top_frequent_keys(df, "k", 2).collect()
    assert rows[0].k == "a" and rows[0].n_rows == 5


def test_write_csv_distributed_round_trip(spark, tmp_path):
    from pdtable_spark.io.csv import scan_csv, write_csv_distributed

    src = Table(
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet").repartition(4),
        name="nation",
    )
    out = str(tmp_path / "nation_csv")
    write_csv_distributed(src, out)
    import glob

    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) >= 2  # one StarTable file per partition
    with open(parts[0]) as f:
        assert f.readline().startswith("**nation;")
    back = scan_csv(spark, f"{out}/part-*", "nation")
    assert back.count() == src.count()
    got = {tuple(r) for r in back.df.select("n_nationkey", "n_name").collect()}
    want = {tuple(r) for r in src.df.select("n_nationkey", "n_name").collect()}
    assert got == want


def test_get_session_defaults():
    from pdtable_spark.session import get_session

    s = get_session()
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
    assert s.conf.get("spark.sql.session.timeZone") == "UTC"


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from pdtable_spark.operators.bucketing import (
        assert_no_shuffle,
        bucketed_join,
        write_bucketed,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", "o_orderkey", num_buckets=4)
    write_bucketed(l, "b_lineitem", "o_orderkey", num_buckets=4)
    try:
        j = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
        assert_no_shuffle(j)  # co-located: no exchange on either side
        assert j.count() == l.count()
        # and an aggregation on the bucket key also skips the shuffle
        agg = spark.table("b_lineitem").groupBy("o_orderkey").count()
        assert_no_shuffle(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


# ---------------------------------------------------------------------------
# pack_budget: the global path must be a two-phase cumsum, not one task
# ---------------------------------------------------------------------------


def _chunks_df(spark, n_docs=40, chunks_per_doc=5):
    rows = [
        (d, c, 10 + (d * 7 + c * 3) % 50)
        for d in range(n_docs)
        for c in range(chunks_per_doc)
    ]
    return spark.createDataFrame(rows, "doc_id long, chunk_idx long, chunk_n_tokens long")


def test_pack_budget_global_matches_single_window(spark):
    """Two-phase global cumsum must equal the naive unpartitioned window."""
    from pyspark.sql import Window

    from pdtable_spark.operators import text

    df = _chunks_df(spark)
    got = {
        (r.doc_id, r.chunk_idx): r.pack_id
        for r in text.pack_budget(df, capacity=100, num_partitions=7).collect()
    }
    w = Window.orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r.doc_id, r.chunk_idx): r.pack_id
        for r in df.withColumn(
            "pack_id",
            F.floor(
                (F.sum("chunk_n_tokens").over(w) - F.col("chunk_n_tokens")) / F.lit(100)
            ).cast("long"),
        ).collect()
    }
    assert got == want


def test_pack_budget_global_runs_on_many_partitions(spark):
    """The data path of the global cumsum must execute across multiple
    tasks — round 3's unpartitioned window collapsed it to one.  (AQE
    legitimately coalesces the tiny test shuffle, so pin it off here; the
    plan check proves the window itself is keyed, not SinglePartition.)"""
    from pdtable_spark.operators import text

    out = text.pack_budget(_chunks_df(spark), capacity=100, num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pid" in plan, plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = text.pack_budget(_chunks_df(spark), capacity=100, num_partitions=8)
        parts = out.rdd.glom().map(len).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert sum(1 for p in parts if p > 0) > 1, (
        f"global pack_budget ran on a single non-empty partition: {parts}"
    )


def test_pack_budget_partition_cols(spark):
    """Sharded spelling: pack ids restart per shard and never mix shards."""
    from pdtable_spark.operators import text

    df = _chunks_df(spark).withColumn("shard", (F.col("doc_id") % 4).cast("long"))
    out = text.pack_budget(
        df, capacity=100, order_cols=("doc_id", "chunk_idx"), partition_cols=("shard",)
    ).collect()
    assert {r.shard for r in out} == {0, 1, 2, 3}
    # within each shard, pack ids start at 0 and are contiguous
    for s in range(4):
        ids = sorted({r.pack_id for r in out if r.shard == s})
        assert ids[0] == 0
        assert ids == list(range(len(ids)))


def test_pack_budget_bounds_and_null_keys(spark):
    """r15 internals of the global path: (a) caller-supplied SUPERSET
    bounds yield identical pack ids to the self-measured ones (the
    monotone-bucketing invariance the bounds parameter relies on);
    (b) NULL leading keys survive (they bucket ahead of every value —
    a NULL _pid would be silently dropped by the offsets equi-join)."""
    from pyspark.sql import Window

    from pdtable_spark.operators import text

    df = _chunks_df(spark)
    base = {
        (r.doc_id, r.chunk_idx): r.pack_id
        for r in text.pack_budget(df, capacity=100).collect()
    }
    wide = {
        (r.doc_id, r.chunk_idx): r.pack_id
        for r in text.pack_budget(
            df, capacity=100, bounds=(-1_000_000, 5_000_000)
        ).collect()
    }
    assert base == wide

    with_null = spark.createDataFrame(
        [(None, 0, 70), (1, 0, 40), (2, 0, 80)],
        "doc_id long, chunk_idx long, chunk_n_tokens long",
    )
    got = text.pack_budget(with_null, capacity=100).collect()
    assert len(got) == 3  # the NULL-key row is not dropped
    w = Window.orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["doc_id"]: r["pack_id"]
        for r in with_null.withColumn(
            "pack_id",
            F.floor(
                (F.sum("chunk_n_tokens").over(w) - F.col("chunk_n_tokens"))
                / F.lit(100)
            ).cast("long"),
        ).collect()
    }
    assert {r["doc_id"]: r["pack_id"] for r in got} == want


def test_pack_budget_non_integral_key_falls_back(spark):
    """A non-integral leading order key cannot ride the value-range
    bucketing (no NaN-safe monotone split) — the sampled-range +
    checkpoint spelling must still produce the global order."""
    from pyspark.sql import Window

    from pdtable_spark.operators import text

    rows = [(f"doc{i:03d}", 0, 10 + (i * 7) % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, chunk_idx long, chunk_n_tokens long")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in text.pack_budget(df, capacity=100, num_partitions=5).collect()
    }
    w = Window.orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["doc_id"]: r["pack_id"]
        for r in df.withColumn(
            "pack_id",
            F.floor(
                (F.sum("chunk_n_tokens").over(w) - F.col("chunk_n_tokens"))
                / F.lit(100)
            ).cast("long"),
        ).collect()
    }
    assert got == want


# --- TF-IDF document frequency: skew-safe aggregate spelling ---------------


def _skewed_docs(spark, n=120):
    # "the" appears in EVERY doc (the stopword hot key); w{i%7} spreads the rest
    rows = [(i, f"the quick brown w{i % 7} w{i % 7} fox{i % 11}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def test_tfidf_aggregate_matches_window(spark):
    """Both df spellings must produce identical top-k results."""
    from pdtable_spark.operators import text

    docs = _skewed_docs(spark)
    agg = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in text.tfidf_keywords(docs, k=3, round_digits=6, df_mode="aggregate").collect()
    }
    win = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in text.tfidf_keywords(docs, k=3, round_digits=6, df_mode="window").collect()
    }
    assert agg == win and len(agg) > 0


def test_tfidf_aggregate_df_stage_is_partial_aggregated(spark):
    """The aggregate spelling's document-frequency stage must partially
    aggregate map-side (partial_count over the term key BEFORE the
    exchange) — the structural property that keeps a stopword term from
    collapsing into one task.  The window spelling, by contrast, buffers
    each term's postings inside a single WindowExec task (fine at bench
    scale, the documented 100× limitation)."""
    from pdtable_spark.operators import text

    docs = _skewed_docs(spark)
    plan = (
        text.tfidf_keywords(docs, k=3, df_mode="aggregate")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan, plan
    assert "hashpartitioning(term" in plan, plan
    # and the final per-term count must NOT be a single-partition exchange
    assert "SinglePartition" not in plan.split("Window")[0], plan


def test_tfidf_aggregate_df_stage_multi_task(spark):
    """Data-path proof: with AQE coalescing pinned off, the df aggregation
    of a maximally skewed corpus (every doc contains 'the') still executes
    across multiple non-empty tasks in aggregate mode."""
    from pdtable_spark.operators import text

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        docs = _skewed_docs(spark)
        toks = docs.select(
            F.col("doc_id"), F.explode(text.tokens(F.col("text"))).alias("term")
        )
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        # the df stage exactly as tfidf_keywords(df_mode="aggregate") builds it
        term_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        parts = term_df.rdd.glom().map(len).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert sum(1 for p in parts if p > 0) > 1, parts


def test_span_and_cdc_stages_parallelize(spark):
    """The span-dedup and CDC pipelines must distribute: with AQE
    coalescing off, the output of each lands on multiple non-empty
    partitions (no global window / single-task stage anywhere)."""
    from pdtable_spark.operators import dedup, text

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").repartition(8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        parts = dedup.span_dedup(docs).rdd.glom().map(len).collect()
        assert sum(1 for p in parts if p > 0) > 1, parts
        parts = text.cdc_chunks(docs).rdd.glom().map(len).collect()
        assert sum(1 for p in parts if p > 0) > 1, parts
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_cap_threshold_screen_bounds_window_input(spark):
    """The whole point of cap_per_source_threshold: the exact window's
    input (the screened frame) holds ~cap + n/buckets + 2n/accuracy rows
    per source, NOT the source — and the final kept set still equals the
    window spelling's."""
    from pdtable_spark.operators.sampling import (
        _cap_screened,
        cap_per_source,
        cap_per_source_threshold,
    )

    n, cap, buckets, accuracy = 5000, 10, 100, 10_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("src").alias("source"),
        (F.col("id") * 7 % 4999).cast("double").alias("score"),  # distinct-ish
    )
    screened = _cap_screened(df, cap, "score", "source", "doc_id", buckets, accuracy)
    n_screened = screened.count()
    bound = cap + n // buckets + 2 * n // accuracy + 2  # +ties slack
    assert n_screened <= bound, (n_screened, bound)
    assert n_screened >= cap  # superset guarantee floor
    e = sorted(r["doc_id"] for r in cap_per_source(df, cap, score_col="score").collect())
    t = sorted(
        r["doc_id"]
        for r in cap_per_source_threshold(
            df, cap, score_col="score", buckets=buckets, accuracy=accuracy
        ).collect()
    )
    assert t == e and len(e) == cap


def test_write_bucketed_overwrite_is_reactive(spark, tmp_path):
    """Overwrite semantics after the ADVICE r12 fix: a cataloged table
    is replaced by saveAsTable itself (no pre-emptive DROP), an ORPHANED
    managed location (in-memory catalog forgot the table, warehouse dir
    survived) is recovered reactively on LOCATION_ALREADY_EXISTS, and
    nothing is deleted before a write failure actually occurred."""
    import os

    from pdtable_spark.operators.bucketing import write_bucketed

    df = spark.range(100).selectExpr("id", "id % 7 as k")
    try:
        write_bucketed(df, "b_reactive", "k", num_buckets=2)
        assert spark.table("b_reactive").count() == 100
        # plain overwrite of a LIVE cataloged table — no DROP involved
        write_bucketed(df.limit(50), "b_reactive", "k", num_buckets=2)
        assert spark.table("b_reactive").count() == 50
        # simulate the orphan: forget the table but leave its location
        loc = spark.catalog.getDatabase(
            spark.catalog.currentDatabase()
        ).locationUri.replace("file:", "")
        spark.sql("DROP TABLE b_reactive")  # deletes the managed dir too
        orphan = os.path.join(loc, "b_reactive")
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "stale"), "w") as fh:
            fh.write("leftover")
        write_bucketed(df, "b_reactive", "k", num_buckets=2)
        assert spark.table("b_reactive").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS b_reactive")


def test_write_bucketed_view_conflicts_follow_spark_semantics(spark):
    """With the reactive ADVICE r12 fix there is no pre-emptive DROP, so
    name conflicts follow Spark's OWN saveAsTable semantics: mode
    "error" raises loudly and the existing VIEW survives untouched;
    mode "overwrite" replaces the object exactly as a plain
    saveAsTable would (native behavior, not a side effect of ours)."""
    import pytest

    from pdtable_spark.operators.bucketing import write_bucketed

    spark.sql("CREATE OR REPLACE VIEW b_view_guard AS SELECT 1 AS k")
    try:
        with pytest.raises(Exception, match="b_view_guard"):
            write_bucketed(
                spark.range(10).selectExpr("id", "id % 3 as k"),
                "b_view_guard",
                "k",
                num_buckets=2,
                mode="error",
            )
        # the view survived the refused write
        assert spark.table("b_view_guard").count() == 1
    finally:
        spark.sql("DROP VIEW IF EXISTS b_view_guard")
