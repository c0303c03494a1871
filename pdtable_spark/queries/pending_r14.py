"""Queries STAGED for round 14 — built, oracled, pytest-gated and
benched in round 13 (the ``suite_r8``…``pending_r13`` staging
discipline), registered under ``@q`` at the top of round 14.

Round-14 window arithmetic (write it into ``__spark_entry__._PRIORITY``
at registration time): after CORRECTNESS_r13 reports the r13 head-50,
the evidence ages are r13: 50, r9: 26, r10: 50, r11: 50, r12: 50 — so
the round-14 head-50 is the EIGHT entries in this file + the 26
remaining r9-evidence rows (CORRECTNESS_r09 report order) + the 16
oldest r10-evidence rows (CORRECTNESS_r10 report order) = 50 exactly;
mechanically, new ``_PRIORITY`` = [8 new] + current ``_PRIORITY[50:]``
+ current ``_PRIORITY[:50]`` (the r13-window rows rotate to the tail),
total 234.

Every entry here is ALREADY under the correctness gate:
``tests/test_env_contract.py::test_pending_r14_oracles`` runs each
(spark, oracle) pair side-by-side at sf0.001 in pytest, so staged
queries cannot rot before registration.

Each entry satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.pending_r11 import _ZBITS, _sql_interleave2
from pdtable_spark.queries.pending_r12 import _BLOOM_K, _BLOOM_M, _sql_bpos
from pdtable_spark.queries.suite import _SQL_TOKS, load, scratch_dir

#: name → (query fn, oracle sql): what round 14 registers.
PENDING_R14 = {}


# ---------------------------------------------------------------------------
# pack_budget's PARTITIONED production spelling under the value gate
# (VERDICT r12 task #6): the two-phase global cumsum is already oracled
# (pipeline_pack_budget, pipeline_e2e_curation); the 100 TB posture —
# per-shard packing where the cumulative sum is an ordinary partitioned
# window and pack_id restarts per shard (operators/text.py:340-344) —
# was pytest-only.  Here every chunk packs per SOURCE and the oracle
# restates the per-partition running sum in SQL.
# ---------------------------------------------------------------------------

R14_SQL_PACK_PARTITIONED = f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    meta AS (SELECT doc_id, toks, len(toks) AS L,
                    1 + CAST(floor((greatest(len(toks) - 50, 0) + 39) / 40) AS INT) AS n
             FROM t),
    ch AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS chunk_idx, L
           FROM meta),
    chunks AS (
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             CAST(least(L - chunk_idx*40, 50) AS BIGINT) AS chunk_n_tokens
      FROM ch
    ),
    j AS (
      SELECT d.source, c.doc_id, c.chunk_idx, c.chunk_n_tokens
      FROM chunks c JOIN documents d USING (doc_id)
    )
    SELECT source, doc_id, chunk_idx, chunk_n_tokens,
           CAST(floor((SUM(chunk_n_tokens) OVER (PARTITION BY source
                       ORDER BY doc_id, chunk_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - chunk_n_tokens) / 200.0) AS BIGINT) AS pack_id
    FROM j
"""


def r14_pipeline_pack_partitioned(spark, sf_dir):
    """Token-budget packing per SHARD — the spelling that actually runs
    at 100 TB: ``pack_budget(partition_cols=("source",))`` makes the
    running total an ordinary partitioned window (every source packs in
    parallel, no cross-partition coordination at all), with ``pack_id``
    restarting per source.  The oracle restates the per-source running
    sum, so a window that leaked rows across sources, mis-ordered
    within one, or got the overhang arithmetic wrong moves pack_id and
    fails the hash.

    Scale shape: one chunk explode (pure codegen), one hash join on
    doc_id to attach the shard key, ONE shuffle on source for the
    window — the global two-phase cumsum machinery never engages."""
    from pdtable_spark.operators import text

    d = load(spark, sf_dir, "documents")
    chunks = text.chunk_counts(d, chunk_tokens=50, overlap=10)
    ch = chunks.join(d.select("doc_id", "source"), "doc_id")
    packed = text.pack_budget(
        ch,
        capacity=200,
        order_cols=("doc_id", "chunk_idx"),
        partition_cols=("source",),
    )
    return packed.select(
        "source", "doc_id", "chunk_idx", "chunk_n_tokens", "pack_id"
    )


PENDING_R14["pipeline_pack_partitioned"] = (
    r14_pipeline_pack_partitioned,
    R14_SQL_PACK_PARTITIONED,
)


# ---------------------------------------------------------------------------
# The versioned file manifest under the value gate (VERDICT r12 task
# #3): build the lake + zone map + manifest, serve a pruned read
# validated against manifest generation 0, APPEND, refresh (which
# advances the manifest), and serve the post-refresh read — BOTH reads'
# file accounting plus the advanced generation travel inside the
# oracled row, so a manifest that lagged the refresh, double-advanced,
# or validated the wrong snapshot is a wrong hash.  The read path never
# lists the lake (pinned separately in pytest by monkeypatching
# _data_files to raise).
# ---------------------------------------------------------------------------

R14_SQL_LAKE_MANIFEST = f"""
    WITH o AS (
      SELECT o_custkey AS ck,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderkey % 2 AS phase
      FROM orders
    ),
    b AS (
      SELECT MIN(ck) AS lo1, MAX(ck) AS hi1,
             MIN(cents) AS lo2, MAX(cents) AS hi2
      FROM o
    ),
    k AS (
      SELECT ck, cents, phase,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((ck - lo1) * {1 << _ZBITS}) / (hi1 - lo1 + 1.0))
                    AS BIGINT))) AS b1,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((cents - lo2) * {1 << _ZBITS}) / (hi2 - lo2 + 1.0))
                    AS BIGINT))) AS b2
      FROM o CROSS JOIN b
    ),
    z AS (
      SELECT ck, cents, phase,
             ({_sql_interleave2('b1', 'b2', _ZBITS)}) >> {_ZBITS} AS z_file
      FROM k
    ),
    p AS (
      SELECT lo1 + CAST(FLOOR((hi1 - lo1) * 30 / 100.0) AS BIGINT) AS ck_lo,
             lo1 + CAST(FLOOR((hi1 - lo1) * 45 / 100.0) AS BIGINT) AS ck_hi,
             lo2 + CAST(FLOOR((hi2 - lo2) * 40 / 100.0) AS BIGINT) AS ce_lo,
             lo2 + CAST(FLOOR((hi2 - lo2) * 60 / 100.0) AS BIGINT) AS ce_hi
      FROM b
    ),
    fstats AS (
      SELECT z_file, phase, MIN(ck) AS min_ck, MAX(ck) AS max_ck,
             MIN(cents) AS min_ce, MAX(cents) AS max_ce
      FROM z GROUP BY z_file, phase
    ),
    kept0 AS (
      SELECT z_file FROM fstats CROSS JOIN p
      WHERE phase = 0
        AND NOT (max_ck < ck_lo OR min_ck > ck_hi)
        AND NOT (max_ce < ce_lo OR min_ce > ce_hi)
    ),
    kept1 AS (
      SELECT z_file, phase FROM fstats CROSS JOIN p
      WHERE NOT (max_ck < ck_lo OR min_ck > ck_hi)
        AND NOT (max_ce < ce_lo OR min_ce > ce_hi)
    ),
    ans0 AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM z CROSS JOIN p
      WHERE phase = 0
        AND ck BETWEEN ck_lo AND ck_hi AND cents BETWEEN ce_lo AND ce_hi
    ),
    ans1 AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM z CROSS JOIN p
      WHERE ck BETWEEN ck_lo AND ck_hi AND cents BETWEEN ce_lo AND ce_hi
    )
    SELECT CAST(1 AS BIGINT) AS generation,
           CAST((SELECT COUNT(*) FROM fstats WHERE phase = 0) AS BIGINT)
             AS n_files_total_0,
           CAST((SELECT COUNT(*) FROM kept0) AS BIGINT) AS n_files_read_0,
           CAST((SELECT n_orders FROM ans0) AS BIGINT) AS n_orders_0,
           CAST((SELECT COUNT(*) FROM fstats) AS BIGINT) AS n_files_total_1,
           CAST((SELECT COUNT(*) FROM kept1) AS BIGINT) AS n_files_read_1,
           CAST((SELECT n_orders FROM ans1) AS BIGINT) AS n_orders_1,
           CAST((SELECT sum_cents FROM ans1) AS BIGINT) AS sum_cents_1
"""


def r14_lake_manifest_read(spark, sf_dir):
    """The listing-free read lifecycle end-to-end under the value gate:
    phase-0 orders land clustered (one file per coarse Z-cell),
    ``write_zone_map`` builds the certificate, ``write_file_manifest``
    commits snapshot generation 0, and the first ``pruned_read``
    validates against THAT manifest (no lake listing on the read path —
    at 100 TB object stores the LIST is the slow, eventually-consistent
    part a versioned manifest exists to remove).  Phase-1 orders then
    APPEND; ``refresh_zone_map`` stats only the new files AND advances
    the manifest to generation 1; the second read serves the new
    snapshot.  Both reads' files-total/read accounting, the advanced
    generation, and the residual aggregate all travel in the oracled
    row — a manifest that lagged the refresh, double-advanced, or
    validated the wrong snapshot moves a column and fails the hash."""

    from pdtable_spark.io import maintenance as mnt

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (F.col("o_orderkey") % 2).alias("phase"),
    )
    row = o.agg(
        F.min("ck"), F.max("ck"), F.min("cents"), F.max("cents")
    ).collect()[0]
    lo1, hi1, lo2, hi2 = (int(v) for v in row)
    z = mnt.zorder_key(
        [
            mnt.int_bucket(F.col("ck"), lo1, hi1, _ZBITS),
            mnt.int_bucket(F.col("cents"), lo2, hi2, _ZBITS),
        ],
        _ZBITS,
    )
    keyed = o.withColumn("z_file", F.shiftright(z, _ZBITS))
    d = scratch_dir("lakemanifest")
    preds = {
        "ck": (lo1 + (hi1 - lo1) * 30 // 100, lo1 + (hi1 - lo1) * 45 // 100),
        "cents": (lo2 + (hi2 - lo2) * 40 // 100, lo2 + (hi2 - lo2) * 60 // 100),
    }
    (
        keyed.filter(F.col("phase") == 0)
        .drop("phase")
        .repartition(1 << _ZBITS, "z_file")
        .write.mode("overwrite")
        .partitionBy("z_file")
        .parquet(d)
    )
    mnt.write_zone_map(spark, d, ["ck", "cents"])
    mrep = mnt.write_file_manifest(spark, d)
    assert mrep["generation"] == 0
    pruned0, rep0 = mnt.pruned_read(
        spark, d, preds, stats=mnt.zone_map(spark, d, ["ck", "cents"])
    )
    n0 = pruned0.count()
    (
        keyed.filter(F.col("phase") == 1)
        .drop("phase")
        .repartition(1 << _ZBITS, "z_file")
        .write.mode("append")
        .partitionBy("z_file")
        .parquet(d)
    )
    mnt.refresh_zone_map(spark, d, ["ck", "cents"])
    _, gen = mnt._manifest_snapshot(spark, d)
    pruned1, rep1 = mnt.pruned_read(
        spark, d, preds, stats=mnt.zone_map(spark, d, ["ck", "cents"])
    )
    return pruned1.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders_1"),
        F.sum("cents").cast("long").alias("sum_cents_1"),
    ).select(
        F.lit(gen).cast("long").alias("generation"),
        F.lit(rep0["n_files_total"]).cast("long").alias("n_files_total_0"),
        F.lit(rep0["n_files_read"]).cast("long").alias("n_files_read_0"),
        F.lit(n0).cast("long").alias("n_orders_0"),
        F.lit(rep1["n_files_total"]).cast("long").alias("n_files_total_1"),
        F.lit(rep1["n_files_read"]).cast("long").alias("n_files_read_1"),
        "n_orders_1",
        "sum_cents_1",
    )


PENDING_R14["lake_manifest_read"] = (
    r14_lake_manifest_read,
    R14_SQL_LAKE_MANIFEST,
)


# ---------------------------------------------------------------------------
# Bloom point lookup, manifest-validated, with the SNAPSHOT-FRAME
# residual (isin_threshold=0 forces the broadcast-semi-join spelling —
# the production path for key sets past a few thousand, where a
# Column.isin literal would bloat plan construction; ADVICE r12
# medium).  Same probe semantics as lake_bloom_pruned_read but a
# different offset/width so the two rows cannot mask each other.
# ---------------------------------------------------------------------------

R14_SQL_MANIFEST_BLOOM = f"""
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS ck,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT MIN(okey) AS lo_k, MAX(okey) AS hi_k,
             MIN(ck) AS lo_c, MAX(ck) AS hi_c
      FROM o
    ),
    f AS (
      SELECT okey, ck, cents,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((okey - lo_k) * {1 << _ZBITS}) / (hi_k - lo_k + 1.0))
                    AS BIGINT))) AS b_file
      FROM o CROSS JOIN b
    ),
    keys AS (
      SELECT ck FROM (
        SELECT DISTINCT c_custkey AS ck FROM customer CROSS JOIN b
        WHERE c_custkey >= lo_c + CAST(FLOOR((hi_c - lo_c) * 23 / 100.0)
                                       AS BIGINT)
      ) ORDER BY ck LIMIT 7
    ),
    fk AS (SELECT DISTINCT b_file, ck FROM f),
    sidecar AS (
      SELECT DISTINCT b_file, pos FROM (
        SELECT b_file, {_sql_bpos("CAST(ck AS VARCHAR)", 0)} AS pos FROM fk
        UNION ALL
        SELECT b_file, {_sql_bpos("CAST(ck AS VARCHAR)", 1)} FROM fk
        UNION ALL
        SELECT b_file, {_sql_bpos("CAST(ck AS VARCHAR)", 2)} FROM fk
      )
    ),
    kpos AS (
      SELECT ck, {_sql_bpos("CAST(ck AS VARCHAR)", 0)} AS pos FROM keys
      UNION ALL
      SELECT ck, {_sql_bpos("CAST(ck AS VARCHAR)", 1)} FROM keys
      UNION ALL
      SELECT ck, {_sql_bpos("CAST(ck AS VARCHAR)", 2)} FROM keys
    ),
    kept AS (
      SELECT DISTINCT b_file FROM (
        SELECT s.b_file, kpos.ck
        FROM sidecar s JOIN kpos ON s.pos = kpos.pos
        GROUP BY s.b_file, kpos.ck
        HAVING COUNT(*) = {_BLOOM_K}
      )
    ),
    answer AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM f WHERE ck IN (SELECT ck FROM keys)
    )
    SELECT CAST(0 AS BIGINT) AS generation,
           CAST((SELECT COUNT(DISTINCT b_file) FROM f) AS BIGINT)
             AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(DISTINCT b_file) FROM f)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r14_lake_manifest_bloom_read(spark, sf_dir):
    """Bloom pruning served listing-free AND with the scalable residual:
    the lake is bucketed by order key (customer keys scatter — the
    un-zone-mappable shape), the Bloom sidecar and the generation-0
    manifest are committed, and ``bloom_pruned_read`` runs with
    ``isin_threshold=0`` so the exact residual is the broadcast LEFT
    SEMI join against the frozen key-snapshot frame — the spelling that
    survives million-key probe sets — while coverage validation reads
    the manifest, not a listing.  The oracle recomputes every md5
    position, the containment decision (false positives modeled, not
    idealized), the joined aggregate, and the generation."""

    from pdtable_spark.io import maintenance as mnt

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    row = o.agg(
        F.min("okey"), F.max("okey"), F.min("ck"), F.max("ck")
    ).collect()[0]
    lo_k, hi_k, lo_c, hi_c = (int(v) for v in row)
    keyed = o.withColumn(
        "b_file", mnt.int_bucket(F.col("okey"), lo_k, hi_k, _ZBITS)
    )
    d = scratch_dir("lakembloom")
    (
        keyed.repartition(1 << _ZBITS, "b_file")
        .write.mode("overwrite")
        .partitionBy("b_file")
        .parquet(d)
    )
    mnt.write_bloom_sidecar(
        spark, d, "ck", num_hashes=_BLOOM_K, num_bits=_BLOOM_M
    )
    mrep = mnt.write_file_manifest(spark, d)
    off = lo_c + (hi_c - lo_c) * 23 // 100
    keys = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= off)
        .select(F.col("c_custkey").alias("ck"))
        .distinct()
        .orderBy("ck")
        .limit(7)
    )
    got, rep = mnt.bloom_pruned_read(
        spark, d, "ck", keys,
        num_hashes=_BLOOM_K, num_bits=_BLOOM_M, isin_threshold=0,
    )
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(mrep["generation"]).cast("long").alias("generation"),
        F.lit(rep["n_files_total"]).cast("long").alias("n_files_total"),
        F.lit(rep["n_files_read"]).cast("long").alias("n_files_read"),
        F.lit(rep["n_files_skipped"]).cast("long").alias("n_files_skipped"),
        F.lit(rep["n_keys"]).cast("long").alias("n_keys"),
        "n_orders",
        "sum_cents",
    )


PENDING_R14["lake_manifest_bloom_read"] = (
    r14_lake_manifest_bloom_read,
    R14_SQL_MANIFEST_BLOOM,
)


# ---------------------------------------------------------------------------
# Dynamic file pruning with the snapshot-frame residual on the zone-map
# side: pruned_semi_read at isin_threshold=0 over a WIDER dimension
# slice (newest 10% of customers) — the semi-join residual is the
# production spelling once key sets outgrow an In literal, and the
# value gate proves it returns the same rows.
# ---------------------------------------------------------------------------

R14_SQL_SEMI_SNAPSHOT = f"""
    WITH o AS (
      SELECT o_custkey AS ck,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (SELECT MIN(ck) AS lo1, MAX(ck) AS hi1 FROM o),
    f AS (
      SELECT ck, cents,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((ck - lo1) * {1 << _ZBITS}) / (hi1 - lo1 + 1.0))
                    AS BIGINT))) AS k_file
      FROM o CROSS JOIN b
    ),
    keys AS (
      SELECT DISTINCT c_custkey AS k FROM customer CROSS JOIN b
      WHERE c_custkey >= hi1 - CAST(FLOOR((hi1 - lo1) * 10 / 100.0) AS BIGINT)
    ),
    fstats AS (
      SELECT k_file, MIN(ck) AS min_ck, MAX(ck) AS max_ck
      FROM f GROUP BY k_file
    ),
    kept AS (
      SELECT k_file FROM fstats
      WHERE EXISTS (SELECT 1 FROM keys
                    WHERE keys.k BETWEEN fstats.min_ck AND fstats.max_ck)
    ),
    answer AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM f WHERE ck IN (SELECT k FROM keys)
    )
    SELECT CAST((SELECT COUNT(*) FROM fstats) AS BIGINT) AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(*) FROM fstats)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r14_lake_semi_snapshot_keys(spark, sf_dir):
    """``pruned_semi_read`` with the snapshot-frame residual forced
    (``isin_threshold=0``): the newest 10% of customers decide the file
    scan set via footer-range bisect exactly as before, but the exact
    residual is the broadcast LEFT SEMI join against the frozen key
    snapshot instead of an In literal — identical rows (pinned by this
    oracle AND the targeted pytest equivalence), plan size O(1) in the
    key count.  The wider band vs lake_pruned_semi_read's 5% also
    exercises multi-file keeps."""

    from pdtable_spark.io import maintenance as mnt

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    row = o.agg(F.min("ck"), F.max("ck")).collect()[0]
    lo1, hi1 = int(row[0]), int(row[1])
    keyed = o.withColumn(
        "k_file", mnt.int_bucket(F.col("ck"), lo1, hi1, _ZBITS)
    )
    d = scratch_dir("lakesemisnap")
    (
        keyed.repartition(1 << _ZBITS, "k_file")
        .write.mode("overwrite")
        .partitionBy("k_file")
        .parquet(d)
    )
    keys = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= hi1 - (hi1 - lo1) * 10 // 100)
        .select(F.col("c_custkey").alias("ck"))
    )
    semi, rep = mnt.pruned_semi_read(spark, d, "ck", keys, isin_threshold=0)
    return semi.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(rep["n_files_total"]).cast("long").alias("n_files_total"),
        F.lit(rep["n_files_read"]).cast("long").alias("n_files_read"),
        F.lit(rep["n_files_skipped"]).cast("long").alias("n_files_skipped"),
        F.lit(rep["n_keys"]).cast("long").alias("n_keys"),
        "n_orders",
        "sum_cents",
    )


PENDING_R14["lake_semi_snapshot_keys"] = (
    r14_lake_semi_snapshot_keys,
    R14_SQL_SEMI_SNAPSHOT,
)


# ---------------------------------------------------------------------------
# Streaming MERGE under a HOT KEY (VERDICT r12 task #4's value-gate
# sibling: the sf1 load evidence lives in scripts/bench_merge_skew.py /
# BENCH_SCALE.md; this row keeps the skewed shape itself under the
# per-round oracle).  A quarter of the wave-2 traffic collapses onto
# ONE merge key; seq_col last-writer-wins must deterministically keep
# exactly the max-seq row, and the merge/changelog must stay exact
# around the skew.
# ---------------------------------------------------------------------------

R14_SQL_UPSERT_HOTKEY = """
    WITH o AS (
      SELECT o_orderkey AS k, o_orderstatus AS s,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(0 AS BIGINT) AS batch_id, 'added' AS change_type,
           k, s AS status, cents
    FROM o WHERE k % 2 = 0
    UNION ALL
    SELECT 1, 'added', CAST(-1 AS BIGINT), 'H',
           (SELECT cents FROM o WHERE k % 4 = 1 ORDER BY k DESC LIMIT 1)
    UNION ALL
    SELECT 1, 'changed', k, 'X', cents + 1 FROM o WHERE k % 8 = 0
    UNION ALL
    SELECT 1, 'added', k, s, cents FROM o WHERE k % 4 = 3
"""


def r14_stream_upsert_hotkey(spark, sf_dir):
    """The streaming MERGE with deliberate key skew under the value
    gate: wave 1 seeds every even order key; wave 2 funnels ALL
    ``%4==1`` orders onto the single merge key ``-1`` (each stamped
    ``seq=o_orderkey``, so last-writer-wins must keep exactly the
    max-seq row's values — the within-batch dedup window is where a
    hot key concentrates), re-sends ``%8==4`` rows IDENTICALLY (must
    emit no log row), updates ``%8==0`` rows (status X, bumped cents),
    and adds ``%4==3``.  The oracle states the exact change log for
    both batches including the hot key's surviving (status, cents) —
    a nondeterministic winner, a dropped update, or an echoed re-send
    all move rows."""

    from pdtable_spark.streaming.ingest import upsert_stream

    d = scratch_dir("upserthot")
    land, tdir, cdir = f"{d}/land", f"{d}/table", f"{d}/log"
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w1 = o.filter(F.col("k") % 2 == 0).withColumn("seq", F.lit(0).cast("long"))
    hot = (
        o.filter(F.col("k") % 4 == 1)
        .select(
            F.lit(-1).cast("long").alias("k"),
            F.lit("H").alias("status"),
            "cents",
            F.col("k").cast("long").alias("seq"),
        )
    )
    w2 = (
        hot
        .unionByName(
            o.filter(F.col("k") % 8 == 0)
            .withColumn("status", F.lit("X"))
            .withColumn("cents", F.col("cents") + 1)
            .withColumn("seq", F.lit(1).cast("long"))
        )
        .unionByName(
            o.filter(F.col("k") % 8 == 4).withColumn(
                "seq", F.lit(1).cast("long")
            )
        )
        .unionByName(
            o.filter(F.col("k") % 4 == 3).withColumn(
                "seq", F.lit(0).cast("long")
            )
        )
    )
    for w in (w1, w2):
        w.write.parquet(land, mode="append")
        s = spark.readStream.schema(
            "k long, status string, cents long, seq long"
        ).parquet(land)
        upsert_stream(s, tdir, cdir, f"{d}/ckpt", "k", seq_col="seq")
    return spark.read.parquet(cdir).select(
        F.col("batch_id").cast("long").alias("batch_id"),
        "change_type", "k", "status", "cents",
    )


PENDING_R14["stream_upsert_hotkey"] = (
    r14_stream_upsert_hotkey,
    R14_SQL_UPSERT_HOTKEY,
)


# ---------------------------------------------------------------------------
# The manifest WRITE-path diff under the value gate: generation 0 over
# the initial layout, then a dynamic partition overwrite replaces ONE
# bucket's file — the next manifest write must report exactly (1 added,
# 1 removed) at generation 1 with the total unchanged, and the lake
# aggregate reflects the rewritten bucket.  Covers the removal arm the
# append-only lifecycles never exercise.
# ---------------------------------------------------------------------------

R14_SQL_MANIFEST_DIFF = """
    WITH c AS (
      SELECT c_custkey AS k, c_custkey % 8 AS bucket,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    after AS (
      SELECT * FROM c WHERE bucket <> 3 OR k % 3 = 0
    )
    SELECT CAST(0 AS BIGINT) AS gen_0,
           CAST(8 AS BIGINT) AS n_files_0,
           CAST(1 AS BIGINT) AS gen_1,
           CAST(1 AS BIGINT) AS n_added_1,
           CAST(1 AS BIGINT) AS n_removed_1,
           CAST(8 AS BIGINT) AS n_files_1,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM after
"""


def r14_lake_manifest_diff(spark, sf_dir):
    """The manifest write path's diff accounting under the value gate:
    customers land one file per ``c_custkey % 8`` bucket (8 files —
    the deterministic repartition-then-partitionBy layout), manifest
    generation 0 commits; a DYNAMIC partition overwrite then replaces
    only bucket 3 (its k%3==0 keys survive — one new file, the old one
    gone), and the next ``write_file_manifest`` must report exactly
    (1 added, 1 removed) at generation 1 with 8 files total.  The
    post-rewrite lake aggregate ties the file bookkeeping to the data:
    a manifest that kept the stale file or missed the new one cannot
    produce these counts AND this sum."""

    from pdtable_spark.io import maintenance as mnt

    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 8).alias("bucket"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    d = scratch_dir("lakemdiff")
    (
        c.repartition(8, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(d)
    )
    m0 = mnt.write_file_manifest(spark, d)
    (
        c.filter((F.col("bucket") == 3) & (F.col("k") % 3 == 0))
        .repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(d)
    )
    m1 = mnt.write_file_manifest(spark, d)
    lake = spark.read.parquet(d)
    return lake.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(m0["generation"]).cast("long").alias("gen_0"),
        F.lit(m0["n_files"]).cast("long").alias("n_files_0"),
        F.lit(m1["generation"]).cast("long").alias("gen_1"),
        F.lit(m1["n_added"]).cast("long").alias("n_added_1"),
        F.lit(m1["n_removed"]).cast("long").alias("n_removed_1"),
        F.lit(m1["n_files"]).cast("long").alias("n_files_1"),
        "n_rows",
        "sum_cents",
    )


PENDING_R14["lake_manifest_diff"] = (
    r14_lake_manifest_diff,
    R14_SQL_MANIFEST_DIFF,
)


# ---------------------------------------------------------------------------
# Curriculum-learning data ordering under the value gate: phase = how
# many exact interpolated quantile thresholds of the difficulty score
# the row strictly exceeds — NO global NTILE/sort (the every-row-
# through-one-task shape), one percentile aggregate + a scan-local
# comparison.  The oracle restates thresholds with quantile_cont (the
# identical interpolation formula, parity proven since
# q_quantity_percentiles) and the same strict comparison.
# ---------------------------------------------------------------------------

R14_SQL_CURRICULUM = f"""
    WITH s AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS score
      FROM documents
    ),
    t AS (
      SELECT quantile_cont(score, 0.25) AS q1,
             quantile_cont(score, 0.50) AS q2,
             quantile_cont(score, 0.75) AS q3
      FROM s
    ),
    p AS (
      SELECT doc_id, score,
             CAST(score > q1 AS INT) + CAST(score > q2 AS INT)
               + CAST(score > q3 AS INT) AS phase
      FROM s CROSS JOIN t
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score) AS BIGINT) AS n_tokens,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM p GROUP BY phase ORDER BY phase
"""


def r14_pipeline_curriculum(spark, sf_dir):
    """The length-curriculum schedule under the value gate: documents
    tier into four difficulty phases by whitespace token count
    (``curriculum_phases`` — exact interpolated quantile thresholds,
    strict-exceed counting, no global sort), and
    ``curriculum_schedule`` reduces each phase to the (n_docs,
    n_tokens, score range) row a trainer sizes its stages from.  A
    threshold computed wrong, a boundary row phased differently, or a
    leaked comparison all move a phase population and fail the hash."""
    from pdtable_spark.operators.sampling import curriculum_schedule
    from pdtable_spark.operators.text import token_count

    d = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("score")
    )
    return curriculum_schedule(d, "score", n_phases=4)


PENDING_R14["pipeline_curriculum"] = (
    r14_pipeline_curriculum,
    R14_SQL_CURRICULUM,
)


# ---------------------------------------------------------------------------
# Per-SOURCE curriculum under the value gate — the production shape
# (per-language/per-domain curricula): each source phases against its
# OWN quantile thresholds via one group-domain percentile aggregate
# broadcast back onto the scan.  The oracle restates the per-source
# thresholds with quantile_cont and the same strict-exceed counting.
# ---------------------------------------------------------------------------

R14_SQL_CURRICULUM_BY = f"""
    WITH s AS (
      SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS BIGINT) AS score
      FROM documents
    ),
    t AS (
      SELECT source,
             quantile_cont(score, 0.25) AS q1,
             quantile_cont(score, 0.50) AS q2,
             quantile_cont(score, 0.75) AS q3
      FROM s GROUP BY source
    ),
    p AS (
      SELECT s.source, doc_id, score,
             CAST(score > q1 AS INT) + CAST(score > q2 AS INT)
               + CAST(score > q3 AS INT) AS phase
      FROM s JOIN t USING (source)
    )
    SELECT source, CAST(phase AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score) AS BIGINT) AS n_tokens
    FROM p GROUP BY source, phase ORDER BY source, phase
"""


def r14_pipeline_curriculum_by_source(spark, sf_dir):
    """Per-source length curricula under the value gate: every source
    tiers its documents against its OWN interpolated quantile
    thresholds (``curriculum_phases_by`` — one |sources|-row percentile
    aggregate broadcast onto the scan; a verbose source cannot crowd a
    terse one out of its hard phases), reduced to the per-(source,
    phase) schedule.  A joint-threshold bug, a group mix-up in the
    broadcast join, or a boundary-row drift all move a population."""
    from pdtable_spark.operators.sampling import curriculum_phases_by
    from pdtable_spark.operators.text import token_count

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source",
        token_count(F.col("text")).cast("long").alias("score"),
    )
    return (
        curriculum_phases_by(d, "score", "source", n_phases=4)
        .groupBy("source", "phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("score").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "phase")
    )


PENDING_R14["pipeline_curriculum_by_source"] = (
    r14_pipeline_curriculum_by_source,
    R14_SQL_CURRICULUM_BY,
)
