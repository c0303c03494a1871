"""Queries STAGED for round 13 — built, oracled, pytest-gated and
benched in round 12 (the ``suite_r8``…``pending_r12`` staging
discipline), registered under ``@q`` at the top of round 13.

Round-13 window arithmetic (write it into ``__spark_entry__._PRIORITY``
at registration time): after CORRECTNESS_r12 reports the r12 head-50,
the evidence ages are r12: 50, r8: 17, r9: 50, r10: 50, r11: 50 — so
the round-13 head-50 is the NINE entries in this file + the 17
remaining r8-evidence rows (CORRECTNESS_r08 report order, starting at
``pipeline_snapshot_diff``) + the 24 oldest r9-evidence rows
(CORRECTNESS_r09 report order) = 50 exactly; mechanically, new
``_PRIORITY`` = [9 new] + current ``_PRIORITY[50:]`` + current
``_PRIORITY[:50]`` (the r12-window rows rotate to the tail), total 226.

Every entry here is ALREADY under the correctness gate:
``tests/test_env_contract.py::test_pending_r13_oracles`` runs each
(spark, oracle) pair side-by-side at sf0.001 in pytest, so staged
queries cannot rot before registration.

Each entry satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.suite import (
    _GOPHER_MIN_WORDS,
    _IVF_CELLS,
    _SEMDEDUP_THRESHOLD,
    _SQL_TOKS,
    _sql_band_index,
    _sql_cos_ns,
    _sql_dist2,
    _sql_gopher_ok,
    load,
    scratch_dir,
)

#: name → (query fn, oracle sql): what round 13 registers.
PENDING_R13 = {}


# ---------------------------------------------------------------------------
# The composed end-to-end curation DAG (VERDICT r11 task #4): every stage
# is individually registered and value-oracled, but the 100 TB story is
# the CHAINED lineage — ingest → Gopher gate → exact dedup → MinHash-LSH
# → semantic dedup → per-source mixture cap → chunk → token-budget pack →
# logical shard accounting — run as ONE job, so plan-size / driver-latency
# regressions across operator boundaries get caught the way
# multimodal_audio_meta's 26 s plan-analysis bug was.  The oracle chains
# the SAME stage spellings the individual queries already pin
# (dedup_exact's keep-min, dedup_incremental's band CTE,
# embedding_semantic_dedup's cell prune, pipeline_source_cap's window,
# pipeline_pack_budget's running-sum pack) through one SQL expression.
# ---------------------------------------------------------------------------

_E2E_CAP = 40  # per-source mixture cap (keep each source's best 40 by n_chars)
_E2E_SHARDS = 4  # logical shard fan-out of the packed work units

#: cache handles of the LAST e2e invocation: harness callers (bench
#: loops, oracle sweeps, the driver) call the query fn repeatedly and
#: never touch the result's unpersist attributes, so each call evicts
#: its predecessor's persisted intermediates here — the session never
#: holds more than one generation (a prior result still in flight just
#: recomputes; correctness is unaffected).
_E2E_LAST_HANDLES: list = []

R13_SQL_E2E_CURATION = f"""
    WITH {_sql_band_index(16, 4)},
    ok AS (
      SELECT doc_id, text, source, n_chars FROM documents
      WHERE {_sql_gopher_ok("text")}
    ),
    kx AS (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM ok GROUP BY 1),
    ex AS (SELECT ok.* FROM ok
           JOIN kx ON kx.keep_id = ok.doc_id AND kx.h = md5(ok.text)),
    coll AS (
      SELECT DISTINCT hb.doc_id
      FROM bands hb JOIN bands lb
        ON lb.band = hb.band AND lb.bucket = hb.bucket
       AND lb.doc_id < hb.doc_id
      WHERE hb.doc_id IN (SELECT doc_id FROM ex)
        AND lb.doc_id IN (SELECT doc_id FROM ex)
    ),
    lsh AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM coll)),
    cvec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings
             WHERE vec_id IN (SELECT doc_id FROM lsh)),
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
             FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    cd AS (
      SELECT cvec.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY cvec.vec_id
                                ORDER BY {_sql_dist2('ca', 'ce')}, cent.cid)
               AS rn
      FROM cvec CROSS JOIN cent
    ),
    bb AS (
      SELECT cvec.vec_id, ca, cid AS cell
      FROM cvec JOIN (SELECT vec_id, cid FROM cd WHERE rn = 1) a USING (vec_id)
    ),
    sdrop AS (
      SELECT DISTINCT y.vec_id
      FROM bb x JOIN bb y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {_sql_cos_ns('x.ca', 'y.ca')}
            >= CAST({_SEMDEDUP_THRESHOLD!r} AS DOUBLE)
    ),
    sem AS (SELECT * FROM lsh WHERE doc_id NOT IN (SELECT vec_id FROM sdrop)),
    rr AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY CAST(n_chars AS DOUBLE) DESC,
                                         doc_id ASC) AS rn
      FROM sem
    ),
    mix AS (SELECT doc_id, text FROM rr WHERE rn <= {_E2E_CAP}),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM mix),
    meta AS (
      SELECT doc_id, len(toks) AS L,
             1 + CAST(floor((greatest(len(toks) - 50, 0) + 39) / 40) AS INT)
               AS n
      FROM t
    ),
    ch AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS chunk_idx, L
           FROM meta),
    chunks AS (
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             CAST(least(L - chunk_idx * 40, 50) AS BIGINT) AS ck
      FROM ch
    ),
    packed AS (
      SELECT doc_id, chunk_idx, ck,
             CAST(floor((SUM(ck) OVER (ORDER BY doc_id, chunk_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - ck) / 200.0) AS BIGINT) AS pack_id
      FROM chunks
    )
    SELECT pack_id, CAST(pack_id % {_E2E_SHARDS} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(ck) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM packed GROUP BY pack_id
"""


def r13_pipeline_e2e_curation(spark, sf_dir):
    """The full curation recipe as ONE chained lineage: Gopher quality
    gate → exact dedup (keep-min per md5 digest) → MinHash-LSH greedy
    bucket dedup (drop on collision with a smaller surviving id; md5_60
    so DuckDB rebuilds identical buckets) → SemDeDup semantic prune over
    the survivors' embeddings (fixed seed centroids) → per-source
    mixture cap (best 40 by n_chars) → 50-token chunks → 200-token packs
    → per-pack shard accounting.

    Scale shape of the composition: the gate is scan-local codegen, both
    dedups shuffle digests/buckets (never documents), the semantic prune
    is Σ|cell|² inside cells, the cap is one per-source window, and the
    pack is the documented global-running-sum work unit (shard by key at
    100 TB — pipeline_pack_budget's scale note applies verbatim).  The
    value oracle chains the SAME stage spellings the individual queries
    pin, so a drift in ANY stage moves pack membership and fails the
    hash."""
    from pyspark import StorageLevel

    from pdtable_spark.operators import dedup, sampling, similarity, text

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    # r14 opt: the gate is an inline predicate (identical metric
    # expressions via text.gopher_pass_all), not a flags-frame semi join —
    # one corpus scan instead of two plus a doc_id join, same survivors
    ok = docs.filter(text.gopher_pass_all(min_words=_GOPHER_MIN_WORDS))
    # the exact-dedup survivors and the band index are each referenced by
    # MULTIPLE downstream branches (the LSH self-join's two sides, the
    # embedding semi join, the post-semantic outer side) — persist the two
    # bounded intermediates once instead of re-running the gate + digest
    # lineage per branch (the semantic_dedup persist-index idiom; measured
    # 13.5 s → ~5 s warm at sf0.1).  Lifecycle: exposed on the result as
    # ``e2e_survivors_index`` / ``e2e_band_index`` for the caller to
    # unpersist; repeated harness calls evict the previous generation via
    # _E2E_LAST_HANDLES so the cache footprint is bounded at one run.
    while _E2E_LAST_HANDLES:
        _E2E_LAST_HANDLES.pop().unpersist()
    ex = dedup.exact_dedup_keep_first(ok).persist(StorageLevel.MEMORY_AND_DISK)

    bb = dedup.band_buckets(ex, num_hashes=16, bands=4, hash_fn="md5_60").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    coll = (
        bb.alias("hb")
        .join(
            bb.alias("lb"),
            (F.col("lb.band") == F.col("hb.band"))
            & (F.col("lb.bucket") == F.col("hb.bucket"))
            & (F.col("lb.doc_id") < F.col("hb.doc_id")),
        )
        .select(F.col("hb.doc_id").alias("doc_id"))
        .distinct()
    )
    lsh = ex.join(coll, "doc_id", "anti")

    cents = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    embedded = emb.join(
        lsh.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    surv = similarity.semantic_dedup(
        embedded, cents, threshold=_SEMDEDUP_THRESHOLD
    )
    # docs WITHOUT an embedding row pass through: you cannot semantically
    # dedup what you did not embed (and the embeddings table need not
    # cover every doc — it doesn't at sf1).  The drop set is embedded
    # minus survivors, anti-joined back, exactly the oracle's NOT IN.
    dropped = embedded.select(F.col("vec_id").alias("doc_id")).join(
        surv.select(F.col("vec_id").alias("doc_id")), "doc_id", "anti"
    )
    sem = lsh.join(dropped, "doc_id", "anti")

    mix = sampling.cap_per_source(
        sem.select(
            "doc_id", "source", "text", F.col("n_chars").cast("double").alias("score")
        ),
        _E2E_CAP,
        score_col="score",
    )
    # r14 opt: counts-only chunk spelling (identical rows; chunk_text was
    # built per chunk and immediately dropped — 1.6 s single-task CPU)
    chunks = text.chunk_counts(mix, chunk_tokens=50, overlap=10)
    # r15 opt: pack bounds from a column-pruned scan of the RAW table (a
    # superset of the surviving doc_id domain gives identical pack ids —
    # pack_budget docstring) instead of pack_budget's own bounds pass
    # over the whole gate→dedup→cap→tokenize lineage; together with the
    # checkpoint-free pack this leaves ONE compute of the deep upstream
    db = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    packed = text.pack_budget(
        chunks,
        capacity=200,
        order_cols=("doc_id", "chunk_idx"),
        bounds=(db[0], db[1]),
    )
    out = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("chunk_n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    result = out.select(
        F.col("pack_id").cast("long").alias("pack_id"),
        (F.col("pack_id") % _E2E_SHARDS).cast("long").alias("shard_id"),
        "n_chunks",
        "n_tokens",
        "n_docs",
    )
    result.e2e_survivors_index = ex
    result.e2e_band_index = bb
    _E2E_LAST_HANDLES.extend([ex, bb])
    return result


PENDING_R13["pipeline_e2e_curation"] = (
    r13_pipeline_e2e_curation,
    R13_SQL_E2E_CURATION,
)


# ---------------------------------------------------------------------------
# Sidecar REFRESH lifecycles under the value gate (round-12 engineering:
# refresh_bloom_sidecar + crash-safe swaps): the r12 rows prove the
# build→read leg; these prove the append→INCREMENTAL-refresh→read leg —
# the posture a 100 TB lake with append cadence actually runs.  Layout
# and oracle construction follow lake_pruned_read / lake_bloom_pruned_read
# (pending_r12), with the lake written in TWO phases so each (bucket,
# phase) pair is one deterministic file and the oracle can restate the
# refreshed sidecar as arithmetic.
# ---------------------------------------------------------------------------

from pdtable_spark.queries.pending_r11 import _ZBITS, _sql_interleave2  # noqa: E402
from pdtable_spark.queries.pending_r12 import _BLOOM_K, _BLOOM_M, _sql_bpos  # noqa: E402

R13_SQL_LAKE_ZONE_REFRESH = f"""
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
    kept AS (
      SELECT z_file, phase FROM fstats CROSS JOIN p
      WHERE NOT (max_ck < ck_lo OR min_ck > ck_hi)
        AND NOT (max_ce < ce_lo OR min_ce > ce_hi)
    ),
    answer AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM z CROSS JOIN p
      WHERE ck BETWEEN ck_lo AND ck_hi AND cents BETWEEN ce_lo AND ce_hi
    )
    SELECT CAST((SELECT COUNT(*) FROM fstats) AS BIGINT) AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(*) FROM fstats)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(*) FROM fstats WHERE phase = 1) AS BIGINT)
             AS n_files_added,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r13_lake_zone_refresh_read(spark, sf_dir):
    """The zone map's APPEND lifecycle end-to-end under the value gate:
    phase-0 orders land as the clustered lake and get the full
    certificate build (``write_zone_map``); phase-1 orders APPEND into
    the same cell directories (one new file per populated cell); then
    ``refresh_zone_map`` stats ONLY the new files (n_added travels in
    the oracled row — a refresh that rescanned or missed files shows up
    as a wrong count), the refreshed sidecar loads VALIDATED, and
    ``pruned_read`` answers a conjunctive range predicate with
    files-total/read/skipped accounting.  A refresh that produced wrong
    stats for any file moves n_files_read or the residual aggregate and
    fails the hash."""

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
    d = scratch_dir("lakezref")
    for phase, mode in ((0, "overwrite"), (1, "append")):
        (
            keyed.filter(F.col("phase") == phase)
            .drop("phase")
            .repartition(1 << _ZBITS, "z_file")
            .write.mode(mode)
            .partitionBy("z_file")
            .parquet(d)
        )
        if phase == 0:
            mnt.write_zone_map(spark, d, ["ck", "cents"])
    rrep = mnt.refresh_zone_map(spark, d, ["ck", "cents"])
    preds = {
        "ck": (lo1 + (hi1 - lo1) * 30 // 100, lo1 + (hi1 - lo1) * 45 // 100),
        "cents": (lo2 + (hi2 - lo2) * 40 // 100, lo2 + (hi2 - lo2) * 60 // 100),
    }
    pruned, rep = mnt.pruned_read(
        spark, d, preds, stats=mnt.zone_map(spark, d, ["ck", "cents"])
    )
    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(rep["n_files_total"]).cast("long").alias("n_files_total"),
        F.lit(rep["n_files_read"]).cast("long").alias("n_files_read"),
        F.lit(rep["n_files_skipped"]).cast("long").alias("n_files_skipped"),
        F.lit(rrep["n_added"]).cast("long").alias("n_files_added"),
        "n_orders",
        "sum_cents",
    )


PENDING_R13["lake_zone_refresh_read"] = (
    r13_lake_zone_refresh_read,
    R13_SQL_LAKE_ZONE_REFRESH,
)


R13_SQL_LAKE_BLOOM_REFRESH = f"""
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS ck,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderkey % 2 AS phase
      FROM orders
    ),
    b AS (
      SELECT MIN(okey) AS lo_k, MAX(okey) AS hi_k,
             MIN(ck) AS lo_c, MAX(ck) AS hi_c
      FROM o
    ),
    f AS (
      SELECT okey, ck, cents, phase,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((okey - lo_k) * {1 << _ZBITS}) / (hi_k - lo_k + 1.0))
                    AS BIGINT))) AS b_file
      FROM o CROSS JOIN b
    ),
    keys AS (
      SELECT ck FROM (
        SELECT DISTINCT c_custkey AS ck FROM customer CROSS JOIN b
        WHERE c_custkey >= lo_c + CAST(FLOOR((hi_c - lo_c) * 37 / 100.0)
                                       AS BIGINT)
      ) ORDER BY ck LIMIT 5
    ),
    fk AS (SELECT DISTINCT b_file, phase, ck FROM f),
    sidecar AS (
      SELECT DISTINCT b_file, phase, pos FROM (
        SELECT b_file, phase, {_sql_bpos("CAST(ck AS VARCHAR)", 0)} AS pos
        FROM fk
        UNION ALL
        SELECT b_file, phase, {_sql_bpos("CAST(ck AS VARCHAR)", 1)} FROM fk
        UNION ALL
        SELECT b_file, phase, {_sql_bpos("CAST(ck AS VARCHAR)", 2)} FROM fk
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
      SELECT DISTINCT b_file, phase FROM (
        SELECT s.b_file, s.phase, kpos.ck
        FROM sidecar s JOIN kpos ON s.pos = kpos.pos
        GROUP BY s.b_file, s.phase, kpos.ck
        HAVING COUNT(*) = {_BLOOM_K}
      )
    ),
    answer AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM f WHERE ck IN (SELECT ck FROM keys)
    )
    SELECT CAST((SELECT COUNT(DISTINCT (b_file, phase)) FROM f) AS BIGINT)
             AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(DISTINCT (b_file, phase)) FROM f)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(DISTINCT b_file) FROM f WHERE phase = 1)
                AS BIGINT) AS n_files_added,
           CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r13_lake_bloom_refresh_read(spark, sf_dir):
    """The Bloom sidecar's APPEND lifecycle end-to-end under the value
    gate (the round-12 refresh_bloom_sidecar, in the
    lake_bloom_pruned_read layout): phase-0 orders land bucketed by
    ORDER key with the full sidecar build; phase-1 orders APPEND one
    new file per populated bucket; ``refresh_bloom_sidecar`` hashes
    ONLY the new files (n_files_added travels in the oracled row),
    and ``bloom_pruned_read`` probes five custkeys against the
    refreshed sidecar — the oracle recomputes every md5 position per
    (bucket, phase) FILE, the all-k containment (false positives
    modeled, not idealized), the file accounting, and the residual
    aggregate.  A refresh that merged wrong positions or missed a file
    moves n_files_read or the answer and fails the hash."""

    from pdtable_spark.io import maintenance as mnt

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (F.col("o_orderkey") % 2).alias("phase"),
    )
    row = o.agg(
        F.min("okey"), F.max("okey"), F.min("ck"), F.max("ck")
    ).collect()[0]
    lo_k, hi_k, lo_c, hi_c = (int(v) for v in row)
    keyed = o.withColumn(
        "b_file", mnt.int_bucket(F.col("okey"), lo_k, hi_k, _ZBITS)
    )
    d = scratch_dir("lakebref")
    for phase, mode in ((0, "overwrite"), (1, "append")):
        (
            keyed.filter(F.col("phase") == phase)
            .drop("phase")
            .repartition(1 << _ZBITS, "b_file")
            .write.mode(mode)
            .partitionBy("b_file")
            .parquet(d)
        )
        if phase == 0:
            mnt.write_bloom_sidecar(
                spark, d, "ck", num_hashes=_BLOOM_K, num_bits=_BLOOM_M
            )
    rrep = mnt.refresh_bloom_sidecar(
        spark, d, "ck", num_hashes=_BLOOM_K, num_bits=_BLOOM_M
    )
    off = lo_c + (hi_c - lo_c) * 37 // 100
    keys = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= off)
        .select(F.col("c_custkey").alias("ck"))
        .distinct()
        .orderBy("ck")
        .limit(5)
    )
    got, rep = mnt.bloom_pruned_read(
        spark, d, "ck", keys, num_hashes=_BLOOM_K, num_bits=_BLOOM_M
    )
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(rep["n_files_total"]).cast("long").alias("n_files_total"),
        F.lit(rep["n_files_read"]).cast("long").alias("n_files_read"),
        F.lit(rep["n_files_skipped"]).cast("long").alias("n_files_skipped"),
        F.lit(rrep["n_added_files"]).cast("long").alias("n_files_added"),
        F.lit(rep["n_keys"]).cast("long").alias("n_keys"),
        "n_orders",
        "sum_cents",
    )


PENDING_R13["lake_bloom_refresh_read"] = (
    r13_lake_bloom_refresh_read,
    R13_SQL_LAKE_BLOOM_REFRESH,
)


# ---------------------------------------------------------------------------
# CDC vacuum under the value gate: three MERGE waves build versions
# 0/1/2, vacuum_versions(keep_last=2) drops exactly version 0 (the
# crashed-retry window keeps N-1 — the round-12 ADVICE fix), and the
# AS-OF-latest read must still be the full last-writer-wins state.  A
# vacuum that removed the wrong partition, damaged the survivors, or
# miscounted shows up in the merged rows or the removed-count column.
# ---------------------------------------------------------------------------

R13_SQL_STREAM_UPSERT_VACUUM = """
    WITH o AS (
      SELECT o_orderkey AS k, o_orderstatus AS s,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    present AS (
      SELECT DISTINCT k FROM o
      WHERE k % 3 IN (0, 1) OR k % 4 = 0
         OR (k % 3 = 2 AND k % 5 = 0 AND k % 4 <> 0)
    )
    SELECT o.k AS o_orderkey,
           CASE WHEN o.k % 4 = 0 THEN 'V'
                WHEN o.k % 6 = 0 THEN 'X'
                ELSE o.s END AS o_orderstatus,
           CASE WHEN o.k % 4 = 0 THEN o.cents + 2
                WHEN o.k % 6 = 0 THEN o.cents + 1
                ELSE o.cents END AS cents,
           CAST(1 AS BIGINT) AS n_versions_removed
    FROM o JOIN present USING (k)
"""


def r13_stream_upsert_vacuum(spark, sf_dir):
    """Versioned-table retention end-to-end: wave 1 seeds k%3==0; wave 2
    changes k%6==0 (status 'X', cents+1) and adds k%3==1; wave 3
    changes/adds every k%4==0 (status 'V', cents+2 — the LAST writer,
    overriding wave 2 where both touched a key) plus a disjoint add set
    (k%3==2 ∧ k%5==0 ∧ k%4≠0).  Each wave is one ``availableNow``
    micro-batch over a shared checkpoint, so the table carries versions
    0/1/2; ``vacuum_versions(keep_last=2)`` must remove exactly
    version 0 (n_versions_removed travels in every oracled row) and the
    latest-version read must be the full three-wave last-writer-wins
    merge, stated by the oracle as pure CASE arithmetic over orders."""

    from pdtable_spark.streaming.ingest import (
        read_table_version,
        upsert_stream,
        vacuum_versions,
    )

    d = scratch_dir("vac")
    land, tdir, cdir = f"{d}/land", f"{d}/table", f"{d}/log"
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    k = F.col("o_orderkey")
    w1 = o.filter(k % 3 == 0)
    w2 = (
        o.filter(k % 6 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("cents", F.col("cents") + 1)
        .unionByName(o.filter(k % 3 == 1))
    )
    w3 = (
        o.filter(k % 4 == 0)
        .withColumn("o_orderstatus", F.lit("V"))
        .withColumn("cents", F.col("cents") + 2)
        .unionByName(o.filter((k % 3 == 2) & (k % 5 == 0) & (k % 4 != 0)))
    )
    for w in (w1, w2, w3):
        w.write.parquet(land, mode="append")
        s = spark.readStream.schema(
            "o_orderkey long, o_orderstatus string, cents long"
        ).parquet(land)
        upsert_stream(s, tdir, cdir, f"{d}/ckpt", "o_orderkey")
    rep = vacuum_versions(spark, tdir, keep_last=2)
    return read_table_version(spark, tdir).select(
        "o_orderkey",
        "o_orderstatus",
        "cents",
        F.lit(len(rep["table_removed"])).cast("long").alias("n_versions_removed"),
    )


PENDING_R13["stream_upsert_vacuum"] = (
    r13_stream_upsert_vacuum,
    R13_SQL_STREAM_UPSERT_VACUUM,
)


# ---------------------------------------------------------------------------
# The LSH hot-bucket guard's CORRECTNESS on a skewed corpus (the load
# side is BENCH_SCALE.md's round-12 skew table): a derived corpus where
# 5% of documents are ONE identical boilerplate text puts every such doc
# in the same bucket per band; with max_bucket forced low, the hot
# buckets take the per-bucket self-join path while organic buckets take
# the collect_list path — and the emitted pair set must be EXACTLY the
# bucket-cohabitation closure either way.
# ---------------------------------------------------------------------------

_SKEW_BOILERPLATE = (
    "standard boilerplate navigation header terms privacy cookie notice"
)
_SKEW_DERIVED_SQL = (
    f"CASE WHEN doc_id % 20 = 0 THEN '{_SKEW_BOILERPLATE}' ELSE text END"
)

R13_SQL_SKEWED_BUCKETS = f"""
    WITH documents AS (
      SELECT doc_id, {_SKEW_DERIVED_SQL} AS text FROM main.documents
    ),
    {_sql_band_index(16, 4)},
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN id_a % 20 = 0 AND id_b % 20 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_pairs,
           CAST(MIN(id_a) AS BIGINT) AS min_id_a,
           CAST(MAX(id_b) AS BIGINT) AS max_id_b
    FROM pairs
"""


def r13_dedup_skewed_buckets(spark, sf_dir):
    """Hot-bucket guard correctness under deliberate skew: 5% of the
    corpus becomes ONE boilerplate text (all four bands collide), and
    ``minhash_lsh_candidates`` runs with ``max_bucket=16`` so the
    boilerplate buckets exceed the guard at every SF and stream through
    the per-bucket self-join while organic buckets stay on the
    collect_list fast path.  The oracle computes the full bucket-
    cohabitation closure with a plain join — the guard must change
    WHERE the k² expansion runs, never WHAT it emits.  n_hot_pairs
    pins the skew shape itself (h·(h−1)/2 for the boilerplate key)."""
    from pdtable_spark.operators.dedup import minhash_lsh_candidates

    docs = load(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 20 == 0, F.lit(_SKEW_BOILERPLATE)
        ).otherwise(F.col("text")),
    )
    pairs = minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, hash_fn="md5_60", max_bucket=16
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            ((F.col("id_a") % 20 == 0) & (F.col("id_b") % 20 == 0)).cast("int")
        ).cast("long").alias("n_hot_pairs"),
        F.min("id_a").cast("long").alias("min_id_a"),
        F.max("id_b").cast("long").alias("max_id_b"),
    )


PENDING_R13["dedup_skewed_buckets"] = (
    r13_dedup_skewed_buckets,
    R13_SQL_SKEWED_BUCKETS,
)


# ---------------------------------------------------------------------------
# The COMPACTION leg of the refresh lifecycle (vanished files): the
# append leg is lake_zone_refresh_read; this one rewrites the 64-cell
# fine layout into 16 coarse files (cells offset past the fine id
# domain so both layouts are addressable in one partition column),
# deletes the fine directories, refreshes — n_removed/n_added travel in
# the oracled row — and answers the same predicate band off the coarse
# certificate.
# ---------------------------------------------------------------------------

R13_SQL_LAKE_COMPACT_REFRESH = f"""
    WITH o AS (
      SELECT o_custkey AS ck,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT MIN(ck) AS lo1, MAX(ck) AS hi1,
             MIN(cents) AS lo2, MAX(cents) AS hi2
      FROM o
    ),
    k AS (
      SELECT ck, cents,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((ck - lo1) * {1 << _ZBITS}) / (hi1 - lo1 + 1.0))
                    AS BIGINT))) AS b1,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((cents - lo2) * {1 << _ZBITS}) / (hi2 - lo2 + 1.0))
                    AS BIGINT))) AS b2
      FROM o CROSS JOIN b
    ),
    z AS (
      SELECT ck, cents,
             ({_sql_interleave2('b1', 'b2', _ZBITS)}) >> {_ZBITS} AS z_fine
      FROM k
    ),
    zc AS (SELECT ck, cents, {1 << _ZBITS} + (z_fine >> 2) AS z_file FROM z),
    p AS (
      SELECT lo1 + CAST(FLOOR((hi1 - lo1) * 30 / 100.0) AS BIGINT) AS ck_lo,
             lo1 + CAST(FLOOR((hi1 - lo1) * 45 / 100.0) AS BIGINT) AS ck_hi,
             lo2 + CAST(FLOOR((hi2 - lo2) * 40 / 100.0) AS BIGINT) AS ce_lo,
             lo2 + CAST(FLOOR((hi2 - lo2) * 60 / 100.0) AS BIGINT) AS ce_hi
      FROM b
    ),
    fstats AS (
      SELECT z_file, MIN(ck) AS min_ck, MAX(ck) AS max_ck,
             MIN(cents) AS min_ce, MAX(cents) AS max_ce
      FROM zc GROUP BY z_file
    ),
    kept AS (
      SELECT z_file FROM fstats CROSS JOIN p
      WHERE NOT (max_ck < ck_lo OR min_ck > ck_hi)
        AND NOT (max_ce < ce_lo OR min_ce > ce_hi)
    ),
    answer AS (
      SELECT COUNT(*) AS n_orders, SUM(cents) AS sum_cents
      FROM zc CROSS JOIN p
      WHERE ck BETWEEN ck_lo AND ck_hi AND cents BETWEEN ce_lo AND ce_hi
    )
    SELECT CAST((SELECT COUNT(*) FROM fstats) AS BIGINT) AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(*) FROM fstats)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(DISTINCT z_fine) FROM z) AS BIGINT)
             AS n_files_removed,
           CAST((SELECT COUNT(*) FROM fstats) AS BIGINT) AS n_files_added,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r13_lake_compact_refresh_read(spark, sf_dir):
    """The zone map's COMPACTION lifecycle under the value gate (the
    vanished-files complement of lake_zone_refresh_read): the 64-cell
    fine layout gets the full certificate build, then compaction
    rewrites the SAME rows into 16 coarse files (``64 + (z_fine >> 2)``
    — offset past the fine id domain) and deletes the fine directories;
    ``refresh_zone_map`` must drop all 64 vanished rows and stat only
    the 16 new files (both counts travel in the oracled row), and the
    refreshed certificate answers the same predicate band exactly.  A
    refresh that kept a vanished row or missed a coarse file moves the
    accounting or the residual aggregate and fails the hash."""
    import shutil

    from pdtable_spark.io import maintenance as mnt

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
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
    fine = o.withColumn("z_file", F.shiftright(z, _ZBITS))
    d = scratch_dir("lakecompact")
    (
        fine.repartition(1 << _ZBITS, "z_file")
        .write.mode("overwrite")
        .partitionBy("z_file")
        .parquet(d)
    )
    mnt.write_zone_map(spark, d, ["ck", "cents"])
    # compaction: rewrite the same rows into 16 coarse files (ids offset
    # past the fine domain), then drop the fine directories — the local
    # spelling of a rewrite-then-swap OPTIMIZE; object stores go through
    # the Hadoop FS API exactly like vacuum_versions
    coarse = fine.withColumn(
        "z_file", F.lit(1 << _ZBITS) + F.shiftright(F.col("z_file"), 2)
    )
    (
        coarse.repartition((1 << _ZBITS) >> 2, "z_file")
        .write.mode("append")
        .partitionBy("z_file")
        .parquet(d)
    )
    import os as _os

    for name in _os.listdir(d):
        if name.startswith("z_file=") and int(name.split("=")[1]) < (1 << _ZBITS):
            shutil.rmtree(_os.path.join(d, name))
    rrep = mnt.refresh_zone_map(spark, d, ["ck", "cents"])
    preds = {
        "ck": (lo1 + (hi1 - lo1) * 30 // 100, lo1 + (hi1 - lo1) * 45 // 100),
        "cents": (lo2 + (hi2 - lo2) * 40 // 100, lo2 + (hi2 - lo2) * 60 // 100),
    }
    pruned, rep = mnt.pruned_read(
        spark, d, preds, stats=mnt.zone_map(spark, d, ["ck", "cents"])
    )
    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(rep["n_files_total"]).cast("long").alias("n_files_total"),
        F.lit(rep["n_files_read"]).cast("long").alias("n_files_read"),
        F.lit(rep["n_files_skipped"]).cast("long").alias("n_files_skipped"),
        F.lit(rrep["n_removed"]).cast("long").alias("n_files_removed"),
        F.lit(rrep["n_added"]).cast("long").alias("n_files_added"),
        "n_orders",
        "sum_cents",
    )


PENDING_R13["lake_compact_refresh_read"] = (
    r13_lake_compact_refresh_read,
    R13_SQL_LAKE_COMPACT_REFRESH,
)


# ---------------------------------------------------------------------------
# The shard-EXPORT leg under the value gate: write_training_shards'
# default range assignment balances well but its boundaries are not
# bit-stable (repartitionByRange samples), so it could never carry a
# value oracle.  assignment="hash" (new, round 12) makes shard
# membership a pure md5_60 function of the row — the manifest every
# training job reads becomes cross-engine checkable.
# ---------------------------------------------------------------------------

_SHARD_N = 8

R13_SQL_SHARD_EXPORT = f"""
    SELECT CAST((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                 AS BIGINT)) % {_SHARD_N} AS VARCHAR) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
"""


def r13_pipeline_shard_export(spark, sf_dir):
    """Deterministic training-shard export end-to-end: every document
    lands in shard ``md5_60(doc_id) % {n}`` — bit-stable across runs,
    engines and parallelism — written as ``shard=N/`` partition
    directories with one content-stable-shuffled file each, and the
    returned manifest (what the training job's loader reads for epoch
    planning) is recomputed by the oracle as pure md5 arithmetic over
    the source table.  A wrong shard route, a dropped row, or a
    miscounted token total all move the manifest and fail the hash.

    Scale shape: one scan + one num_shards-way shuffle for the write,
    one read-back aggregate for the manifest; balance is binomial
    (±√(n/shards)) — the documented trade against the range writer's
    near-exact split when reproducible membership matters more."""

    from pdtable_spark.io.maintenance import write_training_shards
    from pdtable_spark.operators import text

    d = scratch_dir("shards")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    manifest = write_training_shards(
        docs, d, num_shards=_SHARD_N, assignment="hash"
    )
    return manifest.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


PENDING_R13["pipeline_shard_export"] = (
    r13_pipeline_shard_export,
    R13_SQL_SHARD_EXPORT,
)


# ---------------------------------------------------------------------------
# Bucketed co-located join under the value gate: "pay the shuffle once
# at write time" is a core 100 TB lever (repeated fact⋈fact joins stop
# re-shuffling the same data) — until now only pytest pinned it.  The
# query writes both sides bucketed on the join key, joins through the
# bucket path (broadcast off, merge hint) and aggregates; the plan pin
# (zero exchanges on the join) lives in the plan-contract test, the
# VALUES here.
# ---------------------------------------------------------------------------

R13_SQL_BUCKETED_JOIN = """
    SELECT l.l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_returnflag
"""


def r13_q_bucketed_colocated_join(spark, sf_dir):
    """The pay-the-shuffle-once join: orders and lineitem persist as
    same-bucketed catalog tables on the order key (16 buckets), and the
    fact⋈fact join runs through the bucket path — broadcast disabled by
    the merge hint so the planner must prove co-location from catalog
    metadata; zero exchanges on either join side is plan-contract-pinned
    (tests/test_plans.py).  The values — per-returnflag item counts,
    integer-cents price totals, distinct customers — come out of the
    bucketed tables, so a bucketing bug that dropped/duplicated rows on
    the write fails the hash, not just the plan shape.

    At 100 TB: bucket count scales with data (one bucket ≈ 100-500 MB),
    and every later join/aggregation on the key reuses the layout —
    the write's one shuffle amortizes across the query fleet."""
    from pdtable_spark.operators.bucketing import bucketed_join, write_bucketed

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    write_bucketed(
        o.select("o_orderkey", "o_custkey"),
        "r13_bucketed_orders",
        "o_orderkey",
        num_buckets=16,
    )
    write_bucketed(
        li.select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        ),
        "r13_bucketed_lineitem",
        "o_orderkey",
        num_buckets=16,
    )
    j = bucketed_join(
        spark, "r13_bucketed_orders", "r13_bucketed_lineitem", on="o_orderkey"
    )
    return j.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("price_cents").cast("long").alias("sum_price_cents"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


PENDING_R13["q_bucketed_colocated_join"] = (
    r13_q_bucketed_colocated_join,
    R13_SQL_BUCKETED_JOIN,
)


# ---------------------------------------------------------------------------
# Streaming shard manifest — the export leg's streaming sibling: same
# deterministic hash assignment as pipeline_shard_export, maintained as
# a mergeable additive ledger while ingest waves land.
# ---------------------------------------------------------------------------

R13_SQL_STREAM_SHARD_LEDGER = f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS nt,
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT)) % {_SHARD_N} AS shard,
             ((doc_id % 2) + 2) % 2 AS wave
      FROM documents
    )
    SELECT b.batch_id, d.shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM d, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) b(batch_id)
    WHERE d.wave <= b.batch_id
    GROUP BY b.batch_id, d.shard
"""


def r13_stream_shard_ledger(spark, sf_dir):
    """The running training-shard manifest under the value gate: two
    ingest waves (even doc_ids, then odd) land through one checkpoint;
    each batch's ledger row set is the CUMULATIVE per-shard
    (n_docs, n_tokens) under the deterministic md5_60 assignment — so
    batch 0 is the even-docs manifest and batch 1 equals the full batch
    export's manifest, both stated by the oracle as pure md5 arithmetic
    (the novelty/quantile/heavy-hitter/moment/cell/sample ledger
    discipline, seventh of the septet)."""

    from pdtable_spark.operators import text
    from pdtable_spark.streaming.monitor import shard_ledger_stream

    d = scratch_dir("shardled")
    land, led = f"{d}/land", f"{d}/ledger"
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    for wave in (0, 1):
        docs.filter(F.pmod(F.col("doc_id"), 2) == wave).write.parquet(
            land, mode="append"
        )
        s = spark.readStream.schema("doc_id long, n_tokens long").parquet(land)
        shard_ledger_stream(
            s, led, f"{d}/ckpt", num_shards=_SHARD_N
        )
    return spark.read.parquet(led).select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        "n_tokens",
    )


PENDING_R13["stream_shard_ledger"] = (
    r13_stream_shard_ledger,
    R13_SQL_STREAM_SHARD_LEDGER,
)


# ---------------------------------------------------------------------------
# Registration: the @q decoration for the whole block (executed round-13
# runbook — VERDICT r12 task #1).  suite.py imports this module at the
# end of its body, so suite.QUERIES / suite.ORACLES — the single registry
# the driver contract, bench, and oracle sweeps read — contain these 9
# entries exactly like any inline @q query.
from pdtable_spark.queries.suite import q as _q

for _name, (_fn, _sql) in PENDING_R13.items():
    _q(_name, _sql)(_fn)
