"""Queries STAGED for round 12 — built, oracled, pytest-gated and
benched this round (the ``suite_r8``…``pending_r11`` staging
discipline), registered under ``@q`` at the top of round 12.

Round-12 window arithmetic (write it into ``__spark_entry__._PRIORITY``
at registration time): after CORRECTNESS_r11 reports the r11 head-50,
the evidence ages are r11: 50, r7: 7, r8: 50, r9: 50, r10: 50 — so the
round-12 head-50 is the TEN entries in this file + the 7 remaining
r7-evidence rows (CORRECTNESS_r07 report order, starting after the r11
window's last r7 row, i.e. at ``q_top_suppliers``) + the 33
oldest r8-evidence rows (CORRECTNESS_r08 report order) = 50 exactly;
the remaining 17 r8-evidence rows head the r13 window.

Every entry here is ALREADY under the correctness gate:
``tests/test_env_contract.py::test_pending_r12_oracles`` runs each
(spark, oracle) pair side-by-side at sf0.001 in pytest, so staged
queries cannot rot before registration.

Each entry satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.pending_r11 import _ZBITS, _sql_interleave2
from pdtable_spark.queries.suite import _IVF_CELLS, _sql_dist2, load, scratch_dir

#: name → (query fn, oracle sql): what round 12 registers.
PENDING_R12 = {}


# ---------------------------------------------------------------------------
# The READ side of the Z-order pruning certificate (VERDICT r10 task #2):
# write a clustered lake with a DETERMINISTIC file layout, plan a
# conjunctive range predicate, read through io.maintenance.pruned_read,
# and return BOTH the files-read accounting and the pruned answer — the
# oracle recomputes file membership, intersection and the answer from
# the same exact-integer curve arithmetic.
# ---------------------------------------------------------------------------

R12_SQL_LAKE_PRUNED_READ = f"""
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
      SELECT z_file, MIN(ck) AS min_ck, MAX(ck) AS max_ck,
             MIN(cents) AS min_ce, MAX(cents) AS max_ce
      FROM z GROUP BY z_file
    ),
    kept AS (
      SELECT z_file FROM fstats CROSS JOIN p
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
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r12_lake_pruned_read(spark, sf_dir):
    """End-to-end read-side pruning proof: orders are written as a
    clustered lake whose FILE layout is deterministic by construction —
    one file per coarse Z-curve cell (``zkey >> {bits}``), achieved by
    hashing each cell id to one task and ``partitionBy``-ing on it, so
    per-file min/max footer stats ARE per-cell min/max and the oracle
    can restate the whole certificate as curve arithmetic.  A
    conjunctive range predicate (a 15%x20% band of the bounds) then
    reads through :func:`pdtable_spark.io.maintenance.pruned_read`,
    with the certificate coming from the PERSISTED zone-map sidecar
    (``write_zone_map`` → validated ``zone_map`` load — the stats
    manifest, so the read scans no data column to decide its file set):
    files-total/read/skipped come from the certificate-driven scan (the
    frame's FileIndex holds exactly the kept files), and
    (n_orders, sum_cents) is the residual-filtered answer off that
    pruned scan — if pruning dropped a file it shouldn't have, the
    aggregate is wrong and the value oracle catches it.

    Scale shape: one bounded min/max aggregate, one clustered write
    (the lake being certified), one file-count-bounded stats pass, then
    a scan that opens ONLY intersecting files — the 100 TB story where
    a selective predicate touches a handful of files, not the lake.
    """

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
    keyed = o.withColumn("z_file", F.shiftright(z, _ZBITS))
    d = scratch_dir("lakeread")
    (
        keyed.repartition(1 << _ZBITS, "z_file")
        .write.mode("overwrite")
        .partitionBy("z_file")
        .parquet(d)
    )
    preds = {
        "ck": (lo1 + (hi1 - lo1) * 30 // 100, lo1 + (hi1 - lo1) * 45 // 100),
        "cents": (lo2 + (hi2 - lo2) * 40 // 100, lo2 + (hi2 - lo2) * 60 // 100),
    }
    # the full manifest path: persist the certificate as the hidden
    # zone-map sidecar, load it VALIDATED, and prune from it — the read
    # decides its file set without scanning a single data column
    mnt.write_zone_map(spark, d, ["ck", "cents"])
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
        "n_orders",
        "sum_cents",
    )


PENDING_R12["lake_pruned_read"] = (
    r12_lake_pruned_read,
    R12_SQL_LAKE_PRUNED_READ,
)


# ---------------------------------------------------------------------------
# IVF staleness diagnostic (VERDICT r10 task #3): the when-to-retrain
# companion of ivf_append — per-cell appended fraction + assigned-d²
# drift vs the train-time ledger, in the embedding_ivf_recall /
# minhash_estimate_error sketch-quality convention.
# ---------------------------------------------------------------------------

_STALE_Q = "1000000.0"  # quantum literal: 1e6, spelled once for both engines


R12_SQL_IVF_STALENESS = f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings),
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
             FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    d AS (
      SELECT c.vec_id, cent.cid,
             {_sql_dist2('ca', 'ce', 64)} AS d2,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                ORDER BY {_sql_dist2('ca', 'ce', 64)},
                                         cent.cid) AS rn
      FROM c CROSS JOIN cent
    ),
    a AS (
      SELECT vec_id, cid AS cell,
             CAST(FLOOR(d2 * {_STALE_Q} + 0.5) AS BIGINT) AS qd2
      FROM d WHERE rn = 1
    ),
    t AS (SELECT cell, COUNT(*) AS n_t, SUM(qd2) AS sq_t
          FROM a WHERE vec_id % 3 <> 0 GROUP BY cell),
    n AS (SELECT cell, COUNT(*) AS n_n, SUM(qd2) AS sq_n
          FROM a GROUP BY cell),
    j AS (
      SELECT COALESCE(n.cell, t.cell) AS cell,
             COALESCE(t.n_t, 0) AS n_train, COALESCE(n.n_n, 0) AS n_now,
             COALESCE(t.sq_t, 0) AS sq_train, COALESCE(n.sq_n, 0) AS sq_now
      FROM n FULL OUTER JOIN t ON n.cell = t.cell
    )
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_now AS BIGINT) AS n_now,
           CAST(n_now - n_train AS BIGINT) AS n_appended,
           CASE WHEN n_now > 0 THEN
             CAST(n_now - n_train AS DOUBLE) / CAST(n_now AS DOUBLE)
           END AS appended_frac,
           CASE WHEN n_train > 0 THEN
             CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE) / {_STALE_Q}
           END AS mean_d2_train,
           CASE WHEN n_now > 0 THEN
             CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE) / {_STALE_Q}
           END AS mean_d2_now,
           CASE WHEN n_train > 0 AND n_now > 0 AND sq_train > 0 THEN
             (CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE))
             / (CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE))
           END AS dist_ratio,
           (COALESCE(CASE WHEN n_now > 0 THEN
               CAST(n_now - n_train AS DOUBLE) / CAST(n_now AS DOUBLE)
             END > 0.3, FALSE)
            OR COALESCE(CASE WHEN n_train > 0 AND n_now > 0 AND sq_train > 0
             THEN (CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE))
                  / (CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE))
             END > 1.05, FALSE)) AS retrain
    FROM j ORDER BY cell
"""


def r12_embedding_ivf_staleness(spark, sf_dir):
    """The when-to-retrain diagnostic under the value gate: the suite's
    seeded centroids (``vec_id < 16``, the ``embedding_ivf_recall``
    convention) are "trained" on the 2/3 slice ``vec_id % 3 != 0``; the
    full corpus then plays the post-append population.
    ``similarity.ivf_cell_ledger`` (additive quantized-BIGINT state,
    the gram-ledger convention) captures both; ``similarity.
    ivf_staleness`` joins them into per-cell appended fraction,
    assigned-d² means, drift ratio and the retrain alarm bit.  The
    thresholds (0.3 / 1.05) sit inside the observed spread so the flag
    column is non-degenerate at every SF.

    Scale shape: two corpus scans (train slice + full) each folding to
    an n_cells-row ledger, then one broadcast join — the diagnostic
    costs two ledger passes regardless of corpus size, which is why it
    can run after EVERY append batch."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    cents = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    train = emb.filter(F.col("vec_id") % 3 != 0)
    led = similarity.ivf_cell_ledger(train, cents)
    return similarity.ivf_staleness(
        emb, cents, led, appended_frac_warn=0.3, dist_ratio_warn=1.05
    )


PENDING_R12["embedding_ivf_staleness"] = (
    r12_embedding_ivf_staleness,
    R12_SQL_IVF_STALENESS,
)


# ---------------------------------------------------------------------------
# Typed drill-down after json_profile (VERDICT r10 task #4): compile a
# profile-derived path→type plan into ONE from_json schema and aggregate
# the typed columns — the VARIANT-shaped step the profile defers.
# ---------------------------------------------------------------------------

R12_SQL_JSON_EXTRACT_TYPED = """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE event_id % 3 WHEN 0 THEN 'ios' WHEN 1 THEN 'android'
                  ELSE 'web' END AS device,
             (user_id * 7919) % 181 AS lat,
             (user_id * 104729) % 361 AS lon,
             CASE WHEN event_id % 5 = 0 THEN
               CAST(FLOOR(COALESCE(value, 0.0) * 100 + 0.5) AS BIGINT)
             END AS amount_cents
      FROM events
    )
    SELECT device,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(lat) AS BIGINT) AS sum_lat,
           CAST(SUM(lon) AS BIGINT) AS sum_lon,
           CAST(COUNT(amount_cents) AS BIGINT) AS n_priced,
           CAST(SUM(amount_cents) AS BIGINT) AS sum_amount_cents
    FROM e GROUP BY device ORDER BY device
"""


def r12_pipeline_json_extract_typed(spark, sf_dir):
    """Typed extraction end-to-end under the value gate: each event is
    re-serialized as a nested JSON document (the ``k`` from the real
    ``props`` column, a derived device string, an integer-degree geo
    object, an integer-cents amount present only on every fifth event —
    integers throughout so serialization is engine-independent), then
    ``monitor.json_extract_typed`` compiles the 5-path plan into ONE
    ``from_json`` schema — one parse per document, not one per path —
    and the typed columns aggregate per device.  The oracle recomputes
    every value from the raw columns (plus DuckDB's own JSON extraction
    for ``k``), so a wrong type coercion, a dropped nested field, or a
    null-vs-absent confusion in the extraction shows up as a value
    mismatch.

    Scale shape: one scan, codegen JSON parse (no Python), one 3-group
    aggregate."""
    from pdtable_spark.operators.monitor import json_extract_typed

    ev = load(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.from_json(F.col("props"), "map<string,string>")["k"]
            .cast("long")
            .alias("k"),
            F.element_at(
                F.array(F.lit("ios"), F.lit("android"), F.lit("web")),
                (F.col("event_id") % 3 + 1).cast("int"),
            ).alias("device"),
            F.struct(
                ((F.col("user_id") * 7919) % 181).alias("lat"),
                ((F.col("user_id") * 104729) % 361).alias("lon"),
            ).alias("geo"),
            F.when(
                F.col("event_id") % 5 == 0,
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + F.lit(0.5))
                .cast("long"),
            ).alias("amount_cents"),
        ),
        {"ignoreNullFields": "true"},
    )
    typed = json_extract_typed(
        ev.select(doc.alias("j")),
        "j",
        {
            "$.k": "long",
            "$.device": "string",
            "$.geo.lat": "long",
            "$.geo.lon": "long",
            "$.amount_cents": "long",
        },
    )
    return (
        typed.groupBy("device")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum("geo_lat").cast("long").alias("sum_lat"),
            F.sum("geo_lon").cast("long").alias("sum_lon"),
            F.count("amount_cents").cast("long").alias("n_priced"),
            F.sum("amount_cents").cast("long").alias("sum_amount_cents"),
        )
        .orderBy("device")
    )


PENDING_R12["pipeline_json_extract_typed"] = (
    r12_pipeline_json_extract_typed,
    R12_SQL_JSON_EXTRACT_TYPED,
)


# ---------------------------------------------------------------------------
# Plan inference closing the profile→plan→extract loop: json_infer_plan
# classifies every scalar path's values lexically and promotes along the
# standard lattice — the automation that turns an unknown feed into a
# typed schema with no human in the loop.
# ---------------------------------------------------------------------------

R12_SQL_JSON_INFER_PLAN = """
    WITH e AS (SELECT event_id FROM events),
    n AS (SELECT COUNT(*) AS n_all FROM e),
    thirds AS (SELECT COUNT(*) AS n_3 FROM e WHERE event_id % 3 = 0),
    mixl AS (SELECT COUNT(*) AS n_ml FROM e WHERE event_id % 4 <> 3),
    mixs AS (SELECT COUNT(*) AS n_ms FROM e WHERE event_id % 4 = 3)
    SELECT path, inferred_type,
           CAST(n_values AS BIGINT) AS n_values,
           CAST(n_long AS BIGINT) AS n_long,
           CAST(n_double AS BIGINT) AS n_double,
           CAST(n_boolean AS BIGINT) AS n_boolean,
           CAST(n_string AS BIGINT) AS n_string
    FROM (
      SELECT '$.id' AS path, 'long' AS inferred_type, n_all AS n_values,
             n_all AS n_long, 0 AS n_double, 0 AS n_boolean, 0 AS n_string
      FROM n
      UNION ALL
      SELECT '$.ratio', 'double', n_all, 0, n_all, 0, 0 FROM n
      UNION ALL
      SELECT '$.flag', 'boolean', n_all, 0, 0, n_all, 0 FROM n
      UNION ALL
      SELECT '$.mix', 'string', n_ml + n_ms, n_ml, 0, 0, n_ms
      FROM mixl CROSS JOIN mixs
      UNION ALL
      SELECT '$.tag', 'string', n_all, 0, 0, 0, n_all FROM n
      UNION ALL
      SELECT '$.ctx.r', 'double', n_3, 0, n_3, 0, 0 FROM thirds
      UNION ALL
      SELECT '$.ctx.u', 'long', n_3, n_3, 0, 0, 0 FROM thirds
    ) ORDER BY path
"""


def r12_pipeline_json_infer_plan(spark, sf_dir):
    """Schema inference under the value gate: events re-serialize as
    JSON documents carrying one path per primitive type — a long id, an
    always-fractional double, a boolean, a pure string, a MIXED column
    (numeric on 3 of 4 events, a word on the fourth — the promotion
    case), and a nested object on every third event —
    then ``monitor.json_infer_plan`` reconstructs (path, inferred_type,
    per-class counts) from the values alone.  The oracle states every
    count as event_id arithmetic and every inferred type as the lattice
    answer, so a wrong classification regex, a missed promotion, or a
    nested path leak shows up as a value mismatch.

    Scale shape: identical to the profile — one scan, bounded explodes,
    one path-domain aggregate."""
    from pdtable_spark.operators.monitor import json_infer_plan

    ev = load(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            # +0.5 keeps every value fractional so both engines agree
            # the path is double-only without leaning on a serializer
            (F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + F.lit(0.5))
             / F.lit(2.0)).alias("ratio"),
            (F.col("event_id") % 2 == 0).alias("flag"),
            F.when(F.col("event_id") % 4 == 3, F.col("event_type"))
            .otherwise((F.col("event_id") % 97).cast("string"))
            .alias("mix"),
            F.col("event_type").alias("tag"),
            F.when(
                F.col("event_id") % 3 == 0,
                F.struct(
                    F.col("user_id").alias("u"),
                    ((F.col("user_id") % 7).cast("double") + F.lit(0.25))
                    .alias("r"),
                ),
            ).alias("ctx"),
        ),
        {"ignoreNullFields": "true"},
    )
    return json_infer_plan(ev.select(doc.alias("j")), "j")


PENDING_R12["pipeline_json_infer_plan"] = (
    r12_pipeline_json_infer_plan,
    R12_SQL_JSON_INFER_PLAN,
)


# ---------------------------------------------------------------------------
# Streaming IVF staleness: the cell ledger under the streaming gate —
# the when-to-retrain alarm updating per append micro-batch with no
# corpus rescan (extends the streaming ledger quartet to a quintet).
# ---------------------------------------------------------------------------

R12_SQL_STREAM_IVF_STALENESS = f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings),
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
             FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    d AS (
      SELECT c.vec_id, cent.cid,
             {_sql_dist2('ca', 'ce', 64)} AS d2,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                ORDER BY {_sql_dist2('ca', 'ce', 64)},
                                         cent.cid) AS rn
      FROM c CROSS JOIN cent
    ),
    a AS (
      SELECT vec_id, cid AS cell,
             CAST(FLOOR(d2 * {_STALE_Q} + 0.5) AS BIGINT) AS qd2
      FROM d WHERE rn = 1
    ),
    t AS (SELECT cell, COUNT(*) AS n_t, SUM(qd2) AS sq_t
          FROM a WHERE vec_id % 3 <> 0 GROUP BY cell),
    waves AS (
      SELECT 0 AS wave, cell, qd2 FROM a WHERE vec_id % 3 = 0
      UNION ALL
      SELECT 1, cell, qd2 FROM a WHERE vec_id % 4 = 0
    ),
    n AS (
      SELECT bb.b AS batch_id, cell,
             COUNT(*) AS n_n, SUM(qd2) AS sq_n
      FROM (VALUES (0), (1)) AS bb(b), waves
      WHERE waves.wave <= bb.b
      GROUP BY bb.b, cell
    ),
    j AS (
      SELECT n.batch_id, COALESCE(n.cell, t.cell) AS cell,
             COALESCE(t.n_t, 0) AS n_train, COALESCE(n.n_n, 0) AS n_now,
             COALESCE(t.sq_t, 0) AS sq_train, COALESCE(n.sq_n, 0) AS sq_now
      FROM n LEFT JOIN t ON n.cell = t.cell
      UNION ALL
      SELECT bb.b, t.cell, t.n_t, 0, t.sq_t, 0
      FROM (VALUES (0), (1)) AS bb(b), t
      WHERE NOT EXISTS (SELECT 1 FROM n
                        WHERE n.batch_id = bb.b AND n.cell = t.cell)
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(cell AS BIGINT) AS cell,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_now AS BIGINT) AS n_now,
           CAST(n_now - n_train AS BIGINT) AS n_appended,
           CASE WHEN n_now > 0 THEN
             CAST(n_now - n_train AS DOUBLE) / CAST(n_now AS DOUBLE)
           END AS appended_frac,
           CASE WHEN n_train > 0 THEN
             CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE) / {_STALE_Q}
           END AS mean_d2_train,
           CASE WHEN n_now > 0 THEN
             CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE) / {_STALE_Q}
           END AS mean_d2_now,
           CASE WHEN n_train > 0 AND n_now > 0 AND sq_train > 0 THEN
             (CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE))
             / (CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE))
           END AS dist_ratio,
           (COALESCE(CASE WHEN n_now > 0 THEN
               CAST(n_now - n_train AS DOUBLE) / CAST(n_now AS DOUBLE)
             END > 0.3, FALSE)
            OR COALESCE(CASE WHEN n_train > 0 AND n_now > 0 AND sq_train > 0
             THEN (CAST(sq_now AS DOUBLE) / CAST(n_now AS DOUBLE))
                  / (CAST(sq_train AS DOUBLE) / CAST(n_train AS DOUBLE))
             END > 1.05, FALSE)) AS retrain
    FROM j ORDER BY batch_id, cell
"""


def r12_stream_ivf_staleness(spark, sf_dir):
    """The IVF cell ledger under the streaming gate: the train-time
    ledger freezes over the 2/3 slice (``vec_id % 3 != 0``, the
    ``embedding_ivf_staleness`` convention), then two append waves
    (%3==0, then %4==0 — overlapping on %12==0 and counted twice: the
    ledger tracks OBSERVATIONS) land through ONE checkpoint; per
    micro-batch the RUNNING per-cell staleness report (appended
    fraction, drift ratio, retrain bit vs the frozen artifact) lands
    exactly-once against the accumulating integer state.  Cells the
    stream has not reached yet still report (n_now = 0, NULL ratios,
    no alarm) — the full-outer contract.  Full value oracle, no
    tolerance pin."""

    from pdtable_spark.operators.similarity import ivf_cell_ledger
    from pdtable_spark.streaming.monitor import cell_ledger_stream

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    d = scratch_dir("cellled")
    land, led, out = f"{d}/land", f"{d}/ledger", f"{d}/out"
    train_led = ivf_cell_ledger(emb.filter(F.col("vec_id") % 3 != 0), cents)
    train_led.write.parquet(f"{d}/train")
    frozen = spark.read.parquet(f"{d}/train")
    for wave_mod in (3, 4):
        emb.filter(F.col("vec_id") % wave_mod == 0).write.parquet(
            land, mode="append"
        )
        s = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(land)
        cell_ledger_stream(
            s, led, out, f"{d}/ckpt", frozen, cents,
            appended_frac_warn=0.3, dist_ratio_warn=1.05,
        )
    return spark.read.parquet(out).select(
        F.col("batch_id").cast("long").alias("batch_id"),
        "cell", "n_train", "n_now", "n_appended", "appended_frac",
        "mean_d2_train", "mean_d2_now", "dist_ratio", "retrain",
    )


PENDING_R12["stream_ivf_staleness"] = (
    r12_stream_ivf_staleness,
    R12_SQL_STREAM_IVF_STALENESS,
)


# ---------------------------------------------------------------------------
# Hilbert clustering key under the value gate: lake_zorder_cells' sibling
# for curve='hilbert' — until now the Hilbert walk was pinned only by the
# python-parity/adjacency pytest; this puts the exact rotate-and-reflect
# arithmetic under the cross-engine oracle too (an append written by a
# different engine lands in the same curve position).
# ---------------------------------------------------------------------------

def _sql_hilbert_ctes(bits: int) -> str:
    """Unroll maintenance.hilbert_key's xy→d walk into one CTE per level
    (s = 2^(bits-1) … 1), each step pure integer CASE arithmetic —
    exactly the fold the Spark column expression runs."""
    ctes = []
    for step in range(1, bits + 1):
        s = 1 << (bits - step)
        prev = "h0" if step == 1 else f"h{step - 1}"
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
            f"WHEN {rx} = 1 THEN 3 WHEN {ry} = 1 THEN 1 ELSE 0 END)"
        )
        fx = f"(CASE WHEN {rx} = 1 THEN {s - 1} - x ELSE x END)"
        fy = f"(CASE WHEN {rx} = 1 THEN {s - 1} - y ELSE y END)"
        ctes.append(
            f"h{step} AS (SELECT cents,\n"
            f"  CASE WHEN {ry} = 1 THEN x ELSE {fy} END AS x,\n"
            f"  CASE WHEN {ry} = 1 THEN y ELSE {fx} END AS y,\n"
            f"  d + {s * s} * {quad} AS d\n"
            f"  FROM {prev})"
        )
    return ",\n    ".join(ctes)


R12_SQL_LAKE_HILBERT = f"""
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
      SELECT LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((ck - lo1) * {1 << _ZBITS}) / (hi1 - lo1 + 1.0))
                    AS BIGINT))) AS b1,
             LEAST({(1 << _ZBITS) - 1}, GREATEST(0,
               CAST(FLOOR(((cents - lo2) * {1 << _ZBITS}) / (hi2 - lo2 + 1.0))
                    AS BIGINT))) AS b2,
             cents
      FROM o CROSS JOIN b
    ),
    h0 AS (SELECT cents, b1 AS x, b2 AS y, CAST(0 AS BIGINT) AS d FROM k),
    {_sql_hilbert_ctes(_ZBITS)}
    SELECT d >> {_ZBITS} AS h_cell,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(d) AS BIGINT) AS min_h,
           CAST(MAX(d) AS BIGINT) AS max_h
    FROM h{_ZBITS} GROUP BY h_cell ORDER BY h_cell
"""


def r12_lake_hilbert_cells(spark, sf_dir):
    """The Hilbert clustering key under the value gate: same buckets as
    ``lake_zorder_cells``, but the adjacency-preserving rotate-and-
    reflect walk (``maintenance.hilbert_key`` — one bounded F.aggregate
    fold, constant codegen) instead of the Morton interleave; the
    oracle unrolls the identical walk level-by-level in DuckDB integer
    CASE arithmetic.  Profiles the 64 coarse curve cells (count, cents
    mass, key range) — and because the Hilbert curve never jumps, each
    cell is one contiguous spatial run, the property that makes its
    per-file boxes tighter than Z at the same file count.

    Plan shape: one bounded min/max aggregate, one scan + codegen fold
    + one 64-group aggregate — same as the Z sibling."""
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
    hk = mnt.hilbert_key(
        mnt.int_bucket(F.col("ck"), int(row[0]), int(row[1]), _ZBITS),
        mnt.int_bucket(F.col("cents"), int(row[2]), int(row[3]), _ZBITS),
        _ZBITS,
    )
    from pdtable_spark.operators.scanfan import fanout_small_scan

    return (
        fanout_small_scan(o).withColumn("hkey", hk)
        .groupBy(F.shiftright(F.col("hkey"), _ZBITS).alias("h_cell"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("hkey").alias("min_h"),
            F.max("hkey").alias("max_h"),
        )
        .orderBy("h_cell")
    )


PENDING_R12["lake_hilbert_cells"] = (
    r12_lake_hilbert_cells,
    R12_SQL_LAKE_HILBERT,
)


# ---------------------------------------------------------------------------
# Streaming bounded sample: the sample ledger under the streaming gate —
# a k-per-source representative slice of an unbounded feed that stays
# valid as batches land (extends the streaming ledger family to a
# sextet; SET semantics — redeliveries absorb).
# ---------------------------------------------------------------------------

_SAMPLE_K = 5

R12_SQL_STREAM_SAMPLE_LEDGER = f"""
    WITH d AS (SELECT doc_id, source, lang FROM documents),
    waves AS (
      SELECT 0 AS wave, doc_id, source, lang FROM d WHERE doc_id % 3 = 0
      UNION ALL
      SELECT 1, doc_id, source, lang FROM d WHERE doc_id % 4 = 0
    ),
    cand AS (
      SELECT DISTINCT bb.b AS batch_id, doc_id, source, lang,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS priority
      FROM (VALUES (0), (1)) AS bb(b), waves
      WHERE waves.wave <= bb.b
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY batch_id, source
                                   ORDER BY priority, doc_id) AS rnk
      FROM cand
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id, source, doc_id, lang,
           priority, CAST(rnk AS INT) AS rank
    FROM r WHERE rnk <= {_SAMPLE_K}
    ORDER BY batch_id, source, rank
"""


def r12_stream_sample_ledger(spark, sf_dir):
    """The bounded-sample ledger under the streaming gate: two document
    waves (doc_id%3==0, then %4==0 — overlapping on %12==0, ABSORBED
    rather than double-counted: the sample is set-semantics, a row's
    fate a pure function of its id) land through ONE checkpoint; per
    micro-batch the running k-per-source sample (md5_60 priorities, the
    cross-engine verification mode) lands exactly-once against the
    bounded groups×k state.  The oracle recomputes each batch's sample
    as the k smallest (md5_60(id), id) per source over the distinct ids
    ingested so far — value-for-value including the priorities."""

    from pdtable_spark.streaming.monitor import sample_ledger_stream

    d = scratch_dir("sampled")
    land, led, out = f"{d}/land", f"{d}/ledger", f"{d}/out"
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    for wave_mod in (3, 4):
        docs.filter(F.col("doc_id") % wave_mod == 0).write.parquet(
            land, mode="append"
        )
        s = spark.readStream.schema(
            "doc_id long, source string, lang string"
        ).parquet(land)
        sample_ledger_stream(
            s, led, out, f"{d}/ckpt", k=_SAMPLE_K, id_col="doc_id",
            by="source", keep_cols=["lang"],
        )
    return spark.read.parquet(out).select(
        F.col("batch_id").cast("long").alias("batch_id"),
        "source", "doc_id", "lang", "priority", "rank",
    )


PENDING_R12["stream_sample_ledger"] = (
    r12_stream_sample_ledger,
    R12_SQL_STREAM_SAMPLE_LEDGER,
)


# ---------------------------------------------------------------------------
# JSON schema drift between two feed generations: json_profile_diff —
# the "did yesterday's producer change the schema" alarm the profile
# docstring promises, as one path-domain-sized report.
# ---------------------------------------------------------------------------

R12_SQL_JSON_PROFILE_DIFF = """
    WITH n0 AS (SELECT COUNT(*) AS c FROM events WHERE event_id % 2 = 0),
    n1 AS (SELECT COUNT(*) AS c FROM events WHERE event_id % 2 = 1),
    v0 AS (SELECT COUNT(*) AS c FROM events
           WHERE event_id % 2 = 0 AND event_id % 3 = 0),
    rows_(path, kind, n_old, n_new) AS (
      SELECT '$', 'object', (SELECT c FROM n0), (SELECT c FROM n1)
      UNION ALL
      SELECT '$.t', 'scalar', (SELECT c FROM n0), (SELECT c FROM n1)
      UNION ALL
      SELECT '$.v', 'scalar', (SELECT c FROM v0), 0
      UNION ALL
      SELECT '$.m', 'scalar', (SELECT c FROM n0), 0
      UNION ALL
      SELECT '$.m', 'object', 0, (SELECT c FROM n1)
      UNION ALL
      SELECT '$.m.x', 'scalar', 0, (SELECT c FROM n1)
      UNION ALL
      SELECT '$.m.y', 'scalar', 0, (SELECT c FROM n1)
      UNION ALL
      SELECT '$.fresh', 'scalar', 0, (SELECT c FROM n1)
    )
    SELECT path, kind,
           CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_old AS DOUBLE) / CAST((SELECT c FROM n0) AS DOUBLE)
             AS share_old,
           CAST(n_new AS DOUBLE) / CAST((SELECT c FROM n1) AS DOUBLE)
             AS share_new,
           CAST(n_new AS DOUBLE) / CAST((SELECT c FROM n1) AS DOUBLE)
             - CAST(n_old AS DOUBLE) / CAST((SELECT c FROM n0) AS DOUBLE)
             AS delta,
           CASE WHEN n_old = 0 THEN 'added'
                WHEN n_new = 0 THEN 'removed'
                ELSE 'stable' END AS status
    FROM rows_ ORDER BY path, kind
"""


def r12_pipeline_json_profile_diff(spark, sf_dir):
    """Schema drift under the value gate: the even-event feed plays
    generation OLD (``t`` + an every-third ``v`` + a scalar ``m``), the
    odd-event feed plays generation NEW (``t`` kept, ``v`` dropped,
    ``m`` PROMOTED to an object with two children — the kind change the
    diff must report as a removed/added pair, not a netted zero — and a
    ``fresh`` field added); ``json_profile_diff`` reconstructs the per
    (path, kind) report with shares normalized by each generation's own
    document count (volume changes are not drift).  The oracle states
    every count as event_id arithmetic and re-derives the shares with
    the identical division order."""
    from pdtable_spark.operators.monitor import json_profile, json_profile_diff

    ev = load(spark, sf_dir, "events")
    old_doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.when(
                F.col("event_id") % 3 == 0,
                F.coalesce(F.col("value"), F.lit(0.0)),
            ).alias("v"),
            (F.col("event_id") % 7).alias("m"),
        ),
        {"ignoreNullFields": "true"},
    )
    new_doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                (F.col("event_id") % 5).alias("x"),
                F.col("user_id").alias("y"),
            ).alias("m"),
            (F.col("event_id") % 2 == 1).alias("fresh"),
        ),
        {"ignoreNullFields": "true"},
    )
    prof_old = json_profile(
        ev.filter(F.col("event_id") % 2 == 0).select(old_doc.alias("j")), "j"
    )
    prof_new = json_profile(
        ev.filter(F.col("event_id") % 2 == 1).select(new_doc.alias("j")), "j"
    )
    return json_profile_diff(prof_old, prof_new)


PENDING_R12["pipeline_json_profile_diff"] = (
    r12_pipeline_json_profile_diff,
    R12_SQL_JSON_PROFILE_DIFF,
)


# ---------------------------------------------------------------------------
# Dynamic file pruning from a dimension key set: pruned_semi_read — the
# plain-parquet DPP shape for a star join on a key-clustered lake.
# ---------------------------------------------------------------------------

R12_SQL_LAKE_PRUNED_SEMI = f"""
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
      WHERE c_custkey >= hi1 - CAST(FLOOR((hi1 - lo1) * 5 / 100.0) AS BIGINT)
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


def r12_lake_pruned_semi_read(spark, sf_dir):
    """Dynamic file pruning under the value gate: orders live as a lake
    clustered on customer key (one file per 2^6 key bucket, the
    deterministic ``partitionBy``-on-bucket layout), the dimension side
    is the NEWEST 5% of customers (monotone signup ids — the realistic
    localized slice: "orders of recently-registered customers"), and
    ``io.maintenance.pruned_semi_read`` turns that key set into the
    file scan set BEFORE the join — binary search over footer ranges,
    broadcast LEFT SEMI as the exact residual.  On this layout the 5%
    key band touches a handful of files; the oracle recomputes file
    membership, intersection and the joined aggregate from the same
    bucket arithmetic.

    Scale shape: one bounded min/max aggregate, one clustered write,
    one file-count-bounded stats pass, a driver-side bisect over ≤
    |dim| keys, then a scan of ONLY matching files into a broadcast
    semi join — the DPP story without a transactional table format."""

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
    d = scratch_dir("lakesemi")
    (
        keyed.repartition(1 << _ZBITS, "k_file")
        .write.mode("overwrite")
        .partitionBy("k_file")
        .parquet(d)
    )
    keys = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= hi1 - (hi1 - lo1) * 5 // 100)
        .select(F.col("c_custkey").alias("ck"))
    )
    semi, rep = mnt.pruned_semi_read(spark, d, "ck", keys)
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


PENDING_R12["lake_pruned_semi_read"] = (
    r12_lake_pruned_semi_read,
    R12_SQL_LAKE_PRUNED_SEMI,
)


# ---------------------------------------------------------------------------
# Point-lookup file pruning from the per-file Bloom sidecar: the lookup
# shape zone maps cannot serve — a scattered high-cardinality key where
# every file spans the whole domain.
# ---------------------------------------------------------------------------

_BLOOM_K = 3
_BLOOM_M = 1 << 20


def _sql_bpos(expr: str, i: int) -> str:
    # DuckDB spelling of operators/dedup.py::bloom_positions slot i at
    # the sidecar's num_bits (suite_r8._sql_bloom_pos is pinned to its
    # own 2^16 screen)
    return (
        f"(CAST('0x' || substr(md5({expr} || ':{i}'), 1, 15) AS BIGINT)"
        f" % {_BLOOM_M})"
    )


R12_SQL_LAKE_BLOOM_PRUNED = f"""
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
        WHERE c_custkey >= lo_c + CAST(FLOOR((hi_c - lo_c) * 37 / 100.0)
                                       AS BIGINT)
      ) ORDER BY ck LIMIT 5
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
    SELECT CAST((SELECT COUNT(DISTINCT b_file) FROM f) AS BIGINT)
             AS n_files_total,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_read,
           CAST((SELECT COUNT(DISTINCT b_file) FROM f)
                - (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_files_skipped,
           CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum_cents AS BIGINT) AS sum_cents
    FROM answer
"""


def r12_lake_bloom_pruned_read(spark, sf_dir):
    """Bloom point-lookup pruning under the value gate: orders live
    bucketed by ORDER key (one file per 2^6 bucket — so each customer's
    handful of orders scatter across files and a zone map on the
    customer key cannot prune anything), the probe set is the first
    FIVE custkeys past a bounds-derived offset, and ``io.maintenance.bloom_pruned_read`` decides the
    file set from the persisted per-file Bloom sidecar — one broadcast
    hash join, exact answers via the residual semi join.  The oracle
    recomputes every md5 position, the per-file position sets, the
    all-k-positions containment (false positives included — the oracle
    models the FILTER, not the ideal), and the joined aggregate.

    Scale shape: sidecar build is one scan + a per-file distinct;
    probing costs a broadcast join against a KB key set; the data scan
    opens only hit files.  The unclusterable-key complement of
    ``lake_pruned_semi_read``."""

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
    d = scratch_dir("lakebloom")
    (
        keyed.repartition(1 << _ZBITS, "b_file")
        .write.mode("overwrite")
        .partitionBy("b_file")
        .parquet(d)
    )
    mnt.write_bloom_sidecar(
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
        F.lit(rep["n_keys"]).cast("long").alias("n_keys"),
        "n_orders",
        "sum_cents",
    )


PENDING_R12["lake_bloom_pruned_read"] = (
    r12_lake_bloom_pruned_read,
    R12_SQL_LAKE_BLOOM_PRUNED,
)


# ---------------------------------------------------------------------------
# Registration: the @q decoration for the whole block (executed round-12
# runbook — VERDICT r11 task #1).  suite.py imports this module at the
# end of its body, so suite.QUERIES / suite.ORACLES — the single registry
# the driver contract, bench, and oracle sweeps read — contain these 10
# entries exactly like any inline @q query.
from pdtable_spark.queries.suite import q as _q

for _name, (_fn, _sql) in PENDING_R12.items():
    _q(_name, _sql)(_fn)
