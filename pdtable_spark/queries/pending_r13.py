"""Queries STAGED for round 13 — built, oracled, pytest-gated and
benched in round 12 (the ``suite_r8``…``pending_r12`` staging
discipline), registered under ``@q`` at the top of round 13.

Round-13 window arithmetic (write it into ``__spark_entry__._PRIORITY``
at registration time): after CORRECTNESS_r12 reports the r12 head-50,
the evidence ages are r12: 50, r8: 17, r9: 50, r10: 50, r11: 50 — so
the round-13 head-50 is the entries in this file + the 17 remaining
r8-evidence rows (CORRECTNESS_r08 report order, starting at
``pipeline_snapshot_diff``) + the oldest r9-evidence rows
(CORRECTNESS_r09 report order) filling to 50 exactly.

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
    _IVF_CELLS,
    _SEMDEDUP_THRESHOLD,
    _SQL_TOKS,
    _sql_band_index,
    _sql_cos_ns,
    _sql_dist2,
    _sql_gopher_ok,
    load,
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

    flags = text.gopher_quality_flags(docs, min_words=20)
    ok = docs.join(
        flags.filter(F.col("pass_all") == 1).select("doc_id"), "doc_id", "semi"
    )
    # the exact-dedup survivors and the band index are each referenced by
    # MULTIPLE downstream branches (the LSH self-join's two sides, the
    # embedding semi join, the post-semantic outer side) — persist the two
    # bounded intermediates once instead of re-running the gate + digest
    # lineage per branch (the semantic_dedup persist-index idiom; measured
    # 13.5 s → ~5 s warm at sf0.1).  Lifecycle: exposed on the result as
    # ``e2e_survivors_index`` / ``e2e_band_index`` for the caller to
    # unpersist.
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
    surv = similarity.semantic_dedup(
        emb.join(
            lsh.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
        ),
        cents,
        threshold=_SEMDEDUP_THRESHOLD,
    )
    sem = lsh.join(
        surv.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )

    mix = sampling.cap_per_source(
        sem.select(
            "doc_id", "source", "text", F.col("n_chars").cast("double").alias("score")
        ),
        _E2E_CAP,
        score_col="score",
    )
    chunks = text.chunk_documents(mix, chunk_tokens=50, overlap=10).select(
        "doc_id", "chunk_idx", "chunk_n_tokens"
    )
    packed = text.pack_budget(
        chunks, capacity=200, order_cols=("doc_id", "chunk_idx")
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
    return result


PENDING_R13["pipeline_e2e_curation"] = (
    r13_pipeline_e2e_curation,
    R13_SQL_E2E_CURATION,
)
