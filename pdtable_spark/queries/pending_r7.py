"""Queries PREPARED for round 7 — deliberately NOT registered in
``suite.QUERIES`` yet: the round-6 driver window (50 slots) is exactly
allocated, and a declared-but-unreported query would read as a coverage
gap.  Round 7 moves these into ``suite.py`` (decorate with ``@q`` and
slot them at the head of the rotation alongside embedding_pq_refined /
embedding_pq_recall and the r4-evidence block).

Each entry already satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.suite import load

#: Per-source quality-score calibration (exact cume_dist spelling) over a
#: deterministic proxy score (the document's char count — available in
#: both engines without model weights).
PENDING_SQL_SCORE_CALIBRATION = """
    WITH s AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score FROM documents
    ),
    r AS (
      SELECT doc_id, source, score,
             CAST(cume_dist() OVER (PARTITION BY source
                                    ORDER BY score ASC, doc_id ASC) AS DOUBLE)
               AS score_pct
      FROM s
    )
    SELECT doc_id, source, score, score_pct FROM r
"""


def pending_score_calibration(spark, sf_dir):
    """Per-source percentile calibration of a quality proxy (n_chars):
    the "keep every source's top q%" primitive, exact spelling."""
    from pdtable_spark.operators.sampling import per_source_percentile

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    return per_source_percentile(docs, "score")


#: The streaming drift monitor replayed as deterministic waves (the
#: curate-stream staging pattern): reference = even doc_ids, stream = odd
#: doc_ids in one availableNow batch; oracle = the drift-report SQL with
#: the per-dim quantized tvd column attached.  Wire exactly like
#: stream_curate_survivors (tempfile landing dir + write.json staging).
PENDING_SQL_STREAM_DRIFT = """
    WITH oc AS (
      SELECT 'source' AS dim, CAST(source AS VARCHAR) AS value, COUNT(*) AS n_old
      FROM documents WHERE doc_id % 2 = 0 GROUP BY 2
    ),
    nc AS (
      SELECT 'source' AS dim, CAST(source AS VARCHAR) AS value, COUNT(*) AS n_new
      FROM documents WHERE doc_id % 2 = 1 GROUP BY 2
    ),
    j AS (
      SELECT COALESCE(oc.dim, nc.dim) AS dim,
             COALESCE(oc.value, nc.value) AS value,
             COALESCE(oc.n_old, 0) AS n_old, COALESCE(nc.n_new, 0) AS n_new
      FROM oc FULL OUTER JOIN nc
        ON nc.dim = oc.dim AND nc.value IS NOT DISTINCT FROM oc.value
    ),
    m AS (
      SELECT dim, value, CAST(n_old AS BIGINT) AS n_old,
             CAST(n_new AS BIGINT) AS n_new,
             CAST(n_old AS DOUBLE) / SUM(n_old) OVER (PARTITION BY dim) AS share_old,
             CAST(n_new AS DOUBLE) / SUM(n_new) OVER (PARTITION BY dim) AS share_new
      FROM j
    ),
    d AS (
      SELECT *, share_new - share_old AS delta,
             abs(share_new - share_old) AS abs_delta
      FROM m
    )
    SELECT *, CAST(SUM(CAST(FLOOR(abs_delta * 1e9) AS BIGINT))
                     OVER (PARTITION BY dim) AS DOUBLE) / 1e9 / 2.0 AS tvd,
           CAST(0 AS BIGINT) AS batch_id
    FROM d
"""
