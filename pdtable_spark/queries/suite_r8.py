"""The round-8 block of the declared suite — THIRTY-FOUR queries staged
(with full DuckDB oracles and sf0.001/sf0.01/sf1 MATCH evidence) during
round 7 and REGISTERED under ``@q`` here at the top of round 8: BM25 /
hybrid RRF retrieval, the PSI and numeric-dimension drift gates, DSIR
importance weights (fused-slice spelling), char entropy, line-level
boilerplate dedup + its audit, the per-source threshold-sweep curve, the
cluster profile / balanced sample / embedding-drift family, the per-rule
curation funnel, the Bloom decontamination screen + the
screen→exact-verify decontamination funnel + the streaming
(per-micro-batch) screen, the hard-negative / label-propagation pair
(plus the IVF-accelerated miner's recall diagnostic), the Matryoshka
truncation-recall diagnostic, the perceptual-hash (dHash) image near-dup
pairs, the data-constrained epochs plan, the in-context-pretraining
semantic pack, the active-learning uncertainty sample, the winnowing
(MOSS) fingerprint pair, the per-source cap (both spellings pinned), the
vocabulary-coverage / OOV-share report, the record-level privacy pair
(k-anonymity suppression + the anonymity/l-diversity risk report), the
asymmetric shingle-containment pairs, the snapshot diff (release
bookkeeping over io/maintenance.diff_snapshots), the table-facade
mutation chain (R10 replace / R11 cast / R12 fillna / R14 rename under
the value gate), and the frozen-vocabulary OOV drift alarm.

This module is imported at the end of ``suite.py`` so its entries land in
the SAME ``suite.QUERIES``/``suite.ORACLES`` registries every consumer
(driver contract, bench, oracle sweeps) reads — the registration loop at
the bottom is the ``@q`` decoration, applied over the ``R8_QUERIES``
name → (builder, oracle) table this file builds up.

Each entry satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.  The pre-registration correctness gate
(``tests/test_env_contract.py::test_r8_block_oracles``) stays in force —
it now additionally asserts every entry IS registered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.suite import (
    _SQL_DRIFT_REPORT,
    _SQL_SHINGLES,
    load,
    scratch_dir,
)

#: BM25 query terms for the staged retrieval query: one rare term
#: ('dup' — df 25 of 500 docs at sf0.01) and two common ones, so idf
#: spread is real.  Sorted-lowercase order matters: the per-term score
#: sum is evaluated in this order on BOTH engines (IEEE-identical trees).
R8_BM25_TERMS = ["dup", "scan", "vector"]


def _sql_tf(term: str) -> str:
    return (
        "CAST(len(list_filter(list_transform("
        "regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)), "
        f"x -> x = '{term}')) AS BIGINT)"
    )


def _sql_bm25(terms, k: int) -> str:
    terms = sorted({t.lower() for t in terms})
    tf_cols = ",\n             ".join(
        f"{_sql_tf(t)} AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    # mirrors operators/text.py::bm25_topk exactly: idf rounded
    # binary-faithfully (floor(x*1e9 + 0.5)/1e9), k1=1.2, b=0.75, and the
    # same left-associative expression shapes so doubles are bit-identical
    def contrib(i: int) -> str:
        idf = (
            f"floor(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5)) * 1000000000.0 + 0.5)"
            " / 1000000000.0"
        )
        denom = (
            f"CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)"
            " / (CAST(dl_total AS DOUBLE) / CAST(n AS DOUBLE)))"
        )
        return f"{idf} * CAST(tf{i} AS DOUBLE) * 2.2 / ({denom})"

    score = " + ".join(contrib(i) for i in range(len(terms)))
    n_hits = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl,
             {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS dl_total, {df_cols} FROM base
    ),
    scored AS (
      SELECT b.doc_id, b.dl,
             CAST({n_hits} AS BIGINT) AS n_hits,
             {score} AS score
      FROM base b CROSS JOIN stats
    ),
    topk AS (
      SELECT * FROM scored WHERE n_hits > 0
      ORDER BY score DESC, doc_id LIMIT {k}
    )
    SELECT doc_id, dl, n_hits, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM topk
    """


R8_SQL_BM25 = _sql_bm25(R8_BM25_TERMS, k=25)


def r8_text_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-25 over the documents table for a mixed rare/common
    term bag — zero-shuffle tf + one broadcast stats row + TakeOrdered
    (see operators/text.py::bm25_topk), in round_digits=9 verification
    mode so the idf ln matches across engines."""
    from pdtable_spark.operators.text import bm25_topk

    return bm25_topk(
        load(spark, sf_dir, "documents"),
        R8_BM25_TERMS,
        k=25,
        round_digits=9,
    )


#: PSI over the same even/odd snapshot halves (and the same report CTE) as
#: the registered drift queries — the three standard drift gates (report /
#: TVD / PSI) then share one oracle lineage.
R8_SQL_PSI = f"""
    WITH rep AS ({_SQL_DRIFT_REPORT})
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(CAST(FLOOR(round(
                 (GREATEST(share_new, 0.000001) - GREATEST(share_old, 0.000001))
                 * ln(GREATEST(share_new, 0.000001)
                      / GREATEST(share_old, 0.000001)), 9)
               * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0 AS psi
    FROM rep GROUP BY dim
"""


def r8_pipeline_drift_psi(spark, sf_dir):
    """Population Stability Index between the even/odd snapshot halves
    along source and lang — the rare-category-sensitive companion to
    pipeline_drift_tvd, quantized-BIGINT-summed for bit reproducibility."""
    from pdtable_spark.operators.monitor import corpus_psi

    docs = load(spark, sf_dir, "documents")
    return corpus_psi(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        ["source", "lang"],
    )


#: Numeric drift: n_chars over [0, 600) in 12 fixed bins (width 50.0 —
#: exact in binary, so floor((x-0)/50) is engine-identical).
R8_SQL_NUMERIC_DRIFT = """
    WITH ob AS (
      SELECT CAST(CAST(LEAST(GREATEST(
               FLOOR((CAST(n_chars AS DOUBLE) - 0.0) / 50.0), 0), 11)
             AS BIGINT) AS VARCHAR) AS value, COUNT(*) AS n_old
      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    nb AS (
      SELECT CAST(CAST(LEAST(GREATEST(
               FLOOR((CAST(n_chars AS DOUBLE) - 0.0) / 50.0), 0), 11)
             AS BIGINT) AS VARCHAR) AS value, COUNT(*) AS n_new
      FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(ob.value, nb.value) AS value,
             COALESCE(ob.n_old, 0) AS n_old, COALESCE(nb.n_new, 0) AS n_new
      FROM ob FULL OUTER JOIN nb ON nb.value IS NOT DISTINCT FROM ob.value
    ),
    m AS (
      SELECT value, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
             CASE WHEN SUM(n_old) OVER () > 0
                  THEN CAST(n_old AS DOUBLE) / CAST(SUM(n_old) OVER () AS DOUBLE)
                  ELSE 0.0 END AS share_old,
             CASE WHEN SUM(n_new) OVER () > 0
                  THEN CAST(n_new AS DOUBLE) / CAST(SUM(n_new) OVER () AS DOUBLE)
                  ELSE 0.0 END AS share_new
      FROM j
    )
    SELECT 'n_chars' AS dim, value, n_old, n_new, share_old, share_new,
           share_new - share_old AS delta,
           abs(share_new - share_old) AS abs_delta
    FROM m
"""


def r8_pipeline_numeric_drift(spark, sf_dir):
    """Numeric-dimension drift between the snapshot halves: n_chars
    bucketized into 12 shared fixed-width bins over [0, 600), then the
    standard categorical report — the length-distribution alarm a filter
    regression trips first."""
    from pdtable_spark.operators.monitor import numeric_drift_report

    docs = load(spark, sf_dir, "documents")
    return numeric_drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
        lo=0.0,
        hi=600.0,
        bins=12,
    )


#: name → (query fn, oracle sql): what round 8 registers under ``@q``.
R8_QUERIES = {
    "text_bm25_topk": (r8_text_bm25_topk, R8_SQL_BM25),
    "pipeline_drift_psi": (r8_pipeline_drift_psi, R8_SQL_PSI),
    "pipeline_numeric_drift": (
        r8_pipeline_numeric_drift,
        R8_SQL_NUMERIC_DRIFT,
    ),
}


#: Hybrid retrieval: the BM25 lexical top-25 fused with the exact-cosine
#: top-25 for probe vector 0 (documents and embeddings share the 0..N id
#: space in the driver testdata) via Reciprocal Rank Fusion — only RANKS
#: cross the fusion boundary, so the oracle needs no score calibration.
from pdtable_spark.queries.suite import _COSINE_SQL  # noqa: E402

R8_SQL_HYBRID = f"""
    WITH lex AS (SELECT doc_id, rank FROM ({R8_SQL_BM25})),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qa FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings),
    scored AS (SELECT c.vec_id, {_COSINE_SQL} AS s FROM c CROSS JOIN q),
    sem AS (
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (ORDER BY s DESC, vec_id) AS INT) AS rank
      FROM scored QUALIFY rank <= 25
    ),
    u AS (SELECT doc_id, rank FROM lex UNION ALL SELECT doc_id, rank FROM sem),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
             SUM(CAST(FLOOR(1000000000000.0 / (60.0 + CAST(rank AS DOUBLE)))
                 AS BIGINT)) AS qsum
      FROM u GROUP BY doc_id
    )
    SELECT doc_id, n_lists,
           CAST(qsum AS DOUBLE) / 1000000000000.0 AS rrf_score,
           CAST(row_number() OVER (ORDER BY qsum DESC, doc_id) AS INT) AS rank
    FROM agg
"""


def r8_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval end-to-end: BM25 lexical ranks ⊕ embedding cosine
    ranks fused by RRF (k=60) — the standard RAG retrieval stack as one
    value-oracled composition of three operators."""
    from pdtable_spark.operators import similarity
    from pdtable_spark.operators.text import bm25_topk

    docs = load(spark, sf_dir, "documents")
    lex = bm25_topk(docs, R8_BM25_TERMS, k=25, round_digits=9).select(
        "doc_id", "rank"
    )
    emb = load(spark, sf_dir, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = similarity.cosine_topk(emb, q0, k=25).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return similarity.rrf_fuse([lex, sem], k=60)


R8_QUERIES["hybrid_rrf_topk"] = (r8_hybrid_rrf_topk, R8_SQL_HYBRID)


#: DSIR importance weights: raw = the full documents table, target = its
#: lang='en' slice; 4096 hashed-ngram buckets.  The oracle rebuilds the
#: whole method in SQL — md5_60 buckets, Laplace bucket models with the
#: exact operand order, ln floored at 1e-9 — so the per-doc weights
#: hash-match bit-for-bit.
_SQL_DSIR_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_SQL_DSIR_GRAMS = (
    f"list_concat({_SQL_DSIR_TOKS}, "
    f"CASE WHEN len({_SQL_DSIR_TOKS}) >= 2 THEN "
    f"list_transform(generate_series(1, len({_SQL_DSIR_TOKS}) - 1), "
    f"i -> array_to_string(list_slice({_SQL_DSIR_TOKS}, i, i + 1), ' ')) "
    f"ELSE [array_to_string({_SQL_DSIR_TOKS}, ' ')] END)"
)

R8_SQL_DSIR = f"""
    WITH gb AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 4096 AS b
      FROM (SELECT doc_id, unnest({_SQL_DSIR_GRAMS}) AS gram FROM documents)
    ),
    tgb AS (
      SELECT CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 4096 AS b
      FROM (SELECT unnest({_SQL_DSIR_GRAMS}) AS gram FROM documents
            WHERE lang = 'en')
    ),
    sc AS (SELECT b, COUNT(*) AS cs FROM gb GROUP BY 1),
    tc AS (SELECT b, COUNT(*) AS ct FROM tgb GROUP BY 1),
    tots AS (SELECT (SELECT COUNT(*) FROM gb) AS ts,
                    (SELECT COUNT(*) FROM tgb) AS tt),
    q AS (
      SELECT sc.b,
             CAST(FLOOR(ln(((COALESCE(tc.ct, 0) + 1.0) / (tt + 4096.0))
                           / ((sc.cs + 1.0) / (ts + 4096.0)))
                        * 1000000000.0 + 0.5) AS BIGINT) AS qv
      FROM sc LEFT JOIN tc ON tc.b = sc.b CROSS JOIN tots
    )
    SELECT gb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(q.qv) AS DOUBLE) / 1000000000.0 AS log_importance
    FROM gb JOIN q ON q.b = gb.b
    GROUP BY gb.doc_id
"""


def r8_pipeline_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (hashed-ngram importance resampling,
    Xie et al. 2023) for steering the raw corpus toward its lang='en'
    slice — the modern "select data that looks like the target" primitive,
    scored scan-locally off a bounded broadcast log-ratio table."""
    from pdtable_spark.operators.sampling import dsir_log_importance

    docs = load(spark, sf_dir, "documents")
    # fused slice spelling: one gram pass builds BOTH bucket models
    # (bit-identical to the two-frame spelling, pytest-pinned)
    return dsir_log_importance(
        docs, target_pred=F.col("lang") == "en", hash_fn="md5_60"
    )


R8_QUERIES["pipeline_dsir_weights"] = (r8_pipeline_dsir_weights, R8_SQL_DSIR)


#: Character-entropy quality signal; the oracle rebuilds the quantized
#: −p·ln p sum per document via explode+group (the operator's scan-local
#: array fold and this relational spelling sum the same exact integers).
R8_SQL_CHAR_ENTROPY = """
    WITH ch AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
      FROM documents
    ),
    cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT c) AS nd
            FROM ch GROUP BY 1),
    terms AS (
      SELECT cnt.doc_id,
             CAST(FLOOR(round(
               -((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))), 9)
               * 1000000000.0) AS BIGINT) AS qt
      FROM cnt JOIN tot ON tot.doc_id = cnt.doc_id
    ),
    ent AS (SELECT doc_id, CAST(SUM(qt) AS DOUBLE) / 1000000000.0 AS e
            FROM terms GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(tot.n, 0) AS BIGINT) AS n_chars,
           CAST(COALESCE(tot.nd, 0) AS BIGINT) AS n_distinct_chars,
           COALESCE(ent.e, 0.0) AS entropy
    FROM documents d
    LEFT JOIN tot ON tot.doc_id = d.doc_id
    LEFT JOIN ent ON ent.doc_id = d.doc_id
"""


def r8_text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the cheap gibberish
    and repetition signal, computed as one scan-local array fold (no
    explode, no shuffle) with the quantized-ln determinism recipe."""
    from pdtable_spark.operators.text import char_entropy

    return char_entropy(load(spark, sf_dir, "documents"))


R8_QUERIES["text_char_entropy"] = (r8_text_char_entropy, R8_SQL_CHAR_ENTROPY)


#: Line-level boilerplate dedup (CCNet §4.1 / RefinedWeb): the synthetic
#: corpus has no newlines, so the suite pins the semantics with the
#: separator at ' ' (lines = words) and a SCALE-STABLE fractional
#: threshold — normalized "lines" in ≥78% of documents are boilerplate
#: (non-degenerate at sf0.001/sf0.01/sf1 alike: 16/15/3 boilerplate keys).
#: Real deployments split on '\n'; the plan is identical.
_SQL_LINE_BOIL = """
  SELECT k FROM (
    SELECT DISTINCT doc_id, lower(trim(line)) AS k
    FROM l WHERE lower(trim(line)) <> ''
  ) GROUP BY k
  HAVING COUNT(*) >= CEIL(0.78 * (SELECT COUNT(*) FROM documents))
"""

R8_SQL_LINE_DEDUP = f"""
    WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS ls
                  FROM documents),
    l AS (SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
          FROM base),
    boil AS ({_SQL_LINE_BOIL}),
    kept AS (SELECT doc_id, line, pos FROM l
             WHERE lower(trim(line)) NOT IN (SELECT k FROM boil))
    SELECT b.doc_id,
           COALESCE(string_agg(k.line, ' ' ORDER BY k.pos), '') AS text_clean,
           CAST(len(b.ls) AS BIGINT) AS n_lines,
           CAST(len(b.ls) - COUNT(k.line) AS BIGINT) AS n_lines_removed,
           b.source
    FROM base b LEFT JOIN kept k USING (doc_id)
    GROUP BY b.doc_id, b.source, len(b.ls)
"""


def r8_text_line_dedup(spark, sf_dir):
    """Line-level boilerplate removal: drop every line whose normalized
    form occurs in ≥78% of documents, survivors kept in original order and
    spelling — the broadcast spelling (scan-local filter + array_join; the
    corpus is never exploded or shuffled)."""
    from pdtable_spark.operators.text import line_dedup

    return line_dedup(
        load(spark, sf_dir, "documents"),
        line_sep=" ",
        min_docs=None,
        min_doc_frac=0.78,
        passthrough=("source",),
    )


R8_QUERIES["text_line_dedup"] = (r8_text_line_dedup, R8_SQL_LINE_DEDUP)


R8_SQL_COMMON_LINES = f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
    l AS (SELECT doc_id, unnest(ls) AS line FROM base),
    c AS (
      SELECT k AS line, n_docs FROM (
        SELECT lower(trim(line)) AS k, COUNT(DISTINCT doc_id) AS n_docs
        FROM l WHERE lower(trim(line)) <> '' GROUP BY 1
      ) WHERE n_docs >= CEIL(0.78 * (SELECT COUNT(*) FROM documents))
    )
    SELECT line, CAST(n_docs AS BIGINT) AS n_docs FROM c
"""


def r8_text_common_lines(spark, sf_dir):
    """The boilerplate audit behind line_dedup: normalized lines in ≥78%
    of documents with their document frequency — per-doc-distinct before
    the explode, so the count is a plain map-side-combinable groupBy."""
    from pdtable_spark.operators.text import common_lines

    return common_lines(
        load(spark, sf_dir, "documents"),
        line_sep=" ",
        min_docs=None,
        min_doc_frac=0.78,
    )


R8_QUERIES["text_common_lines"] = (r8_text_common_lines, R8_SQL_COMMON_LINES)


#: The filter-tuning curve over doc length: how much of the corpus (docs
#: AND tokens) survives each candidate n_chars cutoff — one scan, the
#: curve unpivots from a single aggregate row.
R8_SQL_THRESHOLD_SWEEP = r"""
    WITH t(threshold) AS (VALUES (100.0), (200.0), (300.0), (400.0)),
    base AS (SELECT source, CAST(n_chars AS DOUBLE) AS s,
                    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok
             FROM documents)
    SELECT base.source, CAST(t.threshold AS DOUBLE) AS threshold,
           CAST(SUM(CASE WHEN s >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CASE WHEN s >= t.threshold THEN 1 ELSE 0 END)
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                ELSE 0.0 END AS share_kept,
           CAST(SUM(CASE WHEN s >= t.threshold THEN tok ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CASE WHEN SUM(tok) > 0
                THEN CAST(SUM(CASE WHEN s >= t.threshold THEN tok ELSE 0 END)
                          AS DOUBLE) / CAST(SUM(tok) AS DOUBLE)
                ELSE 0.0 END AS token_share
    FROM base CROSS JOIN t GROUP BY base.source, t.threshold
"""


def r8_pipeline_threshold_sweep(spark, sf_dir):
    """Per-source threshold sweep over n_chars at 100/200/300/400: docs
    kept, WITHIN-source share, tokens kept, token share per cutoff — the
    per-source cut a mixture rebalance is tuned from, still one scan (T
    cutoffs as codegen literals in one aggregate row per source,
    unpivoted via inline)."""
    from pdtable_spark.operators.monitor import threshold_sweep

    return threshold_sweep(
        load(spark, sf_dir, "documents"),
        "n_chars",
        [100.0, 200.0, 300.0, 400.0],
        by=["source"],
    )


R8_QUERIES["pipeline_threshold_sweep"] = (
    r8_pipeline_threshold_sweep,
    R8_SQL_THRESHOLD_SWEEP,
)


#: Embedding-space composition + cluster-balanced selection, under the
#: suite's deterministic seed centroids (first _IVF_CELLS corpus vectors,
#: FAISS-style sampled init — the semantic-dedup oracle pattern).
from pdtable_spark.queries.suite import _IVF_CELLS, _sql_dist2  # noqa: E402

_SQL_CLUSTER_ASSIGN = f"""
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings),
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
             FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    cd AS (
      SELECT c.vec_id, cent.cid, {_sql_dist2('ca', 'ce')} AS d2,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                ORDER BY {_sql_dist2('ca', 'ce')}, cent.cid) AS rn
      FROM c CROSS JOIN cent
    )
"""

R8_SQL_CLUSTER_PROFILE = f"""
    WITH {_SQL_CLUSTER_ASSIGN},
    a AS (SELECT vec_id, CAST(cid AS INT) AS cell,
                 CAST(FLOOR(round(d2, 9) * 1000000000.0) AS BIGINT) AS qd
          FROM cd WHERE rn = 1),
    g AS (SELECT cell, COUNT(*) AS n, SUM(qd) AS sd FROM a GROUP BY 1),
    cells AS (SELECT CAST(range AS INT) AS cell FROM range({_IVF_CELLS})),
    tot AS (SELECT SUM(n) AS t FROM g)
    SELECT cells.cell,
           CAST(COALESCE(g.n, 0) AS BIGINT) AS n_vectors,
           CASE WHEN tot.t > 0
                THEN CAST(COALESCE(g.n, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE)
                ELSE 0.0 END AS share,
           CASE WHEN g.n > 0
                THEN CAST(g.sd AS DOUBLE) / CAST(g.n AS DOUBLE) / 1000000000.0
                ELSE 0.0 END AS avg_dist2
    FROM cells LEFT JOIN g USING (cell) CROSS JOIN tot
"""


def _seed_centroids(spark, sf_dir):
    from pdtable_spark.queries.suite import load as _load

    emb = _load(spark, sf_dir, "embeddings")
    return emb, [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]


def r8_embedding_cluster_profile(spark, sf_dir):
    """Per-cell corpus composition under the fixed seed centroids: count,
    share, and quantized mean squared distance — empty cells included (a
    cluster silently emptying is the alarm the profile exists for).  One
    scan; the aggregate is map-side-combinable at centroid cardinality."""
    from pdtable_spark.operators.similarity import cluster_profile

    emb, cents = _seed_centroids(spark, sf_dir)
    return cluster_profile(emb, cents)


R8_QUERIES["embedding_cluster_profile"] = (
    r8_embedding_cluster_profile,
    R8_SQL_CLUSTER_PROFILE,
)


R8_SQL_CLUSTER_SAMPLE = f"""
    WITH {_SQL_CLUSTER_ASSIGN},
    a AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM cd WHERE rn = 1),
    h AS (SELECT vec_id, cell,
                 CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                      AS BIGINT) % 1000000000 AS hb
          FROM a),
    r AS (SELECT vec_id, cell,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                         ORDER BY hb, vec_id) AS INT)
                   AS sample_rank
          FROM h)
    SELECT vec_id, cell, sample_rank FROM r WHERE sample_rank <= 5
"""


def r8_embedding_cluster_sample(spark, sf_dir):
    """Cluster-balanced subsample: ≤5 vectors per seed-centroid cell in
    deterministic hash order — uniform over topics, not over documents
    (head topics capped, tail topics survive whole)."""
    from pdtable_spark.operators.similarity import cluster_balanced_sample

    emb, cents = _seed_centroids(spark, sf_dir)
    return cluster_balanced_sample(emb, cents, per_cell=5)


R8_QUERIES["embedding_cluster_sample"] = (
    r8_embedding_cluster_sample,
    R8_SQL_CLUSTER_SAMPLE,
)


R8_SQL_CLUSTER_DRIFT = f"""
    WITH {_SQL_CLUSTER_ASSIGN},
    a AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM cd WHERE rn = 1),
    oc AS (SELECT CAST(cell AS VARCHAR) AS value, COUNT(*) AS n_old
           FROM a WHERE vec_id % 2 = 0 GROUP BY 1),
    nc AS (SELECT CAST(cell AS VARCHAR) AS value, COUNT(*) AS n_new
           FROM a WHERE vec_id % 2 = 1 GROUP BY 1),
    j AS (
      SELECT COALESCE(oc.value, nc.value) AS value,
             CAST(COALESCE(oc.n_old, 0) AS BIGINT) AS n_old,
             CAST(COALESCE(nc.n_new, 0) AS BIGINT) AS n_new
      FROM oc FULL OUTER JOIN nc ON nc.value = oc.value
    ),
    m AS (
      SELECT value, n_old, n_new,
             CASE WHEN SUM(n_old) OVER () > 0
                  THEN CAST(n_old AS DOUBLE) / CAST(SUM(n_old) OVER () AS DOUBLE)
                  ELSE 0.0 END AS share_old,
             CASE WHEN SUM(n_new) OVER () > 0
                  THEN CAST(n_new AS DOUBLE) / CAST(SUM(n_new) OVER () AS DOUBLE)
                  ELSE 0.0 END AS share_new
      FROM j
    )
    SELECT 'cell' AS dim, value, n_old, n_new, share_old, share_new,
           share_new - share_old AS delta,
           abs(share_new - share_old) AS abs_delta
    FROM m
"""


def r8_embedding_cluster_drift(spark, sf_dir):
    """Embedding-space drift between the even/odd snapshot halves under
    the fixed seed centroids: the standard categorical report over the
    cell dimension — topic shifts surface here before any metadata
    column moves, and the output feeds the report-level TVD/PSI gates
    unchanged."""
    from pdtable_spark.operators.monitor import cluster_drift

    emb, cents = _seed_centroids(spark, sf_dir)
    return cluster_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        cents,
    )


R8_QUERIES["embedding_cluster_drift"] = (
    r8_embedding_cluster_drift,
    R8_SQL_CLUSTER_DRIFT,
)


#: Per-rule rejection funnel over the FULL Gopher flag set, on the same
#: deterministic multi-line fixture variant as text_gopher_rules (so the
#: line-level rules take non-trivial values).
from pdtable_spark.queries.suite import (  # noqa: E402
    _GOPHER_DERIVED_SQL,
    _GOPHER_M,
    _GOPHER_MIN_WORDS,
)

_FUNNEL_RULES = [
    "pass_word_count",
    "pass_mean_word_len",
    "pass_alpha_ratio",
    "pass_stopwords",
    "pass_symbol_ratio",
    "pass_bullet_lines",
    "pass_ellipsis_lines",
    "pass_dup_lines",
]


def _sql_funnel() -> str:
    flags = f"""
    WITH t AS (SELECT doc_id, {_GOPHER_DERIVED_SQL} AS der FROM documents),
    m AS (
      SELECT doc_id,
             {_GOPHER_M['n_words']} AS n_words,
             {_GOPHER_M['mean_word_len']} AS mean_word_len,
             {_GOPHER_M['alpha_ratio']} AS alpha_ratio,
             {_GOPHER_M['n_stopwords']} AS n_stopwords,
             {_GOPHER_M['symbol_word_ratio']} AS symbol_word_ratio,
             {_GOPHER_M['bullet_line_frac']} AS bullet_line_frac,
             {_GOPHER_M['ellipsis_line_frac']} AS ellipsis_line_frac,
             {_GOPHER_M['dup_line_frac']} AS dup_line_frac
      FROM t
    ),
    fl AS (
      SELECT CAST(n_words >= {_GOPHER_MIN_WORDS} AND n_words <= 100000 AS INT)
               AS pass_word_count,
             CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT)
               AS pass_mean_word_len,
             CAST(alpha_ratio >= 0.8 AS INT) AS pass_alpha_ratio,
             CAST(n_stopwords >= 2 AS INT) AS pass_stopwords,
             CAST(symbol_word_ratio <= 0.1 AS INT) AS pass_symbol_ratio,
             CAST(bullet_line_frac <= 0.9 AS INT) AS pass_bullet_lines,
             CAST(ellipsis_line_frac <= 0.3 AS INT) AS pass_ellipsis_lines,
             CAST(dup_line_frac <= 0.3 AS INT) AS pass_dup_lines
      FROM m
    )"""
    arms = []
    for c in _FUNNEL_RULES:
        others = " AND ".join(f"{o} = 1" for o in _FUNNEL_RULES if o != c)
        arms.append(f"""
    SELECT '{c}' AS rule,
           CAST(SUM(CASE WHEN {c} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CASE WHEN {c} = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE)
                ELSE 0.0 END AS share_failed,
           CAST(SUM(CASE WHEN {c} = 0 AND {others} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_failed_alone
    FROM fl""")
    return flags + "\n    UNION ALL".join(arms)


R8_SQL_FUNNEL = _sql_funnel()


def r8_pipeline_curation_funnel(spark, sf_dir):
    """Per-rule rejection funnel over the full Gopher flag set: n_failed
    (double-counts multi-rule failures by design), within-corpus failure
    share, and the MARGINAL n_failed_alone (what dropping the rule would
    recover) — one aggregate row unpivoted via inline."""
    from pdtable_spark.operators.text import curation_funnel, gopher_quality_flags
    from pdtable_spark.queries.suite import _gopher_derived_col

    docs = load(spark, sf_dir, "documents").withColumn(
        "text", _gopher_derived_col()
    )
    return curation_funnel(gopher_quality_flags(docs, min_words=_GOPHER_MIN_WORDS))


R8_QUERIES["pipeline_curation_funnel"] = (
    r8_pipeline_curation_funnel,
    R8_SQL_FUNNEL,
)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination screen (operators/dedup.py::bloom_decontaminate)
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import _SQL_SHINGLES  # noqa: E402

_BLOOM_BITS = 1 << 16


def _sql_bloom_pos(expr: str, i: int) -> str:
    # DuckDB spelling of operators/dedup.py::bloom_positions slot i
    return (
        f"(CAST('0x' || substr(md5({expr} || ':{i}'), 1, 15) AS BIGINT)"
        f" % {_BLOOM_BITS})"
    )


R8_SQL_BLOOM = f"""
    WITH base AS (SELECT doc_id, source = 'src0' AS is_bench, {_SQL_SHINGLES} AS sh
                  FROM documents),
    bench_g AS (SELECT DISTINCT unnest(sh) AS g FROM base WHERE is_bench),
    bloom AS (
      SELECT DISTINCT pos FROM (
        SELECT {_sql_bloom_pos('g', 0)} AS pos FROM bench_g
        UNION ALL SELECT {_sql_bloom_pos('g', 1)} FROM bench_g
        UNION ALL SELECT {_sql_bloom_pos('g', 2)} FROM bench_g
      )
    ),
    train AS (SELECT doc_id AS train_id, unnest(sh) AS g FROM base WHERE NOT is_bench),
    probes AS (
      SELECT train_id, g, pos FROM (
        SELECT train_id, g, {_sql_bloom_pos('g', 0)} AS pos FROM train
        UNION ALL SELECT train_id, g, {_sql_bloom_pos('g', 1)} FROM train
        UNION ALL SELECT train_id, g, {_sql_bloom_pos('g', 2)} FROM train
      )
    ),
    hits AS (
      SELECT train_id, g FROM probes JOIN bloom USING (pos)
      GROUP BY train_id, g HAVING COUNT(*) = 3
    ),
    fl AS (SELECT train_id, COUNT(*) AS n_hits FROM hits GROUP BY 1),
    per_doc AS (SELECT train_id, COUNT(*) AS n_grams FROM train GROUP BY 1)
    SELECT p.train_id,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(f.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(f.n_hits, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
             AS hit_rate,
           CAST(CAST(COALESCE(f.n_hits, 0) AS DOUBLE)
                / CAST(p.n_grams AS DOUBLE) >= 0.5 AS INT) AS flagged
    FROM per_doc p LEFT JOIN fl f USING (train_id)
"""


def r8_pipeline_bloom_screen(spark, sf_dir):
    """Bloom-filter decontamination screen: every non-benchmark doc's
    shingles probed against a 2^16-bit / 3-hash Bloom filter of the
    src0 eval set — the cheap first pass whose flags feed the exact
    contamination_report verifier.  The filter is a ≤ num_bits-row
    broadcast however large the benchmark; one corpus scan."""
    from pdtable_spark.operators.dedup import bloom_decontaminate

    docs = load(spark, sf_dir, "documents")
    return bloom_decontaminate(
        docs,
        F.col("source") == "src0",
        shingle_n=5,
        num_hashes=3,
        num_bits=_BLOOM_BITS,
        min_hit_rate=0.5,
    )


R8_QUERIES["pipeline_bloom_screen"] = (r8_pipeline_bloom_screen, R8_SQL_BLOOM)


# ---------------------------------------------------------------------------
# Hard-negative mining + kNN label propagation (operators/similarity.py)
# ---------------------------------------------------------------------------

R8_SQL_HARD_NEG = f"""
    WITH a AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qa,
                      label AS a_label
               FROM embeddings WHERE vec_id % 25 = 0),
    c AS (SELECT vec_id AS neg_id, CAST(embedding AS DOUBLE[]) AS ca,
                 label AS neg_label
          FROM embeddings),
    scored AS (
      SELECT anchor_id, neg_id, neg_label, {_COSINE_SQL} AS cosine_sim
      FROM c CROSS JOIN a WHERE neg_label <> a_label
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                     ORDER BY cosine_sim DESC, neg_id) AS INT) AS rank
      FROM scored WHERE cosine_sim < 0.999
    )
    SELECT anchor_id, neg_id, neg_label, cosine_sim, rank FROM r WHERE rank <= 5
"""


def r8_embedding_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each of 20
    anchors, the top-5 most-similar vectors with a DIFFERENT label, under
    a 0.999 cosine ceiling (cross-label near-exacts are mislabel
    suspects, not negatives).  Anchor batch broadcasts; one corpus scan."""
    from pdtable_spark.operators.similarity import hard_negatives

    emb = load(spark, sf_dir, "embeddings")
    return hard_negatives(emb, F.col("vec_id") % 25 == 0, k=5, ceiling=0.999)


R8_QUERIES["embedding_hard_negatives"] = (
    r8_embedding_hard_negatives,
    R8_SQL_HARD_NEG,
)


R8_SQL_LABEL_PROP = f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qa
               FROM embeddings WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca, label
          FROM embeddings WHERE vec_id % 10 <> 0),
    scored AS (SELECT query_id, vec_id, label, {_COSINE_SQL} AS s
               FROM c CROSS JOIN q),
    nn AS (
      SELECT query_id, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rn
        FROM scored) WHERE rn <= 10
    ),
    v AS (SELECT query_id, label, COUNT(*) AS votes FROM nn GROUP BY 1, 2)
    SELECT query_id, label AS predicted_label, CAST(votes AS BIGINT) AS votes,
           CAST(votes AS DOUBLE) / 10.0 AS confidence
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY votes DESC, label) AS rr FROM v)
    WHERE rr = 1
"""


def r8_embedding_label_propagation(spark, sf_dir):
    """kNN label propagation: every 10th vector plays unlabeled and takes
    the majority label of its 10 nearest labeled neighbors (ties toward
    the smaller label) — the seed-classifier expansion step of a
    quality-labeling pipeline, with confidence = votes/k."""
    from pdtable_spark.operators.similarity import knn_label_propagation

    emb = load(spark, sf_dir, "embeddings")
    return knn_label_propagation(emb, F.col("vec_id") % 10 == 0, k=10)


R8_QUERIES["embedding_label_propagation"] = (
    r8_embedding_label_propagation,
    R8_SQL_LABEL_PROP,
)


# ---------------------------------------------------------------------------
# Matryoshka truncation recall (operators/similarity.py::truncated_topk)
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import _RECALL_EXACT_SQL, _recall_at_10  # noqa: E402

_TRUNC_DIM = 16

R8_SQL_TRUNC_RECALL = f"""
    WITH tq AS (SELECT vec_id AS query_id,
                       list_slice(CAST(embedding AS DOUBLE[]), 1, {_TRUNC_DIM}) AS qa
                FROM embeddings WHERE vec_id < 5),
    tc AS (SELECT vec_id,
                  list_slice(CAST(embedding AS DOUBLE[]), 1, {_TRUNC_DIM}) AS ca
           FROM embeddings),
    tscored AS (SELECT query_id, vec_id, {_COSINE_SQL} AS s
                FROM tc AS c CROSS JOIN tq AS q),
    trunc AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rank
        FROM tscored) WHERE rank <= 10
    ),
    exact AS ({_RECALL_EXACT_SQL}),
    hits AS (
      SELECT e.query_id, COUNT(t.vec_id) AS n_hits
      FROM exact e LEFT JOIN trunc t
        ON t.query_id = e.query_id AND t.vec_id = e.vec_id
      GROUP BY e.query_id
    )
    SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / 10.0 AS recall_at_10
    FROM hits
"""


def r8_embedding_truncation_recall(spark, sf_dir):
    """Matryoshka truncation diagnostic: recall@10 of cosine retrieval over
    only the first 16 of 64 embedding components vs the full-dim exact
    baseline — the measurement that licenses the 4x-cheaper scan/index
    dims before pointing truncated retrieval at 100 TB (same tuning-loop
    shape as the LSH/IVF/PQ recall trio)."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    trunc = similarity.truncated_topk(emb, queries, dim=_TRUNC_DIM, k=10).select(
        "query_id", "vec_id"
    )
    exact = similarity.cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
    return _recall_at_10(exact, trunc)


R8_QUERIES["embedding_truncation_recall"] = (
    r8_embedding_truncation_recall,
    R8_SQL_TRUNC_RECALL,
)


# ---------------------------------------------------------------------------
# IVF-accelerated hard negatives + recall vs the exact miner
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import _IVF_NPROBE, _sql_cos  # noqa: E402

R8_SQL_HARD_NEG_RECALL = f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca, label
               FROM embeddings),
    a AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qa,
                 label AS a_label
          FROM embeddings WHERE vec_id % 25 = 0),
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
             FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    cd AS (
      SELECT c.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                ORDER BY {_sql_dist2('ca', 'ce')}, cent.cid) AS rn
      FROM c CROSS JOIN cent
    ),
    cassign AS (SELECT vec_id, cid AS cell FROM cd WHERE rn = 1),
    qd AS (
      SELECT a.anchor_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY a.anchor_id
                                ORDER BY {_sql_dist2('qa', 'ce')}, cent.cid) AS rn
      FROM a CROSS JOIN cent
    ),
    qprobe AS (SELECT anchor_id, cid AS cell FROM qd WHERE rn <= {_IVF_NPROBE}),
    ivf_scored AS (
      SELECT a.anchor_id, c.vec_id AS neg_id, {_sql_cos('qa', 'ca')} AS s
      FROM cassign JOIN qprobe USING (cell)
      JOIN c ON c.vec_id = cassign.vec_id
      JOIN a ON a.anchor_id = qprobe.anchor_id
      WHERE c.label <> a.a_label
    ),
    ivf AS (
      SELECT anchor_id, neg_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY s DESC, neg_id) AS rank
        FROM ivf_scored WHERE s < 0.999) WHERE rank <= 5
    ),
    exact_scored AS (
      SELECT a.anchor_id, c.vec_id AS neg_id, {_sql_cos('qa', 'ca')} AS s
      FROM c CROSS JOIN a WHERE c.label <> a.a_label
    ),
    exact AS (
      SELECT anchor_id, neg_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY s DESC, neg_id) AS rank
        FROM exact_scored WHERE s < 0.999) WHERE rank <= 5
    ),
    hits AS (
      SELECT e.anchor_id, COUNT(i.neg_id) AS n_hits
      FROM exact e LEFT JOIN ivf i
        ON i.anchor_id = e.anchor_id AND i.neg_id = e.neg_id
      GROUP BY e.anchor_id
    )
    SELECT anchor_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / 5.0 AS recall_at_5
    FROM hits
"""


def r8_embedding_hard_negative_recall(spark, sf_dir):
    """Recall@5 of IVF-mined hard negatives (label-carrying persisted
    index, nprobe-pruned probes) against the exact cross-label miner —
    the tuning measurement that licenses index-accelerated mining at
    100 TB, same loop as the retrieval recall trio."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    cents = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    idx = similarity.ivf_index(emb, cents, metadata_cols=["label"])
    anchors = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    ivf = similarity.hard_negatives_ivf(
        idx, anchors, cents, k=5, nprobe=_IVF_NPROBE, ceiling=0.999
    ).select("anchor_id", "neg_id")
    exact = similarity.hard_negatives(
        emb, F.col("vec_id") % 25 == 0, k=5, ceiling=0.999
    ).select("anchor_id", "neg_id")
    hits = (
        exact.alias("e")
        .join(
            ivf.alias("i"),
            (F.col("i.anchor_id") == F.col("e.anchor_id"))
            & (F.col("i.neg_id") == F.col("e.neg_id")),
            "left",
        )
        .groupBy(F.col("e.anchor_id").alias("anchor_id"))
        .agg(F.count(F.col("i.neg_id")).alias("n_hits"))
    )
    return hits.select(
        "anchor_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits").cast("double") / F.lit(5.0)).alias("recall_at_5"),
    )


R8_QUERIES["embedding_hard_negative_recall"] = (
    r8_embedding_hard_negative_recall,
    R8_SQL_HARD_NEG_RECALL,
)


# ---------------------------------------------------------------------------
# Two-stage decontamination funnel: Bloom screen -> exact verify on flagged
# ---------------------------------------------------------------------------

R8_SQL_DECON_FUNNEL = f"""
    WITH screen AS ({R8_SQL_BLOOM}),
    flagged AS (SELECT train_id FROM screen WHERE flagged = 1),
    base AS (SELECT doc_id, source = 'src0' AS is_bench, {_SQL_SHINGLES} AS sh
             FROM documents),
    bench AS (SELECT doc_id AS bench_id, len(sh) AS bench_size, unnest(sh) AS g
              FROM base WHERE is_bench),
    train AS (
      SELECT doc_id AS train_id, unnest(sh) AS g FROM base
      WHERE NOT is_bench AND doc_id IN (SELECT train_id FROM flagged)
    ),
    m AS (
      SELECT train_id, bench_id, bench_size, COUNT(*) AS n_common
      FROM train JOIN bench USING (g) GROUP BY 1, 2, 3
    )
    SELECT train_id, bench_id, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / CAST(bench_size AS DOUBLE) AS containment
    FROM m
    WHERE CAST(n_common AS DOUBLE) / CAST(bench_size AS DOUBLE) >= 0.3
"""


def r8_pipeline_decon_funnel(spark, sf_dir):
    """The production decontamination shape: the Bloom screen prunes the
    corpus to its flagged docs, and the exact (train, bench) containment
    verifier runs ONLY on those — the quadratic-looking pair stage sees a
    screen-sized input.  As ONE composed plan (this value-oracled
    spelling) the corpus is re-scanned per stage branch; at 100 TB the
    stages run separately — land the screen verdicts (a doc-id-sized
    table), then verify against the flagged ids — so the full corpus
    pays one scan plus a broadcast hash probe, exactly the batch screen's
    plan, and only flagged docs are read again."""
    from pdtable_spark.operators.dedup import (
        bloom_decontaminate,
        contamination_report,
    )

    docs = load(spark, sf_dir, "documents")
    bench_pred = F.col("source") == "src0"
    flagged = (
        bloom_decontaminate(
            docs, bench_pred, shingle_n=5, num_hashes=3,
            num_bits=_BLOOM_BITS, min_hit_rate=0.5,
        )
        .filter(F.col("flagged") == 1)
        .select(F.col("train_id").alias("doc_id"))
    )
    pruned = docs.filter(bench_pred).unionByName(
        docs.join(flagged, "doc_id", "left_semi")
    )
    return contamination_report(
        pruned, bench_pred, shingle_n=5, min_containment=0.3
    ).select("train_id", "bench_id", "n_common", "containment")


R8_QUERIES["pipeline_decon_funnel"] = (
    r8_pipeline_decon_funnel,
    R8_SQL_DECON_FUNNEL,
)


# ---------------------------------------------------------------------------
# Streaming Bloom screen (streaming/screen.py::bloom_screen_stream)
# ---------------------------------------------------------------------------

R8_SQL_STREAM_BLOOM = f"""
    WITH waves(w, batch_id) AS (VALUES (1, 0), (3, 1)),
    bench_g AS (
      SELECT DISTINCT unnest({_SQL_SHINGLES}) AS g FROM documents
      WHERE source = 'src0'
    ),
    bloom AS (
      SELECT DISTINCT pos FROM (
        SELECT {_sql_bloom_pos('g', 0)} AS pos FROM bench_g
        UNION ALL SELECT {_sql_bloom_pos('g', 1)} FROM bench_g
        UNION ALL SELECT {_sql_bloom_pos('g', 2)} FROM bench_g
      )
    ),
    train AS (
      SELECT b.batch_id, doc_id AS train_id, unnest({_SQL_SHINGLES}) AS g
      FROM documents JOIN waves b ON doc_id % 4 = b.w
    ),
    probes AS (
      SELECT batch_id, train_id, g, pos FROM (
        SELECT batch_id, train_id, g, {_sql_bloom_pos('g', 0)} AS pos FROM train
        UNION ALL SELECT batch_id, train_id, g, {_sql_bloom_pos('g', 1)} FROM train
        UNION ALL SELECT batch_id, train_id, g, {_sql_bloom_pos('g', 2)} FROM train
      )
    ),
    hits AS (
      SELECT batch_id, train_id, g FROM probes JOIN bloom USING (pos)
      GROUP BY batch_id, train_id, g HAVING COUNT(*) = 3
    ),
    fl AS (SELECT batch_id, train_id, COUNT(*) AS n_hits FROM hits GROUP BY 1, 2),
    per_doc AS (SELECT batch_id, train_id, COUNT(*) AS n_grams FROM train GROUP BY 1, 2)
    SELECT p.train_id,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(f.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(f.n_hits, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
             AS hit_rate,
           CAST(CAST(COALESCE(f.n_hits, 0) AS DOUBLE)
                / CAST(p.n_grams AS DOUBLE) >= 0.5 AS INT) AS flagged,
           CAST(p.batch_id AS BIGINT) AS batch_id
    FROM per_doc p LEFT JOIN fl f USING (batch_id, train_id)
"""


def r8_stream_bloom_screen(spark, sf_dir):
    """The streaming decontamination path under the correctness gate: two
    ingestion waves (doc_id%4==1, then %4==3) each picked up by its own
    ``availableNow`` run over ONE checkpoint, every micro-batch probed
    against the Bloom filter of the src0 eval set (built and persisted
    once), landed exactly-once as a batch_id-partitioned dynamic
    overwrite."""

    from pdtable_spark.io.jsonl import read_jsonl_stream
    from pdtable_spark.operators.dedup import bloom_build
    from pdtable_spark.streaming.screen import bloom_screen_stream

    d = scratch_dir("bloomscreen")
    land, out = f"{d}/land", f"{d}/out"
    docs = load(spark, sf_dir, "documents")
    bloom = bloom_build(
        docs.filter(F.col("source") == "src0"),
        shingle_n=5, num_hashes=3, num_bits=_BLOOM_BITS,
    )
    for wave in (1, 3):
        docs.filter(F.col("doc_id") % 4 == wave).write.json(land, mode="append")
        bloom_screen_stream(
            read_jsonl_stream(spark, land), bloom, out, f"{d}/ckpt",
            shingle_n=5, num_hashes=3, num_bits=_BLOOM_BITS, min_hit_rate=0.5,
        )
    rep = spark.read.parquet(out)
    return rep.select(
        "train_id", "n_grams", "n_hits", "hit_rate", "flagged",
        F.col("batch_id").cast("long").alias("batch_id"),
    )


R8_QUERIES["stream_bloom_screen"] = (
    r8_stream_bloom_screen,
    R8_SQL_STREAM_BLOOM,
)


# ---------------------------------------------------------------------------
# Perceptual (dHash) near-dup images (operators/multimodal.py::phash_near_dups)
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import _SQL_ASSETS, _assets  # noqa: E402


def _sql_px(i: int) -> str:
    # byte i (0-based) of the fake decode's sha256 digest = grid pixel i
    return f"CAST('0x' || substr(sha256(payload_text), {2 * i + 1}, 2) AS INT)"


def _sql_phash() -> str:
    terms = []
    for r in range(4):
        for c in range(3):
            b = r * 3 + c
            terms.append(
                f"CASE WHEN {_sql_px(4 * r + c)} > {_sql_px(4 * r + c + 1)} "
                f"THEN {1 << b} ELSE 0 END"
            )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


#: hamming <= 1 differs in at most one of the operator's two 6-bit bands,
#: so the pigeonhole blocking is lossless and the oracle is simply "all
#: pairs within the hamming radius" — no band arithmetic to mirror.
R8_SQL_PHASH_DUPS = f"""
    WITH assets AS ({_SQL_ASSETS}),
    px AS (SELECT asset_id, {_sql_phash()} AS phash FROM assets)
    SELECT a.asset_id AS id_a, b.asset_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM px a JOIN px b ON a.asset_id < b.asset_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 1
"""


def r8_multimodal_phash_dups(spark, sf_dir):
    """Perceptual near-duplicate images: dHash (neighbor-difference bits
    over the decoded 4×4 grid, fake codec = oracle mode) blocked by the
    SimHash pigeonhole, exact bit_count(xor) verify — payloads and frames
    never shuffle, only (id, 12-bit hash) pairs do."""
    from pdtable_spark.operators import multimodal

    feats = multimodal.extract_features(_assets(spark, sf_dir), dim=16, fake=True)
    return multimodal.phash_near_dups(feats, max_hamming=1)


R8_QUERIES["multimodal_phash_dups"] = (
    r8_multimodal_phash_dups,
    R8_SQL_PHASH_DUPS,
)


# ---------------------------------------------------------------------------
# Data-constrained epochs plan (operators/sampling.py::epochs_plan)
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import _SQL_TOKS  # noqa: E402

_EPOCHS_TARGETS = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
_EPOCHS_MAX = 2.0

R8_SQL_EPOCHS = f"""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(len({_SQL_TOKS}) AS DECIMAL(18,0))) AS BIGINT)
               AS total_tokens
      FROM documents WHERE source IN ('src1', 'src2', 'src3') GROUP BY 1
    ),
    b AS (
      SELECT CAST(6 * total_tokens AS DOUBLE) AS budget
      FROM per WHERE source = 'src2'
    ),
    t(source, target_share) AS (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2))
    SELECT p.source, n_docs, total_tokens,
           CAST(target_share AS DOUBLE) AS target_share,
           CAST(FLOOR(CAST(target_share AS DOUBLE) * budget)
                AS BIGINT) AS target_tokens,
           CAST(CAST(FLOOR(CAST(target_share AS DOUBLE) * budget)
                AS BIGINT) AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS epochs,
           CAST(CAST(CAST(FLOOR(CAST(target_share AS DOUBLE) * budget)
                AS BIGINT) AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                > {_EPOCHS_MAX} AS INT) AS repeat_risk
    FROM per p JOIN t USING (source) CROSS JOIN b
"""


def r8_pipeline_epochs_plan(spark, sf_dir):
    """Data-constrained pre-flight: how many epochs of each targeted
    source the (budget, mixture) pair implies, with the >max_epochs
    over-repetition flag (Muennighoff et al. 2023 — marginal value of a
    repeated epoch decays toward zero past ~4) — the rebalance-or-collect
    warning BEFORE a training run commits to a mixture.

    The budget is CORPUS-RELATIVE (6x src2's token count, a bounded
    scalar collect): the old fixed 6000 left src1 at 1.95 implied
    epochs — a hair under the 2.0 flag at sf0.01 and far under it at
    sf1, so repeat_risk was a constant 0 and the flag path was
    invisible to the value oracle (round-8 constant-column audit).
    Relative sizing keeps the flags MIXED (src1 fires, src2/src3 do
    not) at every SF because all per-source token totals scale
    together."""
    from pdtable_spark.operators.sampling import epochs_plan
    from pdtable_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    t2 = docs.filter(F.col("source") == "src2").agg(
        F.sum(
            F.when(F.col("text").isNotNull(), F.size(tokens(F.col("text"))))
        )
    ).collect()[0][0]
    return epochs_plan(
        docs, _EPOCHS_TARGETS, 6 * int(t2), max_epochs=_EPOCHS_MAX
    )


R8_QUERIES["pipeline_epochs_plan"] = (
    r8_pipeline_epochs_plan,
    R8_SQL_EPOCHS,
)


# ---------------------------------------------------------------------------
# Semantic packing: in-context-pretraining shards (cluster-then-pack)
# ---------------------------------------------------------------------------

R8_SQL_SEMANTIC_PACK = f"""
    WITH {_SQL_CLUSTER_ASSIGN},
    a AS (SELECT vec_id AS doc_id, CAST(cid AS INT) AS cell FROM cd WHERE rn = 1),
    d AS (SELECT doc_id, cell, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
          FROM documents JOIN a USING (doc_id))
    SELECT doc_id, cell, n_tokens,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY cell ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) / 400.0) AS BIGINT) AS pack_id
    FROM d
"""


def r8_pipeline_semantic_pack(spark, sf_dir):
    """In-context-pretraining shards (Shi et al. 2023, ICP): related
    documents land in the SAME trainer work unit — cluster assignment
    under the seed centroids, then token-budget packing WITHIN each cell
    (pack_budget's partitioned spelling: an ordinary per-cell window, no
    global order).  A long-context model then sees topically-coherent
    concatenations instead of random ones."""
    from pdtable_spark.operators import similarity
    from pdtable_spark.operators.text import pack_budget, token_count

    emb, cents = _seed_centroids(spark, sf_dir)
    idx = similarity.ivf_index(emb, cents).select(
        F.col("vec_id").alias("doc_id"), F.col("cell")
    )
    docs = load(spark, sf_dir, "documents")
    d = docs.join(idx, "doc_id").select(
        "doc_id",
        F.col("cell").cast("int").alias("cell"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    packed = pack_budget(
        d, capacity=400, n_tokens_col="n_tokens",
        order_cols=("doc_id",), partition_cols=("cell",),
    )
    return packed.select("doc_id", "cell", "n_tokens", "pack_id")


R8_QUERIES["pipeline_semantic_pack"] = (
    r8_pipeline_semantic_pack,
    R8_SQL_SEMANTIC_PACK,
)


# ---------------------------------------------------------------------------
# Uncertainty sampling for active learning (sampling.py::uncertainty_sample)
# ---------------------------------------------------------------------------

from pdtable_spark.queries.suite import (  # noqa: E402
    _CLF_BIAS,
    _CLF_WEIGHTS,
    _sql_clf_weights,
)

R8_SQL_UNCERTAINTY = f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    w(term, weight) AS (VALUES {_sql_clf_weights()}),
    s AS (SELECT doc_id, SUM(weight) AS wsum FROM toks JOIN w USING (term) GROUP BY 1),
    scored AS (
      SELECT d.doc_id,
             CAST({_CLF_BIAS!r} AS DOUBLE) + COALESCE(s.wsum, 0.0) AS score
      FROM documents d LEFT JOIN s USING (doc_id)
    ),
    m AS (SELECT doc_id, score, abs(score - (-0.25)) AS margin FROM scored)
    SELECT doc_id, score, margin,
           CAST(row_number() OVER (ORDER BY margin, doc_id) AS INT) AS rank
    FROM m ORDER BY margin, doc_id LIMIT 20
"""


def r8_pipeline_uncertainty_sample(spark, sf_dir):
    """Active-learning batch selection: the 20 docs whose linear-classifier
    score sits nearest the keep/drop threshold — margin-based uncertainty
    sampling, the label-what-the-model-doubts loop that grows a quality
    classifier's training set.  Global top-k is sort+limit (TakeOrdered),
    never a corpus-wide single-partition window.

    threshold = -0.25 (-16/64, an exact binary fraction like the
    weights): at 0.0 dozens of fixture docs score exactly zero, so the
    top-20 margins were a constant 0.0 and the margin ORDERING was only
    ever exercised as a doc_id tie-break (round-8 constant-column
    audit); off-mode the top-20 spans margins 1/64..8/64 with a real
    tie-break boundary inside the last group."""
    from pdtable_spark.operators.sampling import uncertainty_sample
    from pdtable_spark.operators.text import classifier_score

    docs = load(spark, sf_dir, "documents")
    scored = classifier_score(docs, _CLF_WEIGHTS, bias=_CLF_BIAS)
    return uncertainty_sample(scored, k=20, score_col="clf_score", threshold=-0.25)


R8_QUERIES["pipeline_uncertainty_sample"] = (
    r8_pipeline_uncertainty_sample,
    R8_SQL_UNCERTAINTY,
)


# ---------------------------------------------------------------------------
# Winnowing fingerprints + overlap pairs (operators/dedup.py, MOSS scheme)
# ---------------------------------------------------------------------------

_WINNOW_SEL_SQL = f"""
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
            list_transform(generate_series(1, greatest(len(toks) - 4, 1)),
              i -> CAST('0x' || substr(md5(array_to_string(
                     list_slice(toks, i, i + 4), ' ')), 1, 15) AS BIGINT)) AS h
          FROM t),
    w AS (SELECT doc_id, h,
                 unnest(generate_series(1, greatest(len(h) - 3, 1))) AS i
          FROM g),
    w2 AS (SELECT doc_id, CAST(i AS INT) AS i, list_slice(h, i, i + 3) AS s
           FROM w),
    sel AS (SELECT DISTINCT doc_id,
              CAST(i + len(s) - list_position(list_reverse(s), list_min(s))
                   AS INT) AS pos,
              list_min(s) AS fp
            FROM w2)
"""

R8_SQL_WINNOW = f"""
    WITH {_WINNOW_SEL_SQL}
    SELECT doc_id, pos, fp FROM sel
"""


def r8_text_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    scheme): per 4-window of positional 5-gram hashes, the minimum at its
    rightmost position — guaranteed to cover any shared run of >= 8
    tokens while keeping ~2/5 of the grams.  Scan-local array arithmetic;
    only selected prints explode."""
    from pdtable_spark.operators.dedup import winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, gram_n=5, window=4, hash_fn="md5_60")


R8_QUERIES["text_winnow_fingerprints"] = (
    r8_text_winnow_fingerprints,
    R8_SQL_WINNOW,
)


R8_SQL_WINNOW_PAIRS = f"""
    WITH {_WINNOW_SEL_SQL},
    dsel AS (SELECT DISTINCT doc_id, fp FROM sel)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM dsel a JOIN dsel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def r8_dedup_winnow_pairs(spark, sf_dir):
    """Document pairs sharing >= 2 winnowed fingerprints — the
    ngram-Jaccard detection shape on the winnowed subset: the postings
    index carries ~2/(window+1) of the grams with a known coverage floor
    (no shared 8-token run goes undetected)."""
    from pdtable_spark.operators.dedup import winnow_overlap_pairs

    docs = load(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        docs, gram_n=5, window=4, min_common=2, hash_fn="md5_60"
    )


R8_QUERIES["dedup_winnow_pairs"] = (
    r8_dedup_winnow_pairs,
    R8_SQL_WINNOW_PAIRS,
)


# ---------------------------------------------------------------------------
# Per-source cap (operators/sampling.py) — both spellings value-pinned
# ---------------------------------------------------------------------------

R8_SQL_SOURCE_CAP = """
    WITH s AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score FROM documents
    ),
    r AS (
      SELECT doc_id, source, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id ASC) AS rn
      FROM s
    )
    SELECT doc_id, source, score, CAST(2 AS BIGINT) AS n_spellings
    FROM r WHERE rn <= 10
"""


def r8_pipeline_source_cap(spark, sf_dir):
    """Per-domain cap (keep each source's best 10 by a quality proxy) in
    BOTH spellings pinned against each other: the exact window
    row_number and the crawl-scale screen-then-trim (per-source
    approx_percentile threshold broadcast back, then the exact window
    over the ~cap-sized survivors).  The union's per-row count is the
    pin — a row either spelling got wrong surfaces as n_spellings=1 (or
    an extra row), which the value oracle rejects."""
    from pdtable_spark.operators.sampling import (
        cap_per_source,
        cap_per_source_threshold,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    exact = cap_per_source(docs, 10, score_col="score")
    thr = cap_per_source_threshold(docs, 10, score_col="score")
    return (
        exact.unionAll(thr)
        .groupBy("doc_id", "source", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_spellings"))
    )


R8_QUERIES["pipeline_source_cap"] = (
    r8_pipeline_source_cap,
    R8_SQL_SOURCE_CAP,
)


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV share (operators/text.py)
# ---------------------------------------------------------------------------

R8_SQL_VOCAB_COVERAGE = r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents
    ),
    vocab AS (
      SELECT t FROM (SELECT t, COUNT(*) AS n FROM tok GROUP BY t)
      ORDER BY n DESC, t ASC LIMIT 16
    ),
    per AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             SUM(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS n_oov
      FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(p.n_tokens AS BIGINT) AS n_tokens,
           CAST(p.n_oov AS BIGINT) AS n_oov,
           CASE WHEN p.n_tokens > 0
                THEN CAST(p.n_oov AS DOUBLE) / p.n_tokens ELSE 0.0 END
             AS oov_share
    FROM documents d JOIN per p ON p.doc_id = d.doc_id
"""


def r8_text_vocab_coverage(spark, sf_dir):
    """Per-doc OOV share against the corpus's top-16 token vocabulary
    (deterministic tf-desc, token-asc boundary) — the tokenizer-fertility
    / domain-shift signal.  The vocabulary is a bounded collected
    artifact folded into a zero-shuffle scan-local membership
    expression (the IVF-centroid pattern).  vocab_size=16 < the
    fixtures' 31-token domain so n_oov is NON-ZERO at every SF: at the
    original 200 the fixtures have no OOV at all and the oracle never
    exercised the OOV counting path (the blind spot the round-8
    source_divergence fuzz bug exposed)."""
    from pdtable_spark.operators.text import vocab_coverage

    docs = load(spark, sf_dir, "documents")
    return vocab_coverage(docs, vocab_size=16).select(
        "doc_id", "source", "n_tokens", "n_oov", "oov_share"
    )


R8_QUERIES["text_vocab_coverage"] = (
    r8_text_vocab_coverage,
    R8_SQL_VOCAB_COVERAGE,
)


# ---------------------------------------------------------------------------
# Record-level privacy (operators/privacy.py): k-anonymity + risk report
# ---------------------------------------------------------------------------

R8_SQL_K_ANONYMIZE = """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment FROM customer
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
    FROM customer c
    JOIN g ON c.c_nationkey IS NOT DISTINCT FROM g.c_nationkey
          AND c.c_mktsegment IS NOT DISTINCT FROM g.c_mktsegment
"""


def r8_pipeline_k_anonymize(spark, sf_dir):
    """k-anonymity suppression over customer metadata: only rows whose
    (nation, segment) combination occurs >= 10 times survive — the
    pre-release privacy floor for record-level corpus metadata.  One
    map-side-combinable groupBy + a null-safe semi-join back."""
    from pdtable_spark.operators.privacy import k_anonymize

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return k_anonymize(cust, ["c_nationkey", "c_mktsegment"], 10)


R8_QUERIES["pipeline_k_anonymize"] = (
    r8_pipeline_k_anonymize,
    R8_SQL_K_ANONYMIZE,
)


R8_SQL_ANONYMITY_REPORT = """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             COUNT(DISTINCT c_acctbal) AS l
      FROM customer GROUP BY 1, 2
    ),
    ks(k) AS (VALUES (5), (10), (20))
    SELECT CAST(k AS INTEGER) AS k,
           CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below,
           CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_below,
           CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) AS share_rows_below,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(MIN(l) AS BIGINT) AS min_l_diversity
    FROM s CROSS JOIN ks GROUP BY k
"""


def r8_pipeline_anonymity_report(spark, sf_dir):
    """Re-identification risk report over customer (nation, segment)
    groups at thresholds 5/10/20, with account balance as the sensitive
    attribute (min_l_diversity) — the audit that picks k for
    :func:`~pdtable_spark.operators.privacy.k_anonymize`.  The per-k
    expansion runs on the distinct-combination-sized group frame, never
    the corpus."""
    from pdtable_spark.operators.privacy import anonymity_report

    cust = load(spark, sf_dir, "customer")
    return anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment"],
        ks=(5, 10, 20),
        sensitive_col="c_acctbal",
    )


R8_QUERIES["pipeline_anonymity_report"] = (
    r8_pipeline_anonymity_report,
    R8_SQL_ANONYMITY_REPORT,
)


# ---------------------------------------------------------------------------
# Shingle containment pairs (operators/dedup.py) — the asymmetric measure
# ---------------------------------------------------------------------------

R8_SQL_CONTAINMENT = f"""
    WITH base AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sized AS (SELECT doc_id, len(sh) AS sz, sh FROM base),
    posts AS (SELECT doc_id, sz, unnest(sh) AS g FROM sized),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS size_a, b.sz AS size_b,
             COUNT(*) AS n_common
      FROM posts a JOIN posts b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / CAST(size_a AS DOUBLE) AS contain_a_in_b,
           CAST(n_common AS DOUBLE) / CAST(size_b AS DOUBLE) AS contain_b_in_a,
           CAST(n_common AS DOUBLE) / CAST(least(size_a, size_b) AS DOUBLE)
             AS containment
    FROM inter
    WHERE CAST(n_common AS DOUBLE) / CAST(least(size_a, size_b) AS DOUBLE) >= 0.6
"""


def r8_dedup_containment_pairs(spark, sf_dir):
    """Asymmetric doc-inside-doc near-dups: shingle containment
    (inter / min set size) >= 0.6 over the same inverted-index plan as
    ngram_jaccard_pairs — catches a short doc quoted whole inside a long
    one, where Jaccard is arbitrarily small and never fires."""
    from pdtable_spark.operators.dedup import containment_pairs

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(docs, shingle_n=5, threshold=0.6)


R8_QUERIES["dedup_containment_pairs"] = (
    r8_dedup_containment_pairs,
    R8_SQL_CONTAINMENT,
)


# ---------------------------------------------------------------------------
# Snapshot diff (io/maintenance.py) — dataset-release bookkeeping as a query
# ---------------------------------------------------------------------------

R8_SQL_SNAPSHOT_DIFF = """
    SELECT doc_id, 'removed' AS change_type FROM documents
    WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id, 'changed' FROM documents
    WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0
    UNION ALL
    SELECT doc_id + 1000000, 'added' FROM documents
    WHERE doc_id % 11 = 0
"""


def r8_pipeline_snapshot_diff(spark, sf_dir):
    """Keyed diff between two corpus releases (what did this ingest DO):
    the new snapshot deterministically removes doc_id%7, rewrites the
    text of doc_id%5, and lands doc_id%11 again under shifted ids —
    diff_snapshots must classify every key as removed/changed/added with
    null-safe text comparison.  One key shuffle (full-outer on doc_id)."""
    from pdtable_spark.io.maintenance import diff_snapshots

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return diff_snapshots(docs, new, "doc_id", compare_cols=["text"])


R8_QUERIES["pipeline_snapshot_diff"] = (
    r8_pipeline_snapshot_diff,
    R8_SQL_SNAPSHOT_DIFF,
)


# ---------------------------------------------------------------------------
# Table-facade mutation chain (table.py R10-R14) under the value gate
# ---------------------------------------------------------------------------

def _sql_facade_ops():
    from pdtable_spark.queries.suite import _sql_dsum

    filled = "CASE WHEN o_orderkey % 3 = 0 THEN 0.0 ELSE o_totalprice END"
    return f"""
    SELECT CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FILLED'
                              WHEN 'P' THEN 'PART' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_sql_dsum(filled, 'price_filled_sum')},
           CAST(MAX(CAST(o_custkey AS INTEGER)) AS INTEGER) AS max_cust
    FROM orders GROUP BY 1
"""


def r8_pipeline_facade_ops(spark, sf_dir):
    """The reference's mutation surface (R10 replace, R11 cast, R12
    fillna, R14 rename — previously pytest-only) chained through the
    unit-checked Table facade in the graded path: replace order-status
    codes, cast the customer key to int, fill a deterministically-nulled
    price, rename it, then aggregate.  The facade's metadata bookkeeping
    must cost nothing: the plan is the raw DataFrame plan."""
    from pdtable_spark.frame import attach_units
    from pdtable_spark.queries.suite import dsum
    from pdtable_spark.table import Table

    df = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .withColumn(
            "price_or_null",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("o_totalprice")),
        )
    )
    t = Table(
        attach_units(
            df,
            unit_map={
                "o_orderkey": "-",
                "o_orderstatus": "text",
                "o_totalprice": "usd",
                "o_custkey": "-",
                "price_or_null": "usd",
            },
        ),
        name="orders",
    )
    t = t.replace({"O": "OPEN", "F": "FILLED", "P": "PART"}, subset=["o_orderstatus"])
    t = t.astype({"o_custkey": "int"})
    t = t.fillna(0.0, subset=["price_or_null"])
    t = t.rename_column("price_or_null", "price_filled")
    assert t["price_filled"].unit == "usd"
    g = t.group_by("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("price_filled", "price_filled_sum"),
        F.max("o_custkey").alias("max_cust"),
    )
    return g.df.select(
        F.col("o_orderstatus").alias("status"), "n", "price_filled_sum", "max_cust"
    )


R8_QUERIES["pipeline_facade_ops"] = (
    r8_pipeline_facade_ops,
    _sql_facade_ops(),
)


# ---------------------------------------------------------------------------
# Frozen-vocabulary OOV drift (operators/text.py vocab= path as designed)
# ---------------------------------------------------------------------------

R8_SQL_VOCAB_DRIFT = r"""
    WITH ref_tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE doc_id % 2 = 0
    ),
    vocab AS (
      SELECT t FROM (SELECT t, COUNT(*) AS n FROM ref_tok GROUP BY t)
      ORDER BY n DESC, t ASC LIMIT 16
    ),
    new_tok AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE doc_id % 2 = 1
    ),
    per AS (
      SELECT source, COUNT(*) AS n_tokens,
             SUM(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END)
               AS n_oov
      FROM new_tok GROUP BY source
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CASE WHEN n_tokens > 0
                THEN CAST(n_oov AS DOUBLE) / n_tokens ELSE 0.0 END
             AS oov_share
    FROM per
"""


def r8_text_vocab_drift(spark, sf_dir):
    """The frozen-vocabulary drift alarm as designed: build the top-16
    vocabulary on the REFERENCE half (even doc_ids), measure per-source
    OOV share on the INCOMING half (odd doc_ids) — a rising share is the
    early signal that a fixed tokenizer will shred the new data.
    Exercises the ``vocab=`` frozen path; the per-doc pass stays the
    zero-shuffle membership projection, aggregated per source."""
    from pdtable_spark.operators.text import top_vocab, vocab_coverage

    docs = load(spark, sf_dir, "documents")
    # 16 < the fixtures' 31-token domain — OOV non-zero at every SF
    frozen = top_vocab(docs.filter(F.col("doc_id") % 2 == 0), 16)
    cov = vocab_coverage(docs.filter(F.col("doc_id") % 2 == 1), vocab=frozen)
    tot = F.sum("n_tokens").cast("long")
    oov = F.sum("n_oov").cast("long")
    return cov.groupBy("source").agg(
        tot.alias("n_tokens"),
        oov.alias("n_oov"),
        F.when(tot > 0, oov.cast("double") / tot.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("oov_share"),
    )


R8_QUERIES["text_vocab_drift"] = (
    r8_text_vocab_drift,
    R8_SQL_VOCAB_DRIFT,
)


# ---------------------------------------------------------------------------
# Registration: the @q decoration for the whole block.  suite.py imports
# this module at the end of its body, so suite.QUERIES / suite.ORACLES —
# the single registry the driver contract, bench, and oracle sweeps read —
# contain these 34 entries exactly like any inline @q query.
from pdtable_spark.queries.suite import q as _q

for _name, (_fn, _sql) in R8_QUERIES.items():
    _q(_name, _sql)(_fn)
