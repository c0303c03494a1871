"""The round-9 block of the declared suite — THIRTEEN queries staged
(with full DuckDB oracles and sf0.001/sf0.01 — most sf1 — MATCH
evidence) during round 8 and REGISTERED under ``@q`` here at the top of
round 9, executing the staging file's own runbook: the registration
loop at the bottom decorates every entry into the same
``suite.QUERIES``/``suite.ORACLES`` registries the driver contract,
bench, and oracle sweeps read.

Round-9 window arithmetic (written into ``__spark_entry__._PRIORITY``):
the 13 queries in this file + the 28 remaining r5-evidence rows + the 9
oldest r6-evidence rows = 50 exactly — after that window clears, no
registered query's evidence is more than two rounds old, retiring the
rotation debt for good.

The pre-registration correctness gate
(``tests/test_env_contract.py::test_pending_r9_oracles``) stays in
force — it now additionally asserts every entry IS registered.

Each entry satisfies the driver contract shape:
``fn(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdtable_spark.queries.suite import (
    _COSINE_SQL,
    _IVF_CELLS,
    _IVF_NPROBE,
    _sql_cos,
    _sql_dist2,
    load,
    scratch_dir,
)

#: name → (query fn, oracle sql): what round 9 registers.
PENDING_R9 = {}


# ---------------------------------------------------------------------------
# IVF-accelerated kNN label propagation + agreement vs the exact spelling
# (operators/similarity.py::knn_label_propagation_ivf, new round 8 — the
#  index-accelerated sibling VERDICT r7 asked for: the exact spelling was
#  the suite's slowest sf1 row at 430 s)
# ---------------------------------------------------------------------------

R9_SQL_LABEL_PROP_AGREEMENT = f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca, label
               FROM embeddings WHERE vec_id % 10 <> 0),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qa
          FROM embeddings WHERE vec_id % 10 = 0),
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
      SELECT q.query_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
                                ORDER BY {_sql_dist2('qa', 'ce')}, cent.cid) AS rn
      FROM q CROSS JOIN cent
    ),
    qprobe AS (SELECT query_id, cid AS cell FROM qd WHERE rn <= {_IVF_NPROBE}),
    ivf_scored AS (
      SELECT q.query_id, c.vec_id, c.label, {_sql_cos('qa', 'ca')} AS s
      FROM cassign JOIN qprobe USING (cell)
      JOIN c ON c.vec_id = cassign.vec_id
      JOIN q ON q.query_id = qprobe.query_id
    ),
    ivf_nn AS (
      SELECT query_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rn
        FROM ivf_scored) WHERE rn <= 10
    ),
    ivf_v AS (SELECT query_id, label, COUNT(*) AS votes
              FROM ivf_nn GROUP BY 1, 2),
    ivf_p AS (
      SELECT query_id, label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, label) AS rr
        FROM ivf_v) WHERE rr = 1
    ),
    ex_scored AS (
      SELECT query_id, c.vec_id, c.label, {_COSINE_SQL} AS s
      FROM c CROSS JOIN q
    ),
    ex_nn AS (
      SELECT query_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rn
        FROM ex_scored) WHERE rn <= 10
    ),
    ex_v AS (SELECT query_id, label, COUNT(*) AS votes
             FROM ex_nn GROUP BY 1, 2),
    ex_p AS (
      SELECT query_id, label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, label) AS rr
        FROM ex_v) WHERE rr = 1
    )
    SELECT e.query_id,
           e.label AS exact_label, CAST(e.votes AS BIGINT) AS exact_votes,
           p.label AS ivf_label, CAST(p.votes AS BIGINT) AS ivf_votes,
           CAST(e.label = p.label AS INT) AS agree
    FROM ex_p e JOIN ivf_p p ON p.query_id = e.query_id
"""


def r9_embedding_label_prop_agreement(spark, sf_dir):
    """Per-query agreement of IVF-accelerated label propagation
    (label-carrying persisted index over the labeled pool, nprobe-pruned
    probes) against the exact broadcast spelling — the tuning
    measurement that licenses index-accelerated labeling at 100 TB
    before pointing it at a corpus the exact spelling can't scan per
    batch (same measure-then-scale loop as the retrieval recall trio;
    at nprobe = n_cells the two spellings are pytest-pinned identical)."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    cents = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id") < _IVF_CELLS)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    pred = F.col("vec_id") % 10 == 0
    idx = similarity.ivf_index(emb.filter(~pred), cents, metadata_cols=["label"])
    queries = emb.filter(pred).select(F.col("vec_id").alias("query_id"), "embedding")
    ivf = similarity.knn_label_propagation_ivf(
        idx, queries, cents, k=10, nprobe=_IVF_NPROBE
    )
    exact = similarity.knn_label_propagation(emb, pred, k=10)
    return (
        exact.alias("e")
        .join(ivf.alias("i"), "query_id")
        .select(
            "query_id",
            F.col("e.predicted_label").alias("exact_label"),
            F.col("e.votes").cast("long").alias("exact_votes"),
            F.col("i.predicted_label").alias("ivf_label"),
            F.col("i.votes").cast("long").alias("ivf_votes"),
            (F.col("e.predicted_label") == F.col("i.predicted_label"))
            .cast("int")
            .alias("agree"),
        )
    )


PENDING_R9["embedding_label_prop_agreement"] = (
    r9_embedding_label_prop_agreement,
    R9_SQL_LABEL_PROP_AGREEMENT,
)


# ---------------------------------------------------------------------------
# Mergeable distinct-count ledger (operators/monitor.py::distinct_sketch /
# novelty_estimate, new round 8 — DataSketches HLL, JVM-native)
# ---------------------------------------------------------------------------

R9_SQL_NOVELTY_LEDGER = """
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_batch_exact,
           CAST(COUNT(DISTINCT CASE WHEN (doc_id % 97) % 3 = 0 THEN doc_id END)
                AS BIGINT) AS n_new_exact,
           CAST(1 AS INT) AS sketch_ok
    FROM documents WHERE (doc_id % 97) % 2 = 0
    GROUP BY source
"""


def r9_pipeline_novelty_ledger(spark, sf_dir):
    """Continuous-ingest novelty bookkeeping from sketches alone: a
    ledger of per-source HLL distinct sketches over the already-seen
    corpus ((doc_id%97)%3<>0), probed by a new batch ((doc_id%97)%2=0)
    — ``est_new`` estimates the never-seen keys ((doc_id%97)%6=0)
    without storing or rescanning historical ids.  The exact columns are
    fully value-oracled; ``sketch_ok`` pins both sketch estimates within
    max(2, 2%) of exact — deterministic (fixed hash, associative merge),
    so a green row stays green at every layout.

    lgk=16 (64 KB/sketch — still a KB-scale ledger): est_new is a
    DIFFERENCE of two estimates, so its error scales with the union
    cardinality, not the (smaller) new-key count; lgk=12's ~1.6% RSE
    breaks the 2% pin at sf1 (~25k keys/source — measured 7.8% worst
    rel err on est_new), while lgk=16 measures 0.12% worst — a 16x
    margin.  At true crawl cardinalities users size lgk the same way:
    RSE ~1.04/sqrt(2^lgk) against the TIGHTEST pinned quantity."""
    from pdtable_spark.operators import monitor

    docs = load(spark, sf_dir, "documents")
    # (doc_id %% 97) decorrelates from the fixtures' round-robin
    # doc->source assignment: plain %%2 gave every source EXACTLY 25
    # batch docs (n_batch_exact constant — staged-oracle audit)
    seen = docs.filter((F.col("doc_id") % 97) % 3 != 0)
    batch = docs.filter((F.col("doc_id") % 97) % 2 == 0)
    led = monitor.distinct_sketch(seen, "doc_id", "source", lgk=16)
    nov = monitor.novelty_estimate(led, batch, "doc_id", "source", lgk=16)
    exact = batch.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_batch_exact"),
        F.count_distinct(
            F.when((F.col("doc_id") % 97) % 3 == 0, F.col("doc_id"))
        ).alias("n_new_exact"),
    )

    def ok(est, ex):
        tol = F.greatest(F.lit(2.0), ex.cast("double") * F.lit(0.02))
        return F.abs(est.cast("double") - ex.cast("double")) <= tol

    return nov.join(exact, "source").select(
        "source",
        F.col("n_batch_exact").cast("long").alias("n_batch_exact"),
        F.col("n_new_exact").cast("long").alias("n_new_exact"),
        (
            ok(F.col("n_batch_distinct"), F.col("n_batch_exact"))
            & ok(F.col("est_new"), F.col("n_new_exact"))
        )
        .cast("int")
        .alias("sketch_ok"),
    )


PENDING_R9["pipeline_novelty_ledger"] = (
    r9_pipeline_novelty_ledger,
    R9_SQL_NOVELTY_LEDGER,
)


R9_SQL_STREAM_NOVELTY = """
    SELECT CAST(0 AS BIGINT) AS batch_id, source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_batch_exact,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_new_exact,
           CAST(1 AS INT) AS sketch_ok
    FROM documents WHERE doc_id % 3 = 0 GROUP BY source
    UNION ALL
    SELECT CAST(1 AS BIGINT), source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 3 <> 0 THEN doc_id END)
                AS BIGINT),
           CAST(1 AS INT)
    FROM documents WHERE doc_id % 4 = 0 GROUP BY source
"""


def r9_stream_novelty_ledger(spark, sf_dir):
    """The novelty ledger under the streaming gate: two ingestion waves
    (doc_id%3==0, then %4==0 — overlapping on %12==0) each picked up by
    its own ``availableNow`` run over ONE checkpoint; per micro-batch and
    source the never-seen-key estimate lands exactly-once against the
    accumulating sketch ledger.  Exact columns are fully value-oracled;
    ``sketch_ok`` pins both estimates within max(2, 2%) of exact
    (lgk=16 — the batch sibling's difference-of-estimates precision
    argument; 0.12% worst measured error at sf1 vs the 2% pin)."""

    from pdtable_spark.io.jsonl import read_jsonl_stream
    from pdtable_spark.streaming.monitor import novelty_ledger_stream

    d = scratch_dir("novelty")
    land, led, out = f"{d}/land", f"{d}/ledger", f"{d}/out"
    docs = load(spark, sf_dir, "documents")
    for wave_mod in (3, 4):
        docs.filter(F.col("doc_id") % wave_mod == 0).write.json(land, mode="append")
        novelty_ledger_stream(
            read_jsonl_stream(spark, land), led, out, f"{d}/ckpt", lgk=16
        )
    rep = spark.read.parquet(out)
    exact = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_batch_exact"))
        .select(
            F.lit(0).cast("long").alias("batch_id"),
            "source",
            "n_batch_exact",
            F.col("n_batch_exact").alias("n_new_exact"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 0)
            .groupBy("source")
            .agg(
                F.count_distinct("doc_id").alias("n_batch_exact"),
                F.count_distinct(
                    F.when(F.col("doc_id") % 3 != 0, F.col("doc_id"))
                ).alias("n_new_exact"),
            )
            .select(
                F.lit(1).cast("long").alias("batch_id"),
                "source",
                "n_batch_exact",
                "n_new_exact",
            )
        )
    )

    def ok(est, ex):
        tol = F.greatest(F.lit(2.0), ex.cast("double") * F.lit(0.02))
        return F.abs(est.cast("double") - ex.cast("double")) <= tol

    return rep.join(exact, ["batch_id", "source"]).select(
        F.col("batch_id").cast("long").alias("batch_id"),
        "source",
        F.col("n_batch_exact").cast("long").alias("n_batch_exact"),
        F.col("n_new_exact").cast("long").alias("n_new_exact"),
        (
            ok(F.col("n_batch_distinct"), F.col("n_batch_exact"))
            & ok(F.col("est_new"), F.col("n_new_exact"))
        )
        .cast("int")
        .alias("sketch_ok"),
    )


PENDING_R9["stream_novelty_ledger"] = (
    r9_stream_novelty_ledger,
    R9_SQL_STREAM_NOVELTY,
)


# ---------------------------------------------------------------------------
# Margin-based pair mining (operators/similarity.py::margin_mining, new
# round 8 — Artetxe & Schwenk 2019, the LASER/CCMatrix bitext miner)
# ---------------------------------------------------------------------------

R9_SQL_MARGIN_MINING = f"""
    WITH l AS (SELECT vec_id AS left_id, CAST(embedding AS DOUBLE[]) AS qa
               FROM embeddings WHERE vec_id % 7 = 0),
    r AS (SELECT vec_id AS right_id, CAST(embedding AS DOUBLE[]) AS ca
          FROM embeddings WHERE vec_id % 7 <> 0),
    p AS (SELECT left_id, right_id, {_sql_cos('qa', 'ca')} AS c
          FROM l CROSS JOIN r),
    fk AS (SELECT left_id, right_id, c,
                  CAST(FLOOR(c * 1000000000.0 + 0.5) AS BIGINT) AS cq
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY left_id
                                              ORDER BY c DESC, right_id) AS rx
                 FROM p) WHERE rx <= 4),
    degx AS (SELECT left_id, SUM(cq) AS dx, COUNT(*) AS nx
             FROM fk GROUP BY left_id),
    degy AS (SELECT right_id,
                    SUM(CAST(FLOOR(c * 1000000000.0 + 0.5) AS BIGINT)) AS dy,
                    COUNT(*) AS ny
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY right_id
                                                ORDER BY c DESC, left_id) AS ry
                   FROM p) WHERE ry <= 4 GROUP BY right_id),
    m AS (SELECT fk.left_id, fk.right_id, fk.c,
                 2.0 * CAST(cq AS DOUBLE)
                 / (CAST(dx AS DOUBLE) / CAST(nx AS DOUBLE)
                    + CAST(dy AS DOUBLE) / CAST(ny AS DOUBLE)) AS margin
          FROM fk JOIN degx USING (left_id) JOIN degy USING (right_id))
    SELECT left_id, right_id, c AS cosine_sim, margin
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY left_id
                                       ORDER BY margin DESC, right_id) AS rb
          FROM m)
    WHERE rb = 1 AND margin >= 1.05
"""


def r9_embedding_margin_mining(spark, sf_dir):
    """Aligned-pair mining across two embedding pools (vec_id%7 split
    standing in for the two languages/sources): per left vector, its
    best right match by RATIO margin — cos normalized by the mean of
    both sides' k-NN cosines (Artetxe & Schwenk 2019) — kept above the
    paper's 1.05 operating threshold.  Margin arithmetic runs over
    1e-9-quantized BIGINT degree sums, so the value is order-independent
    and bit-equal to the oracle; both top-k branches are
    WindowGroupLimit-pruned, so the |L|x|R| pair frame never shuffles."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    return similarity.margin_mining(
        emb.filter(F.col("vec_id") % 7 == 0),
        emb.filter(F.col("vec_id") % 7 != 0),
        k=4,
        threshold=1.05,
    )


PENDING_R9["embedding_margin_mining"] = (
    r9_embedding_margin_mining,
    R9_SQL_MARGIN_MINING,
)


# ---------------------------------------------------------------------------
# Corpus lexical diversity: distinct-n (operators/text.py::distinct_ngrams,
# new round 8 — Li et al. 2016 distinct-1/2/3; n=1 is the type-token ratio)
# ---------------------------------------------------------------------------

R9_SQL_DISTINCT_NGRAMS = r"""
    WITH tok AS (
      SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT source, n, unnest(gs) AS d FROM (
        SELECT source, 1 AS n, list_transform(ws, t -> md5(t)) AS gs FROM tok
        UNION ALL
        SELECT source, 2, list_transform(range(1, len(ws) - 2 + 2),
                   i -> md5(array_to_string(list_slice(ws, i, i + 1), ' ')))
        FROM tok WHERE len(ws) >= 2
        UNION ALL
        SELECT source, 3, list_transform(range(1, len(ws) - 3 + 2),
                   i -> md5(array_to_string(list_slice(ws, i, i + 2), ' ')))
        FROM tok WHERE len(ws) >= 3
      )
    )
    SELECT source, CAST(n AS INT) AS n, CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS n_distinct,
           CAST(COUNT(DISTINCT d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS distinct_ratio
    FROM grams GROUP BY source, n
"""


def r9_text_distinct_ngrams(spark, sf_dir):
    """Per-source lexical diversity: total/distinct n-gram counts and
    their ratio for n=1,2,3 (distinct-n; n=1 is the type-token ratio) —
    the dashboard that flags template floods and generation loops while
    the docs are still byte-distinct.  ONE corpus scan: the per-n gram
    arrays explode in-scan and shuffle as md5 digests, never strings."""
    from pdtable_spark.operators import text

    return text.distinct_ngrams(load(spark, sf_dir, "documents"))


PENDING_R9["text_distinct_ngrams"] = (
    r9_text_distinct_ngrams,
    R9_SQL_DISTINCT_NGRAMS,
)


# ---------------------------------------------------------------------------
# Per-source unigram divergence matrix
# (operators/text.py::source_divergence, new round 8)
# ---------------------------------------------------------------------------

R9_SQL_SOURCE_DIVERGENCE = r"""
    WITH tok AS (
      SELECT source AS src, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (
      SELECT t FROM (SELECT t, COUNT(*) AS n FROM tok GROUP BY t)
      ORDER BY n DESC, t ASC LIMIT 16
    ),
    keyed AS (
      SELECT src, CASE WHEN t IN (SELECT t FROM vocab) THEN t END AS k FROM tok
    ),
    counts AS (SELECT src, k, COUNT(*) AS c FROM keyed GROUP BY src, k),
    totals AS (SELECT src, SUM(c) AS tot FROM counts GROUP BY src),
    dom AS (SELECT DISTINCT k FROM counts),
    dens AS (
      SELECT totals.src, dom.k,
             CAST(COALESCE(c, 0) AS DOUBLE) / CAST(tot AS DOUBLE) AS p
      FROM totals CROSS JOIN dom
      LEFT JOIN counts ON counts.src = totals.src
                      AND counts.k IS NOT DISTINCT FROM dom.k
    ),
    terms AS (
      SELECT a.src AS source_a, b.src AS source_b,
             CAST(FLOOR((SQRT(a.p) - SQRT(b.p)) * (SQRT(a.p) - SQRT(b.p))
                        * 1000000000000000.0 + 0.5) AS BIGINT) AS h2q,
             CAST(FLOOR(ABS(a.p - b.p) * 1000000000000000.0 + 0.5) AS BIGINT)
               AS tvq
      FROM dens a JOIN dens b ON a.k IS NOT DISTINCT FROM b.k
      WHERE a.src < b.src
    )
    SELECT source_a, source_b,
           SQRT(CAST(SUM(h2q) AS DOUBLE) / 1000000000000000.0 / 2.0)
             AS hellinger,
           CAST(SUM(tvq) AS DOUBLE) / 1000000000000000.0 / 2.0 AS tvd
    FROM terms GROUP BY source_a, source_b
"""


def r9_pipeline_source_divergence(spark, sf_dir):
    """Pairwise Hellinger + total-variation distance between per-source
    unigram distributions over the corpus top-16 vocabulary plus one
    OOV mass bucket — the "which domains are lexically close" matrix
    that sizes mixture weights and flags register drift.  Hellinger
    (sqrt is correctly rounded — no ln ulp drift) with 1e-15-quantized
    BIGINT term sums: exact integer arithmetic in any row order.

    vocab_size=16 < the fixtures' 31-token domain, so the OOV bucket is
    NON-EMPTY at every SF — the oracle permanently gates the null-safe
    OOV join (a name-list EqualTo join silently zeroed the OOV mass;
    found by the brute-force fuzz test, invisible at vocab_size=200
    where the fixtures have no OOV)."""
    from pdtable_spark.operators import text

    return text.source_divergence(load(spark, sf_dir, "documents"), vocab_size=16)


PENDING_R9["pipeline_source_divergence"] = (
    r9_pipeline_source_divergence,
    R9_SQL_SOURCE_DIVERGENCE,
)


# ---------------------------------------------------------------------------
# Mergeable histogram ledger (operators/monitor.py::histogram_ledger /
# quantiles_from_ledger, new round 8 — the quantile sibling of the HLL
# distinct-count ledger)
# ---------------------------------------------------------------------------

R9_SQL_QUANTILE_LEDGER = r"""
    WITH led AS (
      SELECT source,
             CASE WHEN v < 0.0 THEN -1
                  WHEN v >= 500.0 THEN 50
                  ELSE LEAST(CAST(FLOOR((v - 0.0) / 10.0) AS INT), 49) END AS bin,
             COUNT(*) AS n
      FROM (SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
            WHERE n_chars IS NOT NULL)
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, bin, n,
             SUM(n) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS c,
             SUM(n) OVER (PARTITION BY source) AS tot
      FROM led
    ),
    cand AS (
      SELECT source, q, bin, n, c, tot,
             ROW_NUMBER() OVER (PARTITION BY source, q ORDER BY bin) AS r
      FROM cum CROSS JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
      WHERE CAST(c AS DOUBLE) >= q * CAST(tot AS DOUBLE)
    )
    SELECT source, q,
           CASE WHEN bin < 0 THEN 0.0
                WHEN bin >= 50 THEN 500.0
                ELSE 0.0 + CAST(bin AS DOUBLE) * 10.0
                     + ((q * CAST(tot AS DOUBLE) - CAST(c - n AS DOUBLE))
                        / CAST(n AS DOUBLE)) * 10.0 END AS est
    FROM cand WHERE r = 1
"""


def r9_pipeline_quantile_ledger(spark, sf_dir):
    """Cross-snapshot quantiles from histogram ledgers ALONE: two
    snapshot ledgers (even/odd doc ids) of fixed-boundary n_chars bin
    counts union by addition — the mergeability approx_percentile's GK
    state lacks across separately-written snapshots — and the merged
    ledger answers p50/p90/p99 per source with at most one bin width of
    error, no corpus rescan.  Overflow mass (n_chars > 500 here) is an
    explicit bin whose estimate clamps to the grid edge — visible, not
    silently absorbed.  Counts are exact BIGINTs and the interpolation
    is spelled identically in SQL, so estimates carry a FULL value
    oracle (no tolerance pin needed, unlike the HLL ledger)."""
    from pdtable_spark.operators import monitor

    docs = load(spark, sf_dir, "documents")
    a = monitor.histogram_ledger(
        docs.filter(F.col("doc_id") % 2 == 0), "n_chars", 0.0, 500.0, 50
    )
    b = monitor.histogram_ledger(
        docs.filter(F.col("doc_id") % 2 == 1), "n_chars", 0.0, 500.0, 50
    )
    merged = monitor.ledger_union(a.unionByName(b))
    return monitor.quantiles_from_ledger(merged, (0.5, 0.9, 0.99), 0.0, 500.0, 50)


PENDING_R9["pipeline_quantile_ledger"] = (
    r9_pipeline_quantile_ledger,
    R9_SQL_QUANTILE_LEDGER,
)


R9_SQL_STREAM_QUANTILE = r"""
    WITH obs AS (
      SELECT 0 AS batch_id, source, CAST(n_chars AS DOUBLE) AS v
      FROM documents WHERE doc_id % 3 = 0 AND n_chars IS NOT NULL
      UNION ALL
      SELECT 1, source, CAST(n_chars AS DOUBLE)
      FROM documents WHERE doc_id % 3 = 0 AND n_chars IS NOT NULL
      UNION ALL
      SELECT 1, source, CAST(n_chars AS DOUBLE)
      FROM documents WHERE doc_id % 4 = 0 AND n_chars IS NOT NULL
    ),
    led AS (
      SELECT batch_id, source,
             CASE WHEN v < 0.0 THEN -1
                  WHEN v >= 500.0 THEN 50
                  ELSE LEAST(CAST(FLOOR((v - 0.0) / 10.0) AS INT), 49) END AS bin,
             COUNT(*) AS n
      FROM obs GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT batch_id, source, bin, n,
             SUM(n) OVER (PARTITION BY batch_id, source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS c,
             SUM(n) OVER (PARTITION BY batch_id, source) AS tot
      FROM led
    ),
    cand AS (
      SELECT batch_id, source, q, bin, n, c, tot,
             ROW_NUMBER() OVER (PARTITION BY batch_id, source, q
                                ORDER BY bin) AS r
      FROM cum CROSS JOIN (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q)
      WHERE CAST(c AS DOUBLE) >= q * CAST(tot AS DOUBLE)
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id, source, q,
           CASE WHEN bin < 0 THEN 0.0
                WHEN bin >= 50 THEN 500.0
                ELSE 0.0 + CAST(bin AS DOUBLE) * 10.0
                     + ((q * CAST(tot AS DOUBLE) - CAST(c - n AS DOUBLE))
                        / CAST(n AS DOUBLE)) * 10.0 END AS est
    FROM cand WHERE r = 1
"""


def r9_stream_quantile_ledger(spark, sf_dir):
    """The histogram ledger under the streaming gate: two ingestion
    waves (doc_id%3==0, then %4==0 — overlapping on %12==0, counted
    twice: the ledger tracks OBSERVATIONS) each picked up by its own
    ``availableNow`` run over one checkpoint; per micro-batch and
    source the RUNNING n_chars quantiles land exactly-once against the
    accumulating bin-count ledger.  Counts are exact integers, so every
    estimate carries the full value oracle — no tolerance pin."""

    from pdtable_spark.io.jsonl import read_jsonl_stream
    from pdtable_spark.streaming.monitor import quantile_ledger_stream

    d = scratch_dir("qledger")
    land, led, out = f"{d}/land", f"{d}/ledger", f"{d}/out"
    docs = load(spark, sf_dir, "documents")
    for wave_mod in (3, 4):
        docs.filter(F.col("doc_id") % wave_mod == 0).write.json(land, mode="append")
        quantile_ledger_stream(
            read_jsonl_stream(spark, land), led, out, f"{d}/ckpt",
            "n_chars", 0.0, 500.0, 50, qs=(0.5, 0.9),
        )
    return spark.read.parquet(out).select(
        F.col("batch_id").cast("long").alias("batch_id"), "source", "q", "est"
    )


PENDING_R9["stream_quantile_ledger"] = (
    r9_stream_quantile_ledger,
    R9_SQL_STREAM_QUANTILE,
)


# ---------------------------------------------------------------------------
# Int8 scalar quantization + recall (operators/similarity.py::sq_bounds /
# sq_index / sq_query, new round 8 — the third compression leg after PQ
# and Matryoshka truncation)
# ---------------------------------------------------------------------------

def _sq_dq_cte(name: str, levels: int) -> str:
    return f"""
    {name} AS (
      SELECT vec_id,
             list_transform(ca, (x, i) -> CASE WHEN hi[i] = lo[i] THEN lo[i]
               ELSE lo[i]
                    + CAST(LEAST(GREATEST(CAST(FLOOR((x - lo[i]) / (hi[i] - lo[i])
                          * {levels}.0 + 0.5) AS INT), 0), {levels}) AS DOUBLE)
                      / {levels}.0 * (hi[i] - lo[i]) END) AS ca
      FROM ex CROSS JOIN bnd
    )"""


def _sq_topk_cte(name: str, dq: str) -> str:
    return f"""
    {name} AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rank
        FROM {dq} AS c CROSS JOIN q) WHERE rank <= 10
    )"""


R9_SQL_SQ_RECALL = f"""
    WITH ex AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ca FROM embeddings),
    dims AS (
      SELECT generate_subscripts(ca, 1) AS i, unnest(ca) AS v FROM ex
    ),
    bnd AS (
      SELECT list(mn ORDER BY i) AS lo, list(mx ORDER BY i) AS hi
      FROM (SELECT i, MIN(v) AS mn, MAX(v) AS mx FROM dims GROUP BY i)
    ),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qa
          FROM embeddings WHERE vec_id < 5),
    {_sq_dq_cte('dq8', 255)},
    {_sq_dq_cte('dq4', 15)},
    {_sq_topk_cte('sq8', 'dq8')},
    {_sq_topk_cte('sq4', 'dq4')},
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rank
        FROM ex AS c CROSS JOIN q) WHERE rank <= 10
    )
    SELECT e.query_id,
           CAST(COUNT(a.vec_id) AS BIGINT) AS n_hits_int8,
           CAST(COUNT(a.vec_id) AS DOUBLE) / 10.0 AS recall_int8,
           CAST(COUNT(b.vec_id) AS BIGINT) AS n_hits_4bit,
           CAST(COUNT(b.vec_id) AS DOUBLE) / 10.0 AS recall_4bit
    FROM exact e
    LEFT JOIN sq8 a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    LEFT JOIN sq4 b ON b.query_id = e.query_id AND b.vec_id = e.vec_id
    GROUP BY e.query_id
"""


def r9_embedding_sq_recall(spark, sf_dir):
    """Scalar-quantization recall diagnostic: recall@10 of asymmetric
    retrieval over the int8 (255-level) AND 4-bit (15-level) SQ grids
    vs the exact full-precision baseline, in one frame — the
    measurement that picks the grid before committing the 4x (or 8x)
    smaller embedding store, completing the PQ/Matryoshka/SQ
    compression-tuning trio.  Codes store as true 1-byte tinyints;
    dequantization happens inside the scan projection."""
    from pdtable_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    bounds = similarity.sq_bounds(emb)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=10).select("query_id", "vec_id")

    def hits(levels, suffix):
        idx = similarity.sq_index(emb, bounds, levels=levels)
        sq = similarity.sq_query(idx, queries, bounds, k=10, levels=levels).select(
            "query_id", "vec_id"
        )
        return (
            exact.alias("e")
            .join(
                sq.alias("a"),
                (F.col("a.query_id") == F.col("e.query_id"))
                & (F.col("a.vec_id") == F.col("e.vec_id")),
                "left",
            )
            .groupBy(F.col("e.query_id").alias("query_id"))
            .agg(
                F.count(F.col("a.vec_id")).cast("long").alias(f"n_hits_{suffix}"),
                (F.count(F.col("a.vec_id")).cast("double") / F.lit(10.0)).alias(
                    f"recall_{suffix}"
                ),
            )
        )

    return hits(255, "int8").join(hits(15, "4bit"), "query_id")


PENDING_R9["embedding_sq_recall"] = (
    r9_embedding_sq_recall,
    R9_SQL_SQ_RECALL,
)


# ---------------------------------------------------------------------------
# Right-to-erasure sweep (io/maintenance.py::forget_keys, new round 8 —
# the key-set sibling of retention_delete, under the query gate via its
# erasure certificate like pipeline_snapshot_diff)
# ---------------------------------------------------------------------------

R9_SQL_FORGET_AUDIT = """
    SELECT source,
           CAST(SUM(CASE WHEN (doc_id % 97) % 9 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_forgotten,
           CAST(SUM(CASE WHEN (doc_id % 97) % 9 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_kept
    FROM documents GROUP BY source
    HAVING SUM(CASE WHEN (doc_id % 97) % 9 = 0 THEN 1 ELSE 0 END) > 0
"""


def r9_pipeline_forget_audit(spark, sf_dir):
    """The GDPR/takedown sweep end-to-end under the value gate: a
    partitioned copy of documents, a deterministic takedown key set
    ((doc_id%97)%9==0), `forget_keys` rewriting ONLY the affected partition
    directories, and the per-partition erasure certificate as the
    result — n_forgotten/n_kept per touched source.  Disk-level effects
    (untouched dirs absent from out, fully-erased dirs write nothing)
    are pinned in tests/test_maintenance.py."""

    from pdtable_spark.io.maintenance import forget_keys

    d = scratch_dir("forget")
    docs = load(spark, sf_dir, "documents")
    docs.write.partitionBy("source").mode("overwrite").parquet(f"{d}/lake")
    # (doc_id%97)%9: ~6%% of docs, decorrelated from the round-robin
    # doc->source assignment so per-source certificate counts VARY (the
    # old %97 set hit exactly one doc in each touched source — constant
    # certificate, staged-oracle audit)
    keys = docs.filter((F.col("doc_id") % 97) % 9 == 0).select("doc_id")
    return forget_keys(
        spark, f"{d}/lake", keys, "doc_id", partition_col="source"
    )


PENDING_R9["pipeline_forget_audit"] = (
    r9_pipeline_forget_audit,
    R9_SQL_FORGET_AUDIT,
)


# ---------------------------------------------------------------------------
# Filter agreement / Cohen's kappa matrix
# (operators/monitor.py::filter_agreement, new round 8)
# ---------------------------------------------------------------------------

R9_SQL_FILTER_AGREEMENT = r"""
    WITH fl AS (
      SELECT CAST(n_chars >= 200 AS INT) AS f0,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) >= 40 AS INT)
               AS f1,
             CAST(contains(text, 'the') AS INT) AS f2
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(f0) AS s0, SUM(f1) AS s1, SUM(f2) AS s2,
             SUM(f0*f1) AS s01, SUM(f0*f2) AS s02, SUM(f1*f2) AS s12
      FROM fl
    ),
    pairs AS (
      SELECT 'f_len' AS filter_a, 'f_words' AS filter_b,
             n, s0 AS si, s1 AS sj, s01 AS sij FROM agg
      UNION ALL SELECT 'f_len', 'f_the', n, s0, s2, s02 FROM agg
      UNION ALL SELECT 'f_words', 'f_the', n, s1, s2, s12 FROM agg
    )
    SELECT filter_a, filter_b, CAST(n AS BIGINT) AS n,
           CAST(2.0*CAST(sij AS DOUBLE) - CAST(si AS DOUBLE)
                - CAST(sj AS DOUBLE) + CAST(n AS DOUBLE) AS BIGINT) AS n_agree,
           (2.0*CAST(sij AS DOUBLE) - CAST(si AS DOUBLE) - CAST(sj AS DOUBLE)
            + CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS po,
           CASE WHEN (CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                     * (CAST(sj AS DOUBLE)/CAST(n AS DOUBLE))
                     + (1.0 - CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                     * (1.0 - CAST(sj AS DOUBLE)/CAST(n AS DOUBLE)) < 1.0
                THEN ((2.0*CAST(sij AS DOUBLE) - CAST(si AS DOUBLE)
                       - CAST(sj AS DOUBLE) + CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)
                      - ((CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                         * (CAST(sj AS DOUBLE)/CAST(n AS DOUBLE))
                         + (1.0 - CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                         * (1.0 - CAST(sj AS DOUBLE)/CAST(n AS DOUBLE))))
                     / (1.0 - ((CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                         * (CAST(sj AS DOUBLE)/CAST(n AS DOUBLE))
                         + (1.0 - CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                         * (1.0 - CAST(sj AS DOUBLE)/CAST(n AS DOUBLE))))
           END AS kappa
    FROM pairs
"""


def r9_pipeline_filter_agreement(spark, sf_dir):
    """Curation QA: pairwise observed agreement + Cohen's kappa between
    three deterministic quality flags (length, word count, a content
    membership) — kappa near 1 says two filters are redundant compute,
    kappa near 0 at high raw agreement is the chance-agreement illusion
    kappa exists to correct.  ONE corpus scan into ONE
    map-side-combinable aggregate row; the pair matrix explodes from
    that single row, so F filters cost F(F−1)/2 codegen sums, never a
    shuffle of anything row-sized."""
    from pdtable_spark.operators import monitor
    from pdtable_spark.operators.text import tokens

    # explicit NULL lockstep with the oracle: the operator raises
    # loudly on NULL flags, the oracle's SUMs would silently skip them
    # — both sides exclude unscorable rows up front
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    flagged = docs.select(
        (F.col("n_chars") >= 200).alias("f_len"),
        (F.size(tokens(F.col("text"))) >= 40).alias("f_words"),
        F.col("text").contains("the").alias("f_the"),
    )
    return monitor.filter_agreement(flagged, ["f_len", "f_words", "f_the"])


PENDING_R9["pipeline_filter_agreement"] = (
    r9_pipeline_filter_agreement,
    R9_SQL_FILTER_AGREEMENT,
)


# ---------------------------------------------------------------------------
# Collocations by lift (operators/text.py::collocations, new round 8 —
# log-free PMI on the bigram event space)
# ---------------------------------------------------------------------------

R9_SQL_COLLOCATIONS = r"""
    WITH tok AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    bg AS (
      SELECT ws[i] AS w1, ws[i+1] AS w2
      FROM tok CROSS JOIN LATERAL unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    counts AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bg GROUP BY w1, w2),
    marg AS (
      SELECT w1, w2, n_pair,
             SUM(n_pair) OVER (PARTITION BY w1) AS n_w1,
             SUM(n_pair) OVER (PARTITION BY w2) AS n_w2,
             SUM(n_pair) OVER () AS N
      FROM counts
    )
    SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
           CAST(n_w1 AS BIGINT) AS n_w1, CAST(n_w2 AS BIGINT) AS n_w2,
           (CAST(n_pair AS DOUBLE) * CAST(N AS DOUBLE))
             / (CAST(n_w1 AS DOUBLE) * CAST(n_w2 AS DOUBLE)) AS lift
    FROM marg WHERE n_pair >= 5
    ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20
"""


def r9_text_collocations(spark, sf_dir):
    """Top-20 collocations by lift (min pair count 5): the
    statistically-bound word pairs that seed tokenizer-vocab candidates,
    multi-word PII patterns, and boilerplate-phrase discovery.  Lift is
    PMI's log-free rank-equivalent — a ratio of exact integer products,
    so the score is bit-equal across engines where ln would drift a
    ulp.  One corpus scan; both position marginals are window sums over
    the bigram-count frame itself."""
    from pdtable_spark.operators import text

    return text.collocations(load(spark, sf_dir, "documents"), k=20, min_count=5)


PENDING_R9["text_collocations"] = (
    r9_text_collocations,
    R9_SQL_COLLOCATIONS,
)


# ---------------------------------------------------------------------------
# Embedding second-moment / covariance matrix
# (operators/similarity.py::gram_matrix, new round 8 — the anisotropy /
#  embedding-collapse diagnostic and the PCA/whitening precursor)
# ---------------------------------------------------------------------------

R9_SQL_EMBEDDING_GRAM = """
    WITH q AS (
      SELECT list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) AS v
      FROM embeddings
    ),
    cells AS (
      SELECT CAST(t1.i AS INT) AS i, CAST(t2.j AS INT) AS j,
             v[t1.i + 1] * v[t2.j + 1] AS p,
             v[t1.i + 1] AS vi, v[t2.j + 1] AS vj
      FROM q, range(0, 64) t1(i), range(0, 64) t2(j)
      WHERE t2.j >= t1.i
    )
    SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p) AS DOUBLE) / 1000000000000.0
             / CAST(COUNT(*) AS DOUBLE) AS gram,
           (CAST(SUM(p) AS DOUBLE)
            - CAST(SUM(vi) AS DOUBLE) * CAST(SUM(vj) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
           / 1000000000000.0 / CAST(COUNT(*) AS DOUBLE) AS cov
    FROM cells GROUP BY i, j
"""


def r9_embedding_gram(spark, sf_dir):
    """The embedding-health matrix: second-moment and covariance entries
    over the upper triangle of the 64-dim embedding space — a collapsing
    covariance spectrum is the standard anisotropy alarm, and this
    matrix's eigenbasis (pca_basis, driver-side over d² entries) drives
    the pca_project whitening path (numpy-parity pytest).  Components
    quantize to 1e-6 BIGINTs in-scan, so every product and mean is exact
    integer arithmetic — a FULL value oracle on a second-moment
    statistic, no tolerance pin."""
    from pdtable_spark.operators import similarity

    return similarity.gram_matrix(load(spark, sf_dir, "embeddings"))


PENDING_R9["embedding_gram"] = (
    r9_embedding_gram,
    R9_SQL_EMBEDDING_GRAM,
)


# ---------------------------------------------------------------------------
# Registration: the @q decoration for the whole block (executed round-9
# runbook — VERDICT r8 task #1).  suite.py imports this module at the end
# of its body, so suite.QUERIES / suite.ORACLES — the single registry the
# driver contract, bench, and oracle sweeps read — contain these 13
# entries exactly like any inline @q query.
from pdtable_spark.queries.suite import q as _q

for _name, (_fn, _sql) in PENDING_R9.items():
    _q(_name, _sql)(_fn)
