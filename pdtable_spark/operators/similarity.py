"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set
  against the corpus; dot products via ``zip_with``+``aggregate`` (JVM
  higher-order functions, no Python).  One scan of the corpus, no shuffle
  except the final per-query top-k (tiny).  This is the evaluation baseline.
- ``rhp_lsh_topk``: random-hyperplane LSH — corpus and queries hashed to
  sign-bit buckets; candidates = same-bucket rows (multi-probe over
  ``num_tables`` independent tables); exact re-rank inside buckets.  The
  scale path: corpus scan is replaced by bucket-pruned joins.

The hyperplanes are generated deterministically from a seed with a
driver-side LCG (no numpy shipped to executors; the planes travel as column
literals — a few KB).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    """Dot product of two array<double|float> columns (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    # dot / sqrt(|a|² · |b|²): one sqrt, and self-similarity is exactly 1.0
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` must have (query_id_col, vec_col).  Query side is broadcast —
    the corpus is scanned once, partition-local, and only k rows per query
    per partition survive into the final shuffle (Spark's TakeOrdered within
    the window agg).  Ties break on corpus id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def _lcg_hyperplanes(dim: int, n_planes: int, seed: int) -> List[List[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes via a 64-bit LCG —
    reproducible across sessions without numpy."""
    state = seed & 0x7FFFFFFFFFFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (6364136223846793005 * state + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            # map to (-1, 1)
            row.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rhp_bucket(vec_col, planes: List[List[float]]):
    """Sign-bit bucket id of a vector against a list of hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(2 ** i).cast("long")
    return bucket


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    bits_per_table: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of
    ``num_tables`` hyperplane tables, then exact cosine re-rank.

    At 100 TB the corpus bucketing is computed once and persisted
    (write with ``partitionBy(table, bucket)``); queries then read only
    matching buckets — a partition-pruned scan instead of a full pass.
    """
    tables = [
        _lcg_hyperplanes(dim, bits_per_table, seed + 1000 * t) for t in range(num_tables)
    ]

    def bucketize(df: DataFrame, id_: str, out_vec: str) -> DataFrame:
        d = df.select(F.col(id_), _as_double(F.col(vec_col)).alias(out_vec))
        entries = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"), rhp_bucket(F.col(out_vec), tables[t]).alias("bkt")
                )
                for t in range(num_tables)
            ]
        )
        return d.select(id_, out_vec, F.explode(entries).alias("e")).select(
            id_, out_vec, F.col("e.tbl").alias("tbl"), F.col("e.bkt").alias("bkt")
        )

    cb = bucketize(corpus, id_col, "c_vec")
    qb = bucketize(queries, query_id_col, "q_vec")
    cand = (
        cb.join(F.broadcast(qb), on=["tbl", "bkt"])
        .select(query_id_col, id_col, "q_vec", "c_vec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via one RHP-LSH table + exact
    verification — the embedding-space analog of minhash_dedup."""
    planes = _lcg_hyperplanes(dim, bits, seed)
    d = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).withColumn(
        "bkt", rhp_bucket(F.col("v"), planes)
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, on=[F.col("a.bkt") == F.col("b.bkt"), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
