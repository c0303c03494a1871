"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the point of each variant):

- **exact**: one hash-aggregate shuffle on the text (or its md5 — group on the
  128-bit digest, not the full document, so shuffle volume is 16 bytes/doc).
- **minhash_lsh**: shingle → per-seed min-hash → band → bucket self-join.
  The self-join is on (band_id, band_hash) buckets, so the shuffle is
  bucket-sized, never O(n²).  Hashing uses ``xxhash64`` (JVM, codegen).
- **simhash**: 64-bit sign-aggregated fingerprint; near-dup = small Hamming
  distance within LSH buckets of the top bits.
- **ngram_jaccard**: exact Jaccard verification over candidate pairs —
  token-inverted-index join, safe only with long shingles (sparse postings).
- **embedding near-dup**: cosine > threshold via the similarity module.

Everything is built-in expressions — no Python in the hot path.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdtable_spark.operators.text import shingles, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per distinct text.

    Groups on ``md5(text)`` so the shuffle carries a 16-byte digest instead of
    the document body — at 100 TB this is the difference between shuffling
    100 TB and shuffling ~150 GB.  Returns (digest, keep_id, n_dups).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The surviving rows themselves (semi-join back to keep all columns)."""
    keep = exact_dedup(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """Per-doc MinHash signature: for each seed, min(xxhash64(seed, shingle)).

    One explode + one groupBy — the signature computation is a single shuffle
    keyed on the doc id; signature width is ``num_hashes``×8 bytes.
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(seed), F.col("shingle"))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band.

    Bands the signature into ``bands`` groups of ``num_hashes/bands`` rows;
    docs agreeing on a full band land in the same bucket.  The self-join is
    per-bucket — skew-safe as long as buckets stay small (raise ``bands``/
    ``num_hashes`` at higher dup rates).  Returns distinct (id_a, id_b) with
    id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
    jaccard_threshold: Optional[float] = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH, optionally verified with exact Jaccard
    over shingle sets.  Returns (id_a, id_b, jaccard)."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    if jaccard_threshold is None:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))
    sets_ = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    j = (
        cand.join(sets_.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets_.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")).cast("double"))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return j


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: sign-aggregate token hash bits.

    Implemented as explode → per-bit sign sum → reassemble.  The per-bit sums
    are one aggregate keyed on the doc id; bit extraction is ``shiftright``/
    ``&`` JVM expressions.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = tok.withColumn("h", F.xxhash64("tok"))
    bit_sums = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = bit_sums.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long")) for i in range(bits - 1)],
            F.when(F.col(f"b{bits-1}") > 0, F.lit(-(2 ** (bits - 1))).cast("long")).otherwise(F.lit(0).cast("long")),
        ).alias("simhash"),
    )
    return sim


def hamming64(a, b):
    """Hamming distance between two 64-bit longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Blocking on the top ``block_bits`` bits keeps the self-join bucket-sized
    (docs differing inside the block are missed — standard SimHash-LSH
    recall/cost tradeoff; lower block_bits for higher recall).
    """
    s = simhash(df, text_col, id_col)
    s = s.withColumn("block", F.shiftrightunsigned(F.col("simhash"), 64 - block_bits))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, on=[F.col("a.block") == F.col("b.block"), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .withColumn("hamming", hamming64(F.col("a.simhash"), F.col("b.simhash")))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.5,
    block_col: Optional[str] = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted-index self-join on
    shingles.

    The join is on individual shingles (long shingles → sparse postings
    lists), then intersection counts aggregate per pair.  ``block_col``
    (e.g. a source/partition column) further restricts candidate pairs.
    Returns (id_a, id_b, jaccard >= threshold).
    """
    base = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("sh_size", F.size("sh"))
    posts = base.select(
        id_col, "sh_size", *([block_col] if block_col else []), F.explode("sh").alias("g")
    )
    a, b = posts.alias("a"), posts.alias("b")
    on = [F.col("a.g") == F.col("b.g"), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
    if block_col:
        on.append(F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, on=on)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
