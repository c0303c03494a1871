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

from pdtable_spark.operators.text import shingle_hashes, shingles, tokens


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


def _signature_cols(sh_col, num_hashes: int):
    """MinHash signature as per-row array expressions: for each seed,
    ``array_min(transform(shingle_hashes, h -> xxhash64(seed, h)))``.

    Pure narrow JVM expressions — NO explode, NO groupBy: the naive
    explode+aggregate spelling shuffles every (doc, shingle) pair (at 100 TB
    that shuffle is larger than the corpus); this computes the same minima
    inside the row.  ``sh_col`` holds 64-bit shingle hashes (not strings):
    the per-seed rehash is a fixed-width hash, so seed passes cost long-ops,
    not string scans."""
    return [
        F.array_min(F.transform(sh_col, lambda h: F.xxhash64(F.lit(seed), h))).alias(
            f"mh_{seed}"
        )
        for seed in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """Per-doc MinHash signature: for each seed, min(xxhash64(seed, shingle)).

    Shuffle-free (see ``_signature_cols``); signature width is
    ``num_hashes``×8 bytes.  The shingle-hash array is projected in its own
    step so codegen evaluates the tokenize pipeline ONCE per row — inlining
    it into each of the ``num_hashes`` lambdas re-tokenizes per seed (measured
    10×+ slowdown).  Shingle identity = 64-bit hash (no gram strings built)."""
    sets_ = df.select(
        F.col(id_col), shingle_hashes(F.col(text_col), shingle_n).alias("__sh")
    )
    return sets_.select(F.col(id_col), *_signature_cols(F.col("__sh"), num_hashes))


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
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return _lsh_candidate_pairs(sig, id_col, num_hashes, bands)


def _lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Band the signature, then emit all id pairs per (band, bucket).

    NOT a self-join: grouping doc ids per bucket and expanding pair
    combinations with array expressions costs ONE shuffle total (on the
    bucket key) versus the self-join's two exchanges — and it sidesteps
    Spark re-evaluating the (unmaterialized) signature pipeline on both join
    sides, which profiling showed dominates wall time.  A pathological
    bucket of k docs yields k²/2 pairs under either strategy; raise
    ``bands``/``num_hashes`` if buckets grow.
    """
    rows_per_band = num_hashes // bands
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
    ids = F.col("ids")
    pair_combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_combos).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


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
    # hash-identity shingles: jaccard verification over 64-bit hash sets is
    # statistically identical to string sets (collision odds ~n²/2⁶⁴) and
    # skips building gram strings entirely
    sets_ = df.select(
        F.col(id_col), shingle_hashes(F.col(text_col), shingle_n).alias("sh")
    )
    sig = sets_.select(F.col(id_col), *_signature_cols(F.col("sh"), num_hashes))
    cand = _lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    if jaccard_threshold is None:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))
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
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted-index self-join on
    shingles.

    The join is on individual shingles (long shingles → sparse postings
    lists), then intersection counts aggregate per pair.  ``block_col``
    (e.g. a source/partition column) further restricts candidate pairs.
    Returns (id_a, id_b, jaccard >= threshold).

    Scale guard: a shingle appearing in k docs contributes k² candidate
    rows — one boilerplate phrase in 1M docs is a 10¹²-row join.
    ``max_doc_freq`` drops postings for shingles above that document
    frequency (standard df-cut; costs one extra aggregate on the posting
    key).  This UNDERCOUNTS intersections for pairs sharing only ultra-
    common shingles — exactly the pairs that aren't near-duplicates —
    so it is off by default for oracle-exactness and ON (e.g. 1000) for
    production corpora.
    """
    base = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("sh_size", F.size("sh"))
    posts = base.select(
        id_col, "sh_size", *([block_col] if block_col else []), F.explode("sh").alias("g")
    )
    if max_doc_freq is not None:
        rare = (
            posts.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("g")
        )
        posts = posts.join(rare, on="g", how="inner")
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
