"""Streaming decontamination screening: every ingest micro-batch probed
against a PRE-BUILT Bloom filter of the benchmark/eval corpus — the
continuous form of :func:`pdtable_spark.operators.dedup.bloom_decontaminate`.

This is the shape a landing pipeline wants: the benchmark set changes
rarely (persist its :func:`~pdtable_spark.operators.dedup.bloom_build`
frame once), while training documents arrive continuously; each
micro-batch pays one scan of ITSELF plus the broadcast hash probe, and
flagged docs route to the exact containment verifier out-of-band.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdtable_spark.operators.dedup import bloom_decontaminate
from pdtable_spark.streaming._await import await_or_raise


def _screen_batch(
    batch_df: DataFrame,
    batch_id: int,
    bloom: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_hashes: int,
    num_bits: int,
    min_hit_rate: float,
) -> None:
    """One micro-batch's screen rows (split out so the empty-batch and
    retry paths are unit-testable without a running stream)."""
    rep = bloom_decontaminate(
        batch_df,
        F.lit(False),  # the stream IS the training side; bloom is pre-built
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        num_bits=num_bits,
        min_hit_rate=min_hit_rate,
        bloom=bloom,
    )
    (
        rep.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def bloom_screen_stream(
    stream_docs: DataFrame,
    bloom: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 3,
    num_bits: int = 1 << 16,
    min_hit_rate: float = 0.5,
    timeout: Optional[int] = 120,
):
    """Run an ``availableNow`` pass over a document stream, probing each
    micro-batch against the static ``bloom`` filter frame (from
    :func:`~pdtable_spark.operators.dedup.bloom_build`) and landing one
    (train_id, n_grams, n_hits, hit_rate, flagged, batch_id) row per doc.

    Exactly-once: output is a ``batch_id``-partitioned dynamic overwrite,
    so a retried micro-batch replaces its own rows (the
    :mod:`~pdtable_spark.streaming.curate` pattern).

    The filter is persisted ONCE for the run — it is bounded by
    ``num_bits`` rows however large the benchmark, and re-deriving it per
    micro-batch would re-scan the benchmark corpus for an unchanging
    result (the :mod:`~pdtable_spark.streaming.monitor` reference-counts
    rule).
    """
    bloom_p = bloom.persist()
    try:
        bloom_p.count()  # materialize before the first batch fires

        def run(batch_df: DataFrame, batch_id: int) -> None:
            # no empty-batch short-circuit: an emptied batch lands zero
            # rows for its batch_id partition, which is itself the signal
            _screen_batch(
                batch_df, batch_id, bloom_p, out_dir,
                id_col, text_col, shingle_n, num_hashes, num_bits, min_hit_rate,
            )

        q = (
            stream_docs.writeStream.outputMode("append")
            .foreachBatch(run)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        return await_or_raise(q, timeout, "bloom_screen_stream")
    finally:
        bloom_p.unpersist()
