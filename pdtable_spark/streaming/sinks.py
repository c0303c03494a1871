"""Streaming sinks with exactly-once semantics.

``writeStream.format("parquet")`` is already exactly-once for append-mode
plans (checkpoint + committer), but aggregation results in update mode and
any sink that must *overwrite* per-key state need ``foreachBatch`` — and
``foreachBatch`` is only at-least-once: after a failure the SAME batch id
can be delivered again.  The standard fix, implemented here, is to make the
batch write idempotent by keying the output on the batch id:

- re-delivery of batch N overwrites batch N's partition (same data → same
  result), never duplicates it;
- downstream readers see each batch exactly once.

This is the documented Spark pattern (Structured Streaming guide,
"foreachBatch" idempotence note), expressed as a reusable sink.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdtable_spark.streaming._await import await_or_raise


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N`` with dynamic partition overwrite — re-running a
    batch replaces its own output instead of appending a duplicate.

    Usage::

        q = (agg.writeStream.outputMode("update")
             .foreachBatch(idempotent_parquet_sink("/data/out"))
             .option("checkpointLocation", "/data/ckpt")
             .start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write_batch


def run_foreach_batch(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "update",
    timeout: Optional[int] = 120,
):
    """Run a streaming plan through the idempotent parquet sink on the
    available input (``availableNow``); returns the finished query."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(idempotent_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return await_or_raise(q, timeout, "run_foreach_batch")
