"""Watermarked window aggregations over an event stream.

All builders take a DataFrame with columns
``(event_id long, ts timestamp, user_id long, event_type string,
value double, props string)`` — the `events` testdata schema — and work
identically on batch and streaming inputs (Structured Streaming's
unified-API guarantee).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdtable_spark.streaming._await import await_or_raise


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: Optional[int] = None,
    ts_col: str = "ts",
) -> DataFrame:
    """File-source stream over a directory of events parquet.

    At 100 TB this is the replayable-backfill pattern: the same code points
    at a Kafka source by swapping ``format``; file source gives exactly-once
    via the checkpointed file log.

    The events testdata stores ``ts`` as parquet TIMESTAMP(NANOS).  How that
    arrives depends on the reader: Spark 4.1 reads it natively as
    ``timestamp_ntz`` (microsecond precision); older readers reject it
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case it
    arrives as ``bigint`` nanoseconds.  Streaming reads require an explicit
    schema, so we probe the ACTUAL arrival type with a driver-side batch
    schema read and convert ns→µs only when the column really is a long —
    the exact guard the batch path uses (``io/parquet.py:43``).  Forcing one
    schema unconditionally is how timestamps get silently corrupted when the
    reader behavior shifts between Spark versions.
    """
    probed = schema is None
    if probed:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            schema = spark.read.parquet(path).schema
        except Exception as err:
            raise ValueError(
                f"cannot probe the event schema from {path!r} (no readable "
                "parquet yet?). To start a stream over an empty landing "
                "directory, pass an explicit schema= matching the files "
                "that will arrive."
            ) from err
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    # Two normalizations with different scopes:
    # - bigint ns→µs rewrite: PROBE-ONLY.  A caller passing an explicit
    #   schema with `ts long` intends a raw integer column and keeps it.
    # - timestamp_ntz → timestamp cast: ALWAYS (explicit schemas included).
    #   Watermarks reject ntz (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so an
    #   ntz event-time column can never feed the streaming operators this
    #   reader exists for; the cast interprets wall clock in the session tz
    #   and collect() renders it back in the same tz, so values round-trip
    #   unchanged.  Callers who need ntz downstream should read with
    #   spark.readStream directly.
    if probed and dict(df.dtypes).get(ts_col) == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_hourly_by_type(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with late-data watermark.

    State per (window, type) only — bounded by watermark horizon; partial
    aggregation happens map-side before the single shuffle on the group key.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulation: exact, hence independent of the order in
            # which micro-batches / partial aggregates fold the doubles in —
            # the streaming result is bit-identical to the batch grouping
            # cast to decimal(28,4): Spark widens the SUM accumulator to
            # decimal(38,4) (the max), so the exact accumulation cannot
            # overflow-to-NULL under non-ANSI mode at any realistic scale;
            # values quantize to 4 decimals by design (documented contract)
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"),
                "event_type", "n")
    )


def stream_enriched_segment_counts(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each micro-batch of
    the event stream broadcast-joins the STATIC customer dimension, then a
    watermarked tumbling aggregate rolls up per (hour, market segment).

    Stream-static is the stateless join mode: the static side holds no
    streaming state (only the stream side is watermarked) and is re-planned
    per micro-batch, so a slowly-changing dimension picks up updates at
    batch boundaries for free.  At scale the dimension broadcast means the
    stream side never shuffles before the aggregate's single exchange on
    the (window, segment) group key.
    """
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("win"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulation: fold-order independent across
            # micro-batches — equals the batch grouping bit-for-bit
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "c_mktsegment", "n", "total_value")
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with a dynamic-close gap — Spark's native
    ``session_window`` (state merges adjacent windows; closes at watermark).

    This is the scale path for sessionization: no per-user Python state, all
    JVM state-store backed.  ``q_events_sessions`` in the suite is the batch
    gap-detection spelling of the same semantics.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal accumulation: fold-order independent (cross-engine and
            # batch/streaming deterministic)
            # cast to decimal(28,4): Spark widens the SUM accumulator to
            # decimal(38,4) (the max), so the exact accumulation cannot
            # overflow-to-NULL under non-ANSI mode at any realistic scale;
            # values quantize to 4 decimals by design (documented contract)
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    clicks within the preceding ``window`` (attribution).

    Both sides carry watermarks and the join has a time-range condition, so
    Spark bounds the state store on both sides (clicks older than
    watermark+window are evicted).  This is the streaming analog of the
    batch as-of join (`operators/asof.py`) with a bounded lookback.
    """
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (p.user_id == c.click_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {window}"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_ts"
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` keeps state bounded (plain
    ``dropDuplicates`` on a stream would grow state forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append",
    timeout: Optional[int] = 120,
):
    """Run a streaming plan to completion on the available input
    (``trigger(availableNow)``) into an in-memory table; returns the query.

    Use ``output_mode="complete"`` for aggregations when the full result is
    wanted regardless of watermark progress (append only emits
    watermark-closed windows).  Test/backfill helper — production sinks are
    ``writeStream.format("parquet"/"kafka")`` with a checkpoint location.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    return await_or_raise(q, timeout, "run_to_memory")
