"""Structured Streaming surface over events-shaped tables.

The reference has **no** streaming (SURVEY §2.4 note) — this module is the
beyond-reference extension driven by the `events` testdata table: watermarked
tumbling / sliding / session windows, streaming dedup, and a custom stateful
sessionizer via ``applyInPandasWithState``.

Design for scale: every aggregation here is expressed with built-in
``F.window`` / ``F.session_window`` grouping (JVM-side, incremental state in
the state store, partial aggregation map-side).  The Pandas-state path is
reserved for semantics Spark's built-ins can't express (per-user session
summaries with custom gap logic emitted on timeout).

Batch equivalence: each ``stream_*`` builder accepts any DataFrame — batch or
streaming — so the same plan is unit-testable in batch mode and runs
incrementally under ``readStream`` (the suite's ``q_events_hourly`` /
``q_events_sessions`` are the batch spellings).
"""

from .windows import (
    read_events_stream,
    stream_attribution_join,
    stream_enriched_segment_counts,
    stream_dedup,
    stream_hourly_by_type,
    stream_session_windows,
    stream_sliding_counts,
    run_to_memory,
)
from .stateful import sessionize_with_state
from .sinks import idempotent_parquet_sink, run_foreach_batch

__all__ = [
    "idempotent_parquet_sink",
    "read_events_stream",
    "run_foreach_batch",
    "run_to_memory",
    "sessionize_with_state",
    "stream_attribution_join",
    "stream_enriched_segment_counts",
    "stream_dedup",
    "stream_hourly_by_type",
    "stream_session_windows",
    "stream_sliding_counts",
]
