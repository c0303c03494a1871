"""Custom stateful streaming operator: per-user sessionizer via
``applyInPandasWithState``.

Demonstrates the escape hatch for semantics ``session_window`` can't
express (custom gap logic, session-level derived features emitted on
timeout).  State per group is a compact tuple — O(users) state, Arrow-batched
transfer, no per-row Python round trips.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _sessionize(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    """Emit a row per closed session; keep the open session in state."""
    (user_id,) = key
    if state.hasTimedOut:
        (start, last, n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        (start, last, n, total) = state.get
    else:
        start = last = n = 0
        total = 0.0

    out = []
    for ts, value in zip(rows["ts"], rows["value"]):
        t = _us(ts)
        if n == 0:
            start, last, n, total = t, t, 1, float(value)
        elif t - last > _GAP_US:
            out.append((user_id, start, last, n, total))
            start, last, n, total = t, t, 1, float(value)
        else:
            last = max(last, t)
            n += 1
            total += float(value)

    state.update((start, last, n, total))
    state.setTimeoutTimestamp(last // 1_000 + _GAP_US // 1_000)

    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
                "total_value": [r[4] for r in out],
            }
        )


def sessionize_with_state(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful sessionization (30-min gap), closed sessions emitted
    as they finalize, open sessions flushed by event-time timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
