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


def _set_timeout(state: GroupState, desired_ms: int) -> None:
    """Set an event-time timeout, clamped above the current watermark.

    A micro-batch can deliver only OLD rows for a group (file sources batch
    in arbitrary order), making last_event + horizon fall below the
    already-advanced watermark — Spark rejects that with
    INVALID_TIMEOUT_TIMESTAMP.  Clamping to watermark+1 finalizes the group
    at the next watermark advance instead: the group's episode closes, and
    any genuinely newer events later open a fresh episode (standard
    watermark late-data semantics)."""
    state.setTimeoutTimestamp(max(desired_ms, state.getCurrentWatermarkMs() + 1))


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

    frames = list(pdfs)
    rows = (frames[0] if len(frames) == 1 else pd.concat(frames)).sort_values("ts")
    if state.exists:
        (start, last, n, total) = state.get
    else:
        start = last = n = 0
        total = 0.0

    # vectorized ns→µs conversion (guide §4.2; see _funnel)
    ts_vals = (
        pd.to_datetime(rows["ts"]).to_numpy().astype("datetime64[us]")
        .astype("int64")
    )
    out = []
    for t, value in zip(ts_vals.tolist(), rows["value"]):
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
    _set_timeout(state, last // 1_000 + _GAP_US // 1_000)

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


# ---------------------------------------------------------------------------
# Stateful funnel: view → click → purchase per user, finalized on timeout
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, stage int, first_view timestamp, first_click timestamp, "
    "first_purchase timestamp"
)
FUNNEL_STATE_SCHEMA = "ts_us array<long>, kind array<string>, last long"

_FUNNEL_HORIZON_US = 24 * 3600 * 1_000_000  # observation horizon: 24 h


def _funnel_stages(ts_us, kinds):
    """Strict-order funnel over a (ts-sorted) event list: first view, first
    click AFTER it, first purchase AFTER that.  Returns µs or None per stage."""
    fv = fc = fp = None
    for t, k in sorted(zip(ts_us, kinds)):
        if fv is None:
            if k == "view":
                fv = t
        elif fc is None:
            if k == "click" and t > fv:
                fc = t
        elif fp is None:
            if k == "purchase" and t > fc:
                fp = t
    return fv, fc, fp


def _funnel(key, pdfs, state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        ts_us, kinds, _last = state.get
        state.remove()
        fv, fc, fp = _funnel_stages(ts_us, kinds)
        stage = (fv is not None) + (fc is not None) + (fp is not None)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "stage": [stage],
                "first_view": [pd.Timestamp(fv, unit="us") if fv else pd.NaT],
                "first_click": [pd.Timestamp(fc, unit="us") if fc else pd.NaT],
                "first_purchase": [pd.Timestamp(fp, unit="us") if fp else pd.NaT],
            }
        )
        return

    frames = list(pdfs)
    rows = frames[0] if len(frames) == 1 else pd.concat(frames)
    # vectorized ns→µs conversion (guide §4.2): the per-row
    # pd.Timestamp(t).value loop cost ~3 µs × every event × every group
    # call; one numpy cast is the identical floor arithmetic
    ts_new = (
        pd.to_datetime(rows["ts"]).to_numpy().astype("datetime64[us]")
        .astype("int64")
        .tolist()
    )
    kind_new = list(rows["event_type"])
    if state.exists:
        ts_us, kinds, last = state.get
        ts_us, kinds = list(ts_us) + ts_new, list(kinds) + kind_new
    else:
        ts_us, kinds = ts_new, kind_new
    last = max(ts_us)
    state.update((ts_us, kinds, last))
    _set_timeout(state, last // 1_000 + _FUNNEL_HORIZON_US // 1_000)


def funnel_with_state(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user conversion funnel (view → click → purchase, strict event-time
    order) finalized when the watermark passes the user's last activity plus
    a 24 h horizon — the streaming spelling of ``q_events_funnel``.

    State is the user's event buffer (bounded by rate × horizon; the
    watermark lets Spark drop anything older), so within an episode the
    stage computation is exact regardless of how events interleave across
    micro-batches — a transition-only state would silently miss
    re-orderings.  Across a watermark that has already passed a user's
    horizon, standard late-data semantics apply: the episode finalizes and
    later events open a NEW episode, so a multi-batch run over historical
    data emits one row per activity episode where a single availableNow
    batch (watermark still at zero) emits one row per user — both are
    correct streaming answers for their arrival orders."""
    ev = events.filter(
        events.event_type.isin("view", "click", "purchase")
    ).select("user_id", "ts", "event_type")
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
