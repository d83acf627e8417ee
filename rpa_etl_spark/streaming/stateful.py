"""Custom stateful streaming operator via applyInPandasWithState.

PySpark has no mapGroupsWithState; the supported custom-state surface is
``applyInPandasWithState``. ``running_user_totals`` keeps one small state
tuple per user (event count, value sum) across micro-batches and emits the
updated running totals each batch — the streaming generalization of the
reference's per-execution audit accumulation (orchestrator.py:118-298).

State is per-key and explicitly timed out (processing-time) so the store
stays bounded — at 100 TB of events the state size tracks |active users|,
not |events|.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(3600 * 1000)
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: running (count, sum) per user with bounded state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# expiring sessions: state evicted by EVENT-TIME timeout (round 10)
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def _session_row(user_id, start_ms, last_ms, n, total):
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.to_datetime(start_ms, unit="ms")],
            "session_end": [pd.to_datetime(last_ms, unit="ms")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def make_session_update(gap_ms: int):
    """The applyInPandasWithState update function for gap-based sessions
    whose state is EVICTED BY EVENT-TIME TIMER: a session emits exactly
    once — when the watermark passes its last event + gap — and its state
    is removed at that moment. Rows inside a batch are sorted and split
    on gaps, so out-of-order arrival within the watermark and multiple
    sessions per batch are both correct; only the youngest (still-open)
    session stays in state."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _session_row(user_id, start, last, n, total)
            return
        ts_all: list[int] = []
        val_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(int(t) // 1_000_000 for t in pdf["ts"].astype("int64"))
            val_all.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts_all)), key=ts_all.__getitem__)
        cur = list(state.get) if state.exists else None  # [start, last, n, total]
        for i in order:
            t, v = ts_all[i], val_all[i]
            if cur is not None and t - cur[1] >= gap_ms:
                # gap inside the batch: the previous session is already
                # closed by the data itself — emit and start fresh
                yield _session_row(user_id, cur[0], cur[1], cur[2], cur[3])
                cur = None
            if cur is None:
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        # evict when the WATERMARK (event time, not wall clock) passes the
        # session's gap horizon; the guard keeps the registration legal if
        # the horizon is already behind the watermark (emit next trigger)
        state.setTimeoutTimestamp(
            max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )

    return update


def expiring_user_sessions(events: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Streaming gap-sessionization with state TTL semantics: one row per
    CLOSED session (append mode), state evicted by event-time timeout the
    moment the watermark passes ``last_event + gap``. State volume is
    |users with an open session| — bounded by construction, the property
    processing-time timeouts (running_user_totals) only approximate.

    Batch twin: groupBy(user, session_window(ts, gap)) — the declared
    query q_stream_session_ttl; tests/test_streaming.py asserts the
    streaming output equals the twin on closed sessions and that an
    open session is NOT emitted until the watermark moves."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_update(gap_minutes * 60 * 1000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
