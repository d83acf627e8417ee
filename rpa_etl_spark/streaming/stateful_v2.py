"""Custom stateful streaming via transformWithStateInPandas (Spark 4 API).

The successor to ``applyInPandasWithState`` (streaming/stateful.py): a
``StatefulProcessor`` class with TYPED state handles — value state, list
state, and map state per key — plus timers, instead of one opaque state
tuple. ``UserEventProfile`` keeps a per-user running profile:

- ValueState ``totals``  — (event count, value sum);
- MapState  ``by_type``  — per-event-type counts (unbounded key alphabet
  would be a modeling error; event_type is a small closed set).

Each micro-batch emits the updated profile row per user seen in the batch
(Update semantics). State volume tracks |active users| x |event types| —
bounded, executor-resident (RocksDB state store), scale-safe.

ENVIRONMENT GATE: the transformWithState Python runner needs
``google.protobuf`` (state-server wire protocol), which this container
does not ship, so the runtime path cannot execute here —
``TWS_AVAILABLE`` is False and the test suite skips the execution test
while still type-checking the processor. On a cluster with protobuf
installed the operator runs as-is; the RocksDB state store provider is
configured by :func:`require_tws_session_confs`.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


def tws_available() -> bool:
    """True iff the transformWithState Python runner can start (it speaks
    protobuf to the JVM state server; without the module the runner
    crashes at init)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = tws_available()

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, n_types long"

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def require_tws_session_confs(spark: "SparkSession") -> None:
    """transformWithState requires the RocksDB state store; runtime-settable."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER)


class UserEventProfile(StatefulProcessor):
    """Per-user running profile: totals in a ValueState, per-event-type
    counts in a MapState. Emits one updated profile row per user per
    micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, total double")
        self._by_type = handle.getMapState("by_type", "event_type string", "n long")

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        (user_id,) = key
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        type_counts: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for t, c in pdf.groupby("event_type").size().items():
                type_counts[t] = type_counts.get(t, 0) + int(c)
        self._totals.update((n, total))
        for t, c in type_counts.items():
            prev = (
                self._by_type.getValue((t,))[0]
                if self._by_type.containsKey((t,))
                else 0
            )
            self._by_type.updateValue((t,), (prev + c,))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming: per-user profile (count, sum, distinct event types) with
    typed per-key state. Requires a protobuf-capable environment
    (``TWS_AVAILABLE``) and the RocksDB state store."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserEventProfile(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# expiring sessions: event-time TIMERS + state TTL (round 10, Spark-4 API)
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


class ExpiringUserSessions(StatefulProcessor):
    """Gap-sessionization on the transformWithState surface, exercising
    the two Spark-4 state-lifecycle features the v1 API lacks:

    - **timers**: every batch re-registers one event-time timer at the
      earliest live session's ``last_event + gap`` (deleting the previous
      one — the handle owns a timer SET per key, unlike v1's single
      timeout); ripe sessions are emitted from :meth:`handleExpiredTimer`,
      which prunes state as it goes;
    - **state TTL**: the session LIST state optionally carries
      ``ttlDurationMs`` (``state_ttl_ms``) as a hard leak bound — if a
      key's timer is somehow lost (e.g. an operator migration drops timer
      state), the store still reclaims the entry. TTL is PROCESSING-time,
      so it is off by default: a stream paused longer than the TTL would
      otherwise lose live sessions before their event-time timers fire.

    Semantics twin of stateful.make_session_update (the v1 form, which
    RUNS in this container and carries the wall-clock eviction test), and
    it shares that module's interval-merge helper: state holds ALL
    not-yet-ripe sessions and NOTHING emits before the watermark passes a
    session's gap horizon (the round-10 review fix — premature in-batch
    emission and missing session_start back-extension both diverged from
    the batch twin under late-but-within-watermark events). This
    processor is type-gated the same way as UserEventProfile — the
    transformWithState runner needs google.protobuf (TWS_AVAILABLE) —
    but its logic runs anywhere through a fake handle
    (tests/test_udtf_stateful.py).
    """

    def __init__(self, gap_ms: int = 5 * 60 * 1000,
                 state_ttl_ms: "int | None" = None):
        self.gap_ms = gap_ms
        # TTL is PROCESSING-time: enabling it accepts that a stream
        # paused/idle longer than the TTL loses its held sessions (the
        # store reclaims them before the event-time timer can fire) in
        # exchange for a hard bound on leaked state. Off by default —
        # timers own the lifecycle; turn it on for leak-bounded
        # deployments where that trade is wanted (review fix: a
        # hardcoded TTL silently dropped sessions across long pauses).
        self.state_ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState(
            "sessions", "start long, last long, n long, total double",
            ttlDurationMs=self.state_ttl_ms,
        )

    def _emit_ripe(self, user_id, sessions, wm):
        from rpa_etl_spark.streaming.stateful import _session_row

        live = []
        for s in sessions:
            if s[1] + self.gap_ms <= wm:
                yield _session_row(user_id, s[0], s[1], s[2], s[3])
            else:
                live.append(s)
        if live:
            self._sessions.put([tuple(s) for s in live])
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(
                max(min(s[1] + self.gap_ms for s in live), wm + 1)
            )
        else:
            self._sessions.clear()
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        from rpa_etl_spark.streaming.stateful import merge_session_intervals

        (user_id,) = key
        sessions = [list(s) for s in self._sessions.get()] if self._sessions.exists() else []
        for pdf in rows:
            ts_ms = pdf["ts"].astype("int64") // 1_000_000
            for t, v in zip(ts_ms, pdf["value"]):
                sessions.append([int(t), int(t), 1, float(v)])
        sessions = merge_session_intervals(sessions, self.gap_ms)
        yield from self._emit_ripe(
            user_id, sessions, timerValues.getCurrentWatermarkInMs()
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: ANN001
        (user_id,) = key
        sessions = [list(s) for s in self._sessions.get()] if self._sessions.exists() else []
        yield from self._emit_ripe(
            user_id, sessions, timerValues.getCurrentWatermarkInMs()
        )

    def close(self) -> None:
        pass


def expiring_user_sessions_tws(
    events: DataFrame,
    gap_minutes: int = 5,
    lateness_minutes: "int | None" = None,
    state_ttl_ms: "int | None" = None,
) -> DataFrame:
    """transformWithState form of stateful.expiring_user_sessions —
    event-time timers drive eviction (timeMode='EventTime'); same
    lateness/null handling as the v1 form. Requires TWS_AVAILABLE
    (protobuf) + RocksDB state store."""
    from pyspark.sql import functions as F

    delay = gap_minutes if lateness_minutes is None else lateness_minutes
    return (
        events.select(
            "user_id", "ts", F.coalesce(F.col("value"), F.lit(0.0)).alias("value")
        )
        .where(F.col("ts").isNotNull())
        .withWatermark("ts", f"{delay} minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            ExpiringUserSessions(
                gap_ms=gap_minutes * 60 * 1000, state_ttl_ms=state_ttl_ms
            ),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
