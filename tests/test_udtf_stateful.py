"""Tests for the Python escape hatches: UDTF block splitting, grouped
applyInPandas percentiles, applyInPandasWithState running totals."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from rpa_etl_spark.operators.udtf_blocks import percentile_summary, split_blocks
from rpa_etl_spark.streaming.stateful import running_user_totals
from rpa_etl_spark.tables import load
from tests.test_parsing import GOLDEN


def test_udtf_block_split(spark):
    df = spark.createDataFrame([(1, GOLDEN)], "doc_id long, text string")
    rows = split_blocks(df).collect()
    by_type = {r["block_type"]: r for r in rows}
    assert set(by_type) == {"HEADER", "ISSUER", "RECIPIENT", "ITEMS", "FINANCIALS"}
    assert "TECH SOLUTIONS" in by_type["ISSUER"]["block_text"]
    assert "COMERCIO GLOBAL" in by_type["RECIPIENT"]["block_text"]
    assert "4.450,00" in by_type["FINANCIALS"]["block_text"]
    # blocks are ordered and non-overlapping
    positions = sorted(r["pos"] for r in rows)
    assert positions == [r["pos"] for r in sorted(rows, key=lambda r: r["pos"])]


def test_udtf_empty_and_unstructured(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no markers here at all")], "doc_id long, text string"
    )
    rows = split_blocks(df).collect()
    # empty text yields nothing; unstructured yields a single HEADER block
    assert [(r["doc_id"], r["block_type"]) for r in rows] == [(2, "HEADER")]


def test_percentile_summary_matches_numpy(spark, sf_dir):
    import numpy as np

    orders = load(spark, sf_dir, "orders")
    out = {
        r["o_orderstatus"]: r
        for r in percentile_summary(orders, "o_orderstatus", "o_totalprice").collect()
    }
    rows = orders.select("o_orderstatus", "o_totalprice").collect()
    by_status: dict[str, list[float]] = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    for status, vals in by_status.items():
        assert out[status]["n"] == len(vals)
        assert abs(out[status]["p50"] - float(np.percentile(vals, 50))) < 1e-9


def test_stateful_running_totals(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        {
            "event_id": i,
            "ts": (base + timedelta(seconds=i)).isoformat(sep=" "),
            "user_id": i % 3,
            "event_type": "click",
            "value": float(i),
            "props": "{}",
        }
        for i in range(30)
    ]
    src = tmp_path / "stream"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).json(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r for r in spark.table("state_out").collect()}
    for uid in (0, 1, 2):
        vals = [float(i) for i in range(30) if i % 3 == uid]
        assert got[uid]["n_events"] == len(vals)
        assert abs(got[uid]["total_value"] - sum(vals)) < 1e-9


def test_tws_user_profiles(spark, tmp_path):
    """transformWithStateInPandas twin of running_user_totals, with typed
    state (ValueState + MapState). Skips where the TWS Python runner's
    protobuf dependency is absent (this container); the processor class
    itself is always constructed so schema/API drift still fails fast."""
    import pytest

    from rpa_etl_spark.streaming.stateful_v2 import (
        TWS_AVAILABLE,
        UserEventProfile,
        require_tws_session_confs,
        running_user_profiles,
    )

    # construction + schema sanity run everywhere
    proc = UserEventProfile()
    assert hasattr(proc, "handleInputRows")
    if not TWS_AVAILABLE:
        pytest.skip("google.protobuf absent: TWS runner cannot start here")

    require_tws_session_confs(spark)
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        {
            "event_id": i,
            "ts": (base + timedelta(seconds=i)).isoformat(sep=" "),
            "user_id": i % 3,
            "event_type": ["click", "view"][i % 2],
            "value": float(i),
            "props": "{}",
        }
        for i in range(30)
    ]
    src = tmp_path / "tws_stream"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).json(str(src))
    q = (
        running_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r for r in spark.table("tws_out").collect()}
    for uid in (0, 1, 2):
        vals = [float(i) for i in range(30) if i % 3 == uid]
        assert got[uid]["n_events"] == len(vals)
        assert abs(got[uid]["total_value"] - sum(vals)) < 1e-9
        assert got[uid]["n_types"] == len({["click", "view"][i % 2] for i in range(30) if i % 3 == uid})


def test_tws_expiring_sessions_timer_logic(spark, tmp_path):
    """The transformWithState expiring-session processor (timers + state
    TTL). The runner needs protobuf (absent here), but the PROCESSOR LOGIC
    runs anywhere: a fake handle drives handleInputRows/handleExpiredTimer
    directly and pins the round-10 review semantics — NOTHING emits before
    the watermark passes a session's horizon (in-batch gaps included),
    late events back-extend/bridge sessions, timers re-register at the
    earliest live horizon, and eviction prunes exactly the ripe set."""
    import pandas as pd

    from rpa_etl_spark.streaming.stateful_v2 import (
        TWS_AVAILABLE,
        ExpiringUserSessions,
    )

    class FakeList:
        def __init__(self):
            self.v = []
        def exists(self):
            return bool(self.v)
        def get(self):
            return iter(self.v)
        def put(self, rows):
            self.v = list(rows)
        def clear(self):
            self.v = []

    class FakeHandle:
        def __init__(self):
            self.state = FakeList()
            self.timers = []
        def getListState(self, name, schema, ttlDurationMs=None):
            assert ttlDurationMs and ttlDurationMs > 0  # TTL surface is set
            return self.state
        def listTimers(self):
            return list(self.timers)
        def deleteTimer(self, t):
            self.timers.remove(t)
        def registerTimer(self, t):
            self.timers.append(t)

    class FakeTimerValues:
        def __init__(self, wm):
            self.wm = wm
        def getCurrentWatermarkInMs(self):
            return self.wm

    gap = 5 * 60 * 1000
    # TTL passed explicitly (it is None by default — processing-time TTL
    # can lose live sessions across long pauses, an operator opt-in)
    proc = ExpiringUserSessions(gap_ms=gap, state_ttl_ms=10 * gap)
    h = FakeHandle()
    proc.init(h)
    t0 = 1_700_000_000_000
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([t0, t0 + 30_000, t0 + 20 * 60 * 1000], unit="ms"),
            "value": [1.0, 2.0, 4.0],
        }
    )
    # in-batch gap at watermark 0: NOTHING emits (neither session's
    # horizon is past the watermark); both sessions live; ONE timer at
    # the earliest horizon
    emitted = list(proc.handleInputRows((7,), iter([pdf]), FakeTimerValues(0)))
    assert emitted == []
    assert h.state.v == [
        (t0, t0 + 30_000, 2, 3.0),
        (t0 + 20 * 60 * 1000, t0 + 20 * 60 * 1000, 1, 4.0),
    ]
    assert h.timers == [t0 + 30_000 + gap]
    # a LATE (but above-watermark) event BEFORE the held sessions
    # back-extends the first one — session_start moves earlier
    late = pd.DataFrame(
        {"ts": pd.to_datetime([t0 - 60_000], unit="ms"), "value": [8.0]}
    )
    assert list(proc.handleInputRows((7,), iter([late]), FakeTimerValues(0))) == []
    assert h.state.v[0] == (t0 - 60_000, t0 + 30_000, 3, 11.0)
    # watermark passes the first horizon only: timer fires, exactly the
    # ripe session emits, the young one stays with a fresh timer
    wm1 = t0 + 30_000 + gap
    out = list(proc.handleExpiredTimer((7,), FakeTimerValues(wm1), None))
    assert len(out) == 1
    assert out[0]["n_events"][0] == 3 and out[0]["total_value"][0] == 11.0
    assert out[0]["session_start"][0] == pd.to_datetime(t0 - 60_000, unit="ms")
    assert h.state.v == [(t0 + 20 * 60 * 1000, t0 + 20 * 60 * 1000, 1, 4.0)]
    assert h.timers == [t0 + 20 * 60 * 1000 + gap]
    # far-future watermark: last session emits, state and timers clear
    out = list(proc.handleExpiredTimer((7,), FakeTimerValues(10**15), None))
    assert len(out) == 1 and out[0]["n_events"][0] == 1
    assert not h.state.exists() and h.timers == []
    assert list(proc.handleExpiredTimer((7,), FakeTimerValues(10**15), None)) == []
    # the runtime execution twin needs the TWS runner (protobuf, absent
    # here — same gate as test_tws_user_profiles); the processor logic
    # above is the load-bearing check either way
    assert isinstance(TWS_AVAILABLE, bool)


def test_expiring_sessions_v1_late_event_bridges_sessions():
    """Round-10 review fix, v1 form (make_session_update): a late-but-
    within-watermark event must be able to BRIDGE two held sessions into
    one and back-extend session_start; in-batch gaps must NOT emit before
    the watermark passes their horizon."""
    import pandas as pd

    from rpa_etl_spark.streaming.stateful import make_session_update

    class FakeGroupState:
        def __init__(self):
            self.v = None
            self.timeout = None
            self.wm = 0
            self.hasTimedOut = False
        @property
        def exists(self):
            return self.v is not None
        @property
        def get(self):
            return self.v
        def update(self, v):
            self.v = v
        def remove(self):
            self.v = None
        def getCurrentWatermarkMs(self):
            return self.wm
        def setTimeoutTimestamp(self, t):
            assert t > self.wm
            self.timeout = t

    gap = 5 * 60 * 1000
    update = make_session_update(gap)
    st = FakeGroupState()
    t0 = 1_700_000_000_000
    b1 = pd.DataFrame(
        {"ts": pd.to_datetime([t0, t0 + 6 * 60 * 1000], unit="ms"),
         "value": [1.0, 2.0]}
    )
    # two sessions 6 min apart: nothing emits at wm=0 (the old form
    # emitted the first one immediately — the review defect)
    assert list(update((7,), iter([b1]), st)) == []
    assert st.v == ([t0, t0 + 6 * 60 * 1000], [t0, t0 + 6 * 60 * 1000], [1, 1], [1.0, 2.0])
    # late event BETWEEN them (above watermark) bridges both into ONE
    st.wm = t0 + 60_000
    b2 = pd.DataFrame(
        {"ts": pd.to_datetime([t0 + 3 * 60 * 1000], unit="ms"), "value": [4.0]}
    )
    assert list(update((7,), iter([b2]), st)) == []
    assert st.v == ([t0], [t0 + 6 * 60 * 1000], [3], [7.0])
    assert st.timeout == t0 + 6 * 60 * 1000 + gap
    # watermark passes the horizon: the single merged session emits whole
    st.wm = st.timeout
    st.hasTimedOut = True
    out = list(update((7,), iter([]), st))
    assert len(out) == 1
    r = out[0]
    assert r["n_events"][0] == 3 and r["total_value"][0] == 7.0
    assert r["session_start"][0] == pd.to_datetime(t0, unit="ms")
    assert r["session_end"][0] == pd.to_datetime(t0 + 6 * 60 * 1000, unit="ms")
    assert st.v is None
