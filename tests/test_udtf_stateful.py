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
