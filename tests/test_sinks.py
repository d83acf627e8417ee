"""Sink tests: K1 CSV append, K2 JSON event contract, R1 routed layout."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rpa_etl_spark.sources import sinks as K
from rpa_etl_spark.tables import load


def test_append_csv_accumulates(spark, sf_dir, tmp_path):
    path = str(tmp_path / "csv_out")
    df = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    K.append_csv(df, path)
    K.append_csv(df, path)  # append semantics: second write adds rows
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == df.count() * 2
    assert set(back.columns) == {"n_nationkey", "n_name"}


def test_event_contract_json_sink(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_out")
    df = load(spark, sf_dir, "region")
    K.write_event_json(K.event_contract(df, tenant="acme"), path)
    rows = [json.loads(ln) for f in (tmp_path / "events_out").glob("part-*.json")
            for ln in f.read_text().splitlines()]
    assert len(rows) == df.count()
    assert all(r["event_type"] == "pipeline.result.v1" for r in rows)
    assert all(r["tenant_id"] == "acme" for r in rows)
    payload = json.loads(rows[0]["data"])
    assert set(payload) == {"r_regionkey", "r_name"}
    assert all(len(r["event_id"]) == 64 for r in rows)  # sha256 hex


def test_routed_partition_layout(spark, sf_dir, tmp_path):
    path = str(tmp_path / "routed")
    orders = load(spark, sf_dir, "orders")
    routed = orders.withColumn(
        "route",
        F.when(F.col("o_totalprice") > 300000, "auditoria_fiscal").otherwise(
            "processamento_normal"
        ),
    )
    K.write_routed(routed, "route", path)
    dirs = {p.name for p in (tmp_path / "routed").glob("route=*")}
    assert dirs == {"route=auditoria_fiscal", "route=processamento_normal"}
    # partition pruning: reading one route only returns its rows
    audit = spark.read.parquet(path).where(F.col("route") == "auditoria_fiscal")
    expected = orders.where(F.col("o_totalprice") > 300000).count()
    assert audit.count() == expected
