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


def test_format_roundtrip_all_formats(spark, sf_dir, tmp_path):
    """write_table → read_table must be lossless (values + column names)
    for every shipped format. ORC exercises the second columnar format;
    CSV/JSON read back with an explicit schema (the production path — no
    inference scan)."""
    src = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
    expect = {tuple(r) for r in src.collect()}
    for fmt in ("parquet", "orc", "csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        K.write_table(src, path, fmt)
        back = K.read_table(spark, path, fmt, schema=src.schema)
        assert set(back.columns) == set(src.columns), fmt
        got = {tuple(r.asDict()[c] for c in src.columns) for r in back.collect()}
        assert got == expect, f"{fmt} roundtrip lost data"


def test_orc_scan_pushdown(spark, sf_dir, tmp_path):
    """ORC scans must get the same predicate pushdown + column pruning as
    parquet — the engine's scale properties are format-independent."""
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_orc")
    K.write_table(src, path, "orc")
    df = (
        K.read_table(spark, path, "orc")
        .where(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(o_totalprice" in plan, plan
    import re

    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {"o_orderkey", "o_totalprice"}, cols


def test_permissive_ingest_quarantines_and_keeps_partial_fields(spark, tmp_path):
    """Round-10: read_table_permissive + quarantine_malformed must keep
    parseable fields of malformed rows, carry the raw record as evidence,
    and never drop or duplicate rows (good + bad partitions the input)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from rpa_etl_spark.sources import sinks

    p = tmp_path / "csv"
    p.mkdir()
    (p / "part.csv").write_text(
        "1,en,4\n"
        "7,de,xx22\n"      # unparseable long field
        "11,fr\n"          # missing field
        "22,pt,9,extra\n"  # extra field (n still parses)
        "5,es,16\n"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("n", LongType()),
        ]
    )
    raw = sinks.read_table_permissive(spark, str(p), "csv", schema, header="false")
    good, bad, parsed = sinks.quarantine_malformed(raw)
    g = {r["doc_id"]: r for r in good.collect()}
    b = {r["doc_id"]: r for r in bad.collect()}
    assert set(g) == {1, 5} and set(b) == {7, 11, 22}
    assert "_corrupt_record" not in good.columns
    assert b[7]["lang"] == "de" and b[7]["n"] is None
    assert b[7]["_corrupt_record"] == "7,de,xx22"
    assert b[11]["n"] is None and b[11]["_corrupt_record"] == "11,fr"
    assert b[22]["n"] == 9  # partial parse retained on the extra-field row
    assert good.count() + bad.count() == 5

    j = tmp_path / "json"
    j.mkdir()
    (j / "part.json").write_text(
        '{"doc_id": 1, "lang": "en", "n": 4}\n'
        '{"doc_id": "seven", "lang": "de", "n": [1]}\n'
        "not json at all\n"
    )
    parsed.unpersist()

    # JSON twin: schema-violating object quarantines, clean one parses;
    # DDL-string schema accepted like read_table
    jraw = sinks.read_table_permissive(
        spark, str(j), "json", "doc_id long, lang string, n long"
    )
    jgood, jbad, jparsed = sinks.quarantine_malformed(jraw)
    assert jgood.count() == 1 and jbad.count() == 2
    jparsed.unpersist()

    # CSV with headers (the write_table default) round-trips: header rows
    # are consumed, not quarantined as phantom corrupt records
    hp = tmp_path / "csvh"
    hp.mkdir()
    (hp / "part.csv").write_text("doc_id,lang,n\n1,en,4\n7,de,xx22\n")
    hraw = sinks.read_table_permissive(spark, str(hp), "csv", schema)
    hgood, hbad, hparsed = sinks.quarantine_malformed(hraw)
    assert hgood.count() == 1 and hbad.count() == 1
    hparsed.unpersist()

    with __import__("pytest").raises(ValueError, match="text formats"):
        sinks.read_table_permissive(spark, str(p), "parquet", schema)
