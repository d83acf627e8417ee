"""Semantic invariants for the corpus-curation queries (M7) that the
oracle hash-compare can't express: interval chaining, packing
conservation, sampling exactness. Exact-value parity vs DuckDB is covered
by tests/test_oracle_parity.py like every other declared query."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from rpa_etl_spark.plans.curation_queries import (
    _PACK_BUDGET,
    _STRATA_RATES,
    q_contamination,
    q_pack_sequences,
    q_sample_stratified,
    q_scd2_history,
)
from rpa_etl_spark.tables import load


def test_contamination_fractions_and_split_disjointness(spark, sf_dir):
    rows = q_contamination(spark, sf_dir).collect()
    assert rows, "test split must contain documents with >= 5 words"
    for r in rows:
        assert 0 <= r.n_shared <= r.n_grams
        assert abs(r.contamination - round(r.n_shared / r.n_grams, 6)) < 1e-9
        assert r.is_contaminated == (r.n_shared >= 0.5 * r.n_grams)
    # output contains ONLY test-split documents (bucket >= 80)
    ids = {r.doc_id for r in rows}
    buckets = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 100
            ).alias("b"),
        )
        .collect()
    )
    by_id = {r.doc_id: r.b for r in buckets}
    assert all(by_id[i] >= 80 for i in ids)


def test_stratified_sampling_is_exact_threshold(spark, sf_dir):
    kept = q_sample_stratified(spark, sf_dir).collect()
    assert kept
    seen_langs = set()
    for r in kept:
        assert r.bucket < _STRATA_RATES[r.lang]
        seen_langs.add(r.lang)
    # full-rate strata keep every document
    docs = load(spark, sf_dir, "documents")
    for lang, pct in _STRATA_RATES.items():
        if pct == 100:
            n_all = docs.where(F.col("lang") == lang).count()
            n_kept = sum(1 for r in kept if r.lang == lang)
            assert n_kept == n_all


def test_packing_conserves_tokens_and_ids_are_contiguous(spark, sf_dir):
    packs = q_pack_sequences(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("t")
    ).collect()[0].t
    assert sum(r.pack_tokens for r in packs) == total_tokens
    per_stream = defaultdict(list)
    for r in packs:
        per_stream[(r.lang, r.shard)].append(r.pack_id)
    for ids in per_stream.values():
        ids.sort()
        # first-fit over a contiguous token stream: pack ids are dense
        # from 0 (a pack is only opened when the running offset enters a
        # new budget window, and offsets only move forward)
        assert ids == list(range(len(ids)))
    # every pack starts within its budget window: a pack's docs all have
    # start-offset inside [pack_id*B, (pack_id+1)*B), so a pack holds at
    # least one doc and (except possibly the stream's last pack) spans
    # enough tokens to reach the next window
    assert all(r.n_docs >= 1 for r in packs)


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    hist = q_scd2_history(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in hist:
        by_user[r.user_id].append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        # exactly one open interval per user, and it is the last version
        currents = [r for r in rows if r.is_current]
        assert len(currents) == 1 and currents[0].version == len(rows)
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # gapless chaining
            assert a.event_type != b.event_type  # true change capture
        assert rows[-1].valid_to is None


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F

    from rpa_etl_spark.functions.urls import canonicalize_url

    rows = [
        (1, "https://Src1.EXAMPLE.com:443/a/b?utm_source=x#frag"),
        (2, "https://src1.example.com/a/b/"),
        (3, "https://src1.example.com/a/b?ref=keep&utm_campaign=x&page=2"),
        (4, "http://HOST.com/"),
        (5, "https://host.com"),
        (6, None),
        (7, "https://host.com:8080/x"),  # non-default port = distinct origin
        (8, "http://user:pw@Host.com:80/x"),  # userinfo dropped, default port dropped
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got[1] == "https://src1.example.com/a/b"
    assert got[2] == "https://src1.example.com/a/b"
    # identity-bearing params kept in order, utm filtered out
    assert got[3] == "https://src1.example.com/a/b?ref=keep&page=2"
    assert got[4] == "http://host.com"
    assert got[5] == "https://host.com"
    assert got[6] is None
    assert got[7] == "https://host.com:8080/x"
    assert got[8] == "http://host.com/x"
