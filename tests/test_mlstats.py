"""Unit tests for the round-10 statistical operators (sampling, bloom,
pagerank, CUSUM, OLS) — semantics beyond what the oracle gate checks."""

from __future__ import annotations

import decimal
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rpa_etl_spark.operators import bloom as B
from rpa_etl_spark.operators import sampling as RS
from rpa_etl_spark.operators.pagerank import SCALE, pagerank
from rpa_etl_spark.tables import load


# ---------------------------------------------------------------- sampling
def test_reservoir_per_group_k_and_determinism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = RS.weighted_reservoir(docs, "doc_id", "n_chars", 5, by=["lang"])
    rows = out.collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rs in per_lang.items():
        assert len(rs) <= 5
        assert sorted(r.res_rank for r in rs) == list(range(1, len(rs) + 1))
    # determinism under repartition: same sample regardless of layout
    out2 = RS.weighted_reservoir(
        docs.repartition(13), "doc_id", "n_chars", 5, by=["lang"]
    )
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in out2.collect())


def test_reservoir_global_topk_and_zero_weight(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = RS.weighted_reservoir(docs, "doc_id", "n_chars", 7, by=None)
    rows = out.orderBy("res_rank").collect()
    assert len(rows) == 7
    assert [r.res_rank for r in rows] == list(range(1, 8))
    # keys are DESC-sorted by rank
    keys = [r.res_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    # zero/negative weights never sampled
    zeroed = docs.withColumn("n_chars", F.lit(0))
    assert RS.weighted_reservoir(zeroed, "doc_id", "n_chars", 7).count() == 0


def test_reservoir_weight_bias(spark):
    """Size-weighted sampling must overselect heavy rows: weight 100 vs 1
    at a 50/50 population and k = 10% → the heavy class should dominate
    the sample. Deterministic (hash priorities), so no flake margin."""
    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = RS.weighted_reservoir(df, "id", "w", 100)
    heavy = out.where(F.col("id") % 2 == 0).count()
    assert heavy >= 90  # expected ~99 under p∝w; ≥90 is far beyond chance


# ------------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_forms_agree(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    m = 4096
    bitmap = B.build(ref, "text", m)
    assert bitmap.count() <= m // 64
    words = B.collect_words(bitmap, m)
    inline = B.probe_inline(docs, "text", words, m)
    # no false negatives: every ref text must hit
    assert inline.where((F.col("doc_id") % 2 == 0) & ~F.col("bloom_hit")).count() == 0
    # the pure-plan join probe agrees with the inline probe on every key
    joined = B.probe(docs, "text", bitmap, m).select("doc_id", "bloom_hit")
    a = {r.doc_id: r.bloom_hit for r in inline.select("doc_id", "bloom_hit").collect()}
    b = {r.doc_id: r.bloom_hit for r in joined.collect()}
    assert a == b


def test_bloom_saturation_forces_false_positives(spark, sf_dir):
    """At m=64 bits with hundreds of ref keys the filter saturates, so
    non-ref rows MUST report bloom_hit (false positives) — false
    positives are part of the contract, false negatives never are."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    words = B.collect_words(B.build(ref, "text", 64), 64)
    out = B.probe_inline(docs, "text", words, 64)
    fp = out.where((F.col("doc_id") % 2 == 1) & F.col("bloom_hit")).count()
    assert fp > 0


def test_bloom_build_drops_null_keys(spark):
    """A NULL key must not poison the bitmap (md5(NULL) → NULL positions
    → NULL-group row → collect_words TypeError before the fix); non-null
    keys still register and NULL probe rows read NULL (unknown), not a
    crash."""
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    m = 256
    words = B.collect_words(B.build(df, "k", m), m)
    out = {r.k: r.bloom_hit for r in B.probe_inline(df, "k", words, m).collect()}
    assert out["a"] is True and out["b"] is True
    assert out[None] is None


def test_bloom_m_validation():
    with pytest.raises(ValueError):
        B.positions(F.lit("x"), 1000)  # not a power of two
    with pytest.raises(ValueError):
        B.positions(F.lit("x"), 32)  # below one word


# ---------------------------------------------------------------- sketches
def test_cms_never_undercounts_and_saturates_to_overcount(spark, sf_dir):
    """Structural guarantee: estimate >= true count for EVERY key, at any
    width. At w=2 the sketch is saturated with collisions, so estimates
    must strictly overcount at least one key (proving the estimate is
    min-of-cells, not an exact count in disguise)."""
    from rpa_etl_spark.operators import sketches as SK

    ev = load(spark, sf_dir, "events")
    exact = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = ev.select("user_id").distinct()
    for w in (2, 4096):
        sk = SK.cms_build(ev, "user_id", w)
        assert sk.count() <= SK.N_ROWS * w
        est = {r.user_id: r.cms_count for r in SK.cms_estimate(keys, "user_id", sk, w).collect()}
        assert all(est[k] >= exact[k] for k in exact)
        if w == 2:
            assert any(est[k] > exact[k] for k in exact)


def test_cms_merge_equals_sketch_of_union(spark, sf_dir):
    """Mergeability: sketch(A) + sketch(B) must equal sketch(A ∪ B)
    cell-for-cell — the property that lets per-partition/per-day
    sketches combine without touching raw data."""
    from rpa_etl_spark.operators import sketches as SK

    ev = load(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    w = 256
    merged = SK.cms_merge(SK.cms_build(a, "user_id", w), SK.cms_build(b, "user_id", w))
    whole = SK.cms_build(ev, "user_id", w)
    ms = {(r.row_idx, r.bucket): r.cnt for r in merged.collect()}
    ws = {(r.row_idx, r.bucket): r.cnt for r in whole.collect()}
    assert ms == ws


# ------------------------------------------------------------ lsh dedup
def test_lsh_near_dup_pairs_recall_and_soundness(spark, sf_dir):
    """q_dedup_embedding_lsh's blocking contract: found pairs are a
    SUBSET of the exact all-pairs truth (scoring is exact on candidates;
    blocking can only miss), and measured recall ≥ 0.85 at the query's
    (4 planes × 16 tables, τ=0.35) operating point — the fixture's weak
    similarity tail is the HARD regime for hyperplane LSH, see the query
    docstring."""
    from rpa_etl_spark.operators import similarity as SIM

    emb = load(spark, sf_dir, "embeddings")
    e2 = emb.selectExpr("vec_id AS id_b", "embedding AS v_b")
    truth = {
        (r.id_a, r.id_b)
        for r in (
            emb.selectExpr("vec_id AS id_a", "embedding AS v_a")
            .crossJoin(e2)
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(SIM.cosine_pd(F.col("v_a"), F.col("v_b")), 6).alias("s"),
            )
            .where(F.col("s") >= 0.35)
        ).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in SIM.lsh_near_dup_pairs(
            emb, dim=64, threshold=0.35, num_planes=4, num_tables=16
        ).collect()
    }
    assert got <= truth, "LSH-blocked pairs must never invent a pair"
    assert len(truth) > 100
    assert len(got & truth) / len(truth) >= 0.85


# ---------------------------------------------------------------- pagerank
def test_pagerank_hand_computed_chain(spark):
    """1 iteration on a→b→c (plus teleport) — hand-checkable fixed-point:
    r1(v) = 0.15·S + 0.85·Σ in-mass, in-mass(b) = S DIV 1 from a, etc."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.rank_fp for r in pagerank(edges, iterations=1).collect()}
    base = 15 * SCALE // 100
    assert out[1] == base  # no in-edges
    assert out[2] == base + 85 * SCALE // 100
    assert out[3] == base + 85 * SCALE // 100


def test_pagerank_hub_outranks_leaves(spark):
    """Star graph: many leaves point at a hub; the hub must outrank every
    leaf, and the ranking must be deterministic across partitionings."""
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 20)], "src long, dst long"
    )
    out = {r.node: r.rank_fp for r in pagerank(edges, iterations=3).collect()}
    hub = out.pop(99)
    assert all(hub > v for v in out.values())
    out2 = {
        r.node: r.rank_fp
        for r in pagerank(
            spark.createDataFrame(
                [(i, 99) for i in range(1, 20)], "src long, dst long"
            ).repartition(7),
            iterations=3,
        ).collect()
    }
    assert out2[99] == hub


def test_pagerank_dangling_hand_computed(spark):
    """1 iteration on a→b with an extra isolated dangling node c: D = 2·S
    (b and c are dangling), share = 2S DIV 3, and every node's damped
    operand gains that share — hand-checked fixed-point."""
    edges = spark.createDataFrame([(1, 2), (3, 3)], "src long, dst long")
    # self-loop on 3 makes it non-dangling; drop it to model isolation
    edges = edges.where(F.col("src") != 3).union(
        spark.createDataFrame([(2, 3)], "src long, dst long")
    )
    # graph: 1→2→3; dangling = {3}; N = 3
    out = {
        r.node: r.rank_fp
        for r in pagerank(edges, iterations=1, redistribute_dangling=True).collect()
    }
    base = 15 * SCALE // 100
    share = SCALE // 3  # D = S (node 3), N = 3
    assert out[1] == base + 85 * share // 100
    assert out[2] == base + 85 * (SCALE + share) // 100
    assert out[3] == base + 85 * (SCALE + share) // 100


def test_pagerank_dangling_conserves_mass(spark, sf_dir):
    """With redistribution, total mass stays N·S up to DIV truncation
    (≤ 1 quantum per node per round per DIV site); without it, a
    dangling-heavy directed graph leaks mass every round."""
    ev = load(spark, sf_dir, "events")
    edges = ev.selectExpr("user_id AS src", "event_id % 50 AS dst").distinct()
    n = (
        edges.selectExpr("src AS node")
        .union(edges.selectExpr("dst AS node"))
        .distinct()
        .count()
    )
    kept = (
        pagerank(edges, iterations=3, redistribute_dangling=True)
        .agg(F.sum("rank_fp"))
        .collect()[0][0]
    )
    total = n * SCALE
    # truncation loss per round ≤ Σ(out_deg−1) + 2N−1 quanta (contrib,
    # damp and share DIV sites) — vanishing vs total mass N·SCALE; the
    # relative bound is what conservation means in fixed point
    assert total * (1 - 1e-6) <= kept <= total
    dropped = (
        pagerank(edges, iterations=3, redistribute_dangling=False)
        .agg(F.sum("rank_fp"))
        .collect()[0][0]
    )
    assert dropped < kept  # the drop convention measurably leaks


def test_pagerank_mass_bounds(spark, sf_dir):
    """Each rank ∈ [0.15·S, N·S]: the teleport floor always holds, and no
    node can exceed the total circulating mass."""
    ev = load(spark, sf_dir, "events")
    edges = ev.selectExpr("user_id AS src", "event_id % 50 AS dst").distinct()
    ranks = pagerank(edges, iterations=2)
    n = ranks.count()
    stats = ranks.agg(F.min("rank_fp"), F.max("rank_fp")).collect()[0]
    assert stats[0] >= 15 * SCALE // 100
    assert stats[1] <= n * SCALE


# ------------------------------------------------------------------- cusum
def test_cusum_matches_imperative_recursion(spark, sf_dir):
    """The window identity s_i = C_i - min(0, min_j C_j) must equal the
    textbook recursion s_i = max(0, s_{i-1} + d_i) exactly (integers)."""
    from rpa_etl_spark.plans.mlstats_queries import (
        _CUSUM_TARGET_C,
        q_cusum_changepoint,
    )

    got = {
        r.event_id: r.cusum_cents
        for r in q_cusum_changepoint(spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    state: dict[int, int] = {}
    for r in rows:
        # Decimal half-up, matching Spark ROUND / DuckDB decimal cast —
        # Python round() is banker's rounding and diverges on half-cents.
        cents = int(
            decimal.Decimal(str(r.value)).scaleb(2).quantize(
                decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
            )
        )
        d = cents - _CUSUM_TARGET_C
        s = max(0, state.get(r.user_id, 0) + d)
        state[r.user_id] = s
        assert got[r.event_id] == s, r.event_id


# --------------------------------------------------------------------- ols
def test_ols_matches_numpy_lstsq(spark, sf_dir):
    from rpa_etl_spark.plans.mlstats_queries import q_linear_regression

    row = q_linear_regression(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    X = np.array([[1.0, r.l_quantity, r.l_discount] for r in li])
    y = np.array([r.l_extendedprice for r in li])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n_rows == len(li)
    assert math.isclose(row.b0, beta[0], rel_tol=1e-6, abs_tol=1e-4)
    assert math.isclose(row.b1, beta[1], rel_tol=1e-6, abs_tol=1e-4)
    assert math.isclose(row.b2, beta[2], rel_tol=1e-6, abs_tol=1e-4)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert math.isclose(row.r2, 1 - ss_res / ss_tot, abs_tol=1e-5)
