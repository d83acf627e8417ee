"""Connected-components + cluster dedup tests (iterative fixpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_spark.operators.components import connected_components, dedup_by_components
from rpa_etl_spark.tables import load


def test_components_resolve_transitive_chains(spark):
    # two clusters: {1,2,3,4} via a chain (worst case: diameter 3) and {10,11};
    # 99 is isolated (appears in no pair)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_handle_cycles_and_order(spark):
    # cycle + reversed pair order must not matter
    pairs = spark.createDataFrame(
        [(5, 3), (3, 7), (7, 5), (20, 21), (21, 20)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {3: 3, 5: 3, 7: 3, 20: 20, 21: 20}


def test_dedup_by_components_end_to_end(spark, sf_dir):
    """Doubled+tripled corpus: every original doc forms a cluster with its
    copies; exactly one member per cluster is kept."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    copies = docs.select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    copies2 = docs.select((F.col("doc_id") + 2 * 10**6).alias("doc_id"), "text")
    corpus = docs.unionByName(copies).unionByName(copies2)

    # exact-dup pairs via text hash (stand-in for LSH candidates)
    h = corpus.select("doc_id", F.sha2("text", 256).alias("sha"))
    pairs = (
        h.alias("a")
        .join(h.alias("b"), "sha")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    out = dedup_by_components(corpus, pairs)
    n_docs = docs.count()
    kept = out.where("keep")
    assert kept.count() == n_docs
    # every kept doc is the min id of its cluster → all originals survive
    assert kept.where(F.col("doc_id") >= 10**6).count() == 0
    # every dropped copy points at its original
    dropped = out.where(~F.col("keep"))
    assert dropped.count() == 2 * n_docs
    bad = dropped.where(
        (F.col("doc_id") % 10**6) != F.col("canonical_id")
    ).count()
    assert bad == 0


def test_components_long_chain_converges_fast(spark):
    """A 30-node chain (diameter 29) must converge within the default
    round budget — pointer jumping gives O(log diameter) rounds. Before
    the fix this silently returned split clusters."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, 31)}


def test_components_match_union_find_on_random_graphs(spark):
    """Property check: on deterministic pseudo-random graphs, the
    distributed min-label fixpoint must equal a classic union-find."""

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    rng_state = 12345
    def nxt(state):  # deterministic LCG, no RNG APIs
        return (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)

    for trial in range(3):
        edges = []
        for _ in range(60):
            rng_state = nxt(rng_state)
            a = rng_state % 40
            rng_state = nxt(rng_state)
            b = rng_state % 40
            if a != b:
                edges.append((min(a, b), max(a, b)))
        expected = union_find_components(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
        assert got == expected, f"trial {trial}: {got} != {expected}"
