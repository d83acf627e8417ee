"""Fixed-point distributed PageRank (deterministic link analysis).

Classic power iteration: rank(v) = (1-d)/N + d · Σ_{u→v} rank(u)/out(u),
run for a fixed number of rounds over an edge DataFrame. Each round is
one join (ranks ⋈ edges on src — both sides hash-partitioned on the
same key, so AQE reuses the layout) plus one aggregation on dst; rounds
are O(diameter-independent) fixed count, the same frontier-join shape as
operators/components.py label propagation.

**Fixed-point integer arithmetic, not float.** Ranks are BIGINTs scaled
by SCALE (10^9); contributions are `rank DIV out_degree` and damping is
`(85 · Σ) DIV 100`. Rationale, in order of importance at 100 TB:

1. Determinism by construction: float rank sums are
   association-order-dependent, and Spark's partial aggregation order
   varies run-to-run and cluster-to-cluster. Integer addition is
   associative-commutative EXACTLY, so the result is bit-identical on
   any cluster, any partitioning, any engine — the DuckDB oracle
   reproduces it with three unrolled CTE rounds.
2. No drift: the mass lost to DIV truncation is bounded by 1/SCALE·out
   (1e-9·out) per node per round and never amplifies (PageRank is a
   contraction).

Overflow bound (worst case: ALL circulating mass funnels to one node):
the damping multiply needs DAMP_NUM·N·SCALE < 2^63, i.e. N < 2^63/(85·
SCALE) ≈ 1.1e8 nodes at SCALE=1e9 (the default — rank quantum 1e-9,
far below any ranking-relevant difference). Under Spark 4's default
ANSI mode an excess is a loud ArithmeticException, not a silent wrap;
the knob is explicit, which is the point of fixed-point. The bound is
unchanged by dangling-mass redistribution: the damped operand becomes
in_mass + D DIV N with D = Σ dangling rank, and (in_mass + D DIV N) is
still ≤ the total circulating mass N·SCALE (redistribution only moves
mass that the drop-convention would have deleted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    redistribute_dangling: bool = False,
    assume_distinct: bool = False,
) -> DataFrame:
    """Rank every node of ``edges`` (columns ``src``, ``dst``).

    Nodes = src ∪ dst. Dangling nodes (no out-edges) are handled per the
    ``redistribute_dangling`` knob:

    - ``False`` (default): their mass is dropped — the common large-graph
      simplification; each round is one join + one aggregate.
    - ``True``: the canonical formulation — each round additionally sums
      the dangling nodes' rank into one global scalar D and every node's
      damped term becomes ``in_mass + D DIV N``. The scalar is ONE extra
      tiny aggregate per round (a 1-row frame, broadcast back via
      cross-join — nothing collects to the driver, and the integer DIV
      keeps the result bit-identical across engines/partitionings).

    Returns (node BIGINT, rank_fp BIGINT) where rank_fp is the fixed-
    point rank scaled by SCALE (initial rank 1.0 per node, the
    ranks-sum-to-N convention).
    """
    # lineage cut (the components.py pattern): edges feed nodes, degrees,
    # AND every iteration's join — without the checkpoint the physical
    # plan re-derives the edge subtree per consumer (measured: 40
    # FileScans / 59 Exchanges for 3 iterations over a 2-table edge
    # derivation, zero reuse) and the plan doubles per iteration at
    # higher iteration counts. localCheckpoint materializes the edge
    # partitions once on the executors — distributed, nothing collects.
    # Round 14 (guide §2.4): ``assume_distinct`` lets callers whose edge
    # derivation is provably duplicate-free (both declared queries end in
    # .distinct()) skip a full defensive dedup shuffle of the edge set.
    # (Also tried: .repartition("src") before the cut so rounds reuse a
    # src-keyed layout — measured SLOWER at sf0.1: the extra full edge
    # shuffle costs more than the per-round exchanges it saves at 3
    # iterations, and AQE already right-sizes the tiny round shuffles.)
    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # fresh attribute names per consumer: nodes/outdeg/the per-round join
    # all descend from `edges`, and Spark's ambiguous-self-join detection
    # (correctly) rejects reusing the same `dst` attribute across them
    outdeg = edges.groupBy(F.col("src").alias("od_src")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    e = edges.selectExpr("src AS e_src", "dst AS e_dst")
    base = F.lit(SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN).cast("long")

    # out_deg joins onto the rank frame ONCE, outside the loop (dangling
    # nodes carry null and simply contribute nothing via the inner edge
    # join) — each iteration then costs one edges join + one dst-keyed
    # aggregate + the node-frame refresh, not an extra degree join.
    # Round 14: checkpointed — nodes_deg anchors EVERY round's left join
    # (and the initial rank frame); without the cut each round re-planned
    # the nodes-union-distinct ⋈ out-degree subtree from the edge RDD.
    nodes_deg = (
        nodes.join(outdeg, F.col("node") == F.col("od_src"), "left")
        .select("node", "out_deg")
        .localCheckpoint(eager=False)
    )

    # constant across rounds — one lazily-materialized 1-row frame
    # instead of a per-round full nodes pass inside each round's plan
    n_nodes = nodes_deg.agg(F.count(F.lit(1)).alias("n_nodes")).localCheckpoint(
        eager=False
    )

    ranks = nodes_deg.withColumn("rank_fp", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        if redistribute_dangling:
            # the rank frame feeds TWO consumers this round (contrib AND
            # the dangling scalar) — cut the lineage so the physical plan
            # shares one materialization instead of doubling per round
            ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            ranks.where(F.col("out_deg").isNotNull())
            .select(F.col("node"), F.expr("rank_fp DIV out_deg").alias("c"))
            .join(e, F.col("node") == F.col("e_src"), "inner")
            .select(F.col("e_dst").alias("node"), "c")
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        if redistribute_dangling:
            # D DIV N as a 1-row broadcast: exact integer arithmetic, so
            # the oracle reproduces it with one scalar CTE per round
            dang = (
                ranks.where(F.col("out_deg").isNull())
                .agg(
                    F.coalesce(F.sum("rank_fp"), F.lit(0).cast("long")).alias(
                        "dang_fp"
                    )
                )
                .crossJoin(n_nodes)
                .select(F.expr("dang_fp DIV n_nodes").alias("dang_share"))
            )
            ranks = (
                nodes_deg.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    "out_deg",
                    (
                        base
                        + F.expr(
                            f"({DAMP_NUM} * (coalesce(in_mass, 0L) + dang_share))"
                            f" DIV {DAMP_DEN}"
                        )
                    ).alias("rank_fp"),
                )
            )
        else:
            ranks = (
                nodes_deg.join(contrib, "node", "left")
                .select(
                    "node",
                    "out_deg",
                    (
                        base
                        + F.expr(
                            f"({DAMP_NUM} * coalesce(in_mass, 0L)) DIV {DAMP_DEN}"
                        )
                    ).alias("rank_fp"),
                )
            )
    return ranks.select("node", "rank_fp")
