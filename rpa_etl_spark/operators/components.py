"""Connected components over a pair list — the step that turns near-dup
CANDIDATE PAIRS into dedup DECISIONS.

LSH/SimHash emit pairs (a,b); duplicates form clusters (a~b, b~c ⇒ a~c),
and a corpus dedup keeps ONE canonical doc per cluster. That transitive
closure is an iterative fixpoint — not expressible as a single SQL query —
so it runs as repeated DataFrame joins (min-label propagation, a.k.a.
"hash-to-min"):

    label(v) ← min(label(v), min over neighbors u of label(u))

until no label changes. Each iteration is one shuffle keyed by vertex;
convergence takes O(diameter) rounds (near-dup clusters are tiny and
star-like, so 2-4 rounds in practice). Lineage is broken per round with
``localCheckpoint`` — without it the plan doubles every iteration and
the job DAG blows up by round ~8 (the classic iterative-Spark trap).

At 100 TB: the edge list is orders of magnitude smaller than the corpus
(only candidate pairs), so iterating on it is cheap relative to the
scan that produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve (id_a, id_b) pairs into (id, component) where component is
    the minimum member id of each connected cluster.

    Deterministic; singleton vertices never appear in ``pairs`` and keep
    themselves as canonical by construction downstream (left join + coalesce).
    """
    # symmetrize IN-ROW (explode of both directions), not by union: a union
    # of two selects evaluates the candidate-pair subtree twice — for LSH/
    # sha-join producers that is the expensive part of the whole operator
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                    F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # initial label: min neighbor (including self)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .withColumnsRenamed({"src": "id"})
    )
    converged = False
    for _ in range(max_iter):
        # propagate: my new label = min(my label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels.withColumnsRenamed({"id": "dst"}), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .withColumnsRenamed({"src": "id"})
        )
        propagated = labels.join(neighbor_labels, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: label(v) <- label(label(v)). Component ids are
        # always vertex ids, so the self-join resolves one indirection per
        # round — path lengths halve, and convergence is O(log diameter)
        # instead of O(diameter) (a 30-node chain converges in ~6 rounds,
        # not 29).
        compressed = (
            propagated.join(
                propagated.select(
                    F.col("id").alias("component"),
                    F.col("component").alias("_parent"),
                ),
                "component",
                "left",
            )
            .select(
                "id",
                F.coalesce(F.col("_parent"), F.col("component")).alias("component"),
            )
        )
        # LAZY checkpoint: the convergence probe below materializes it as
        # a side effect — an eager checkpoint here was a second, redundant
        # job per round (same rows computed, once to cache and once to
        # compare). Precisely: the probe's limit(1).count() can early-exit
        # before touching every partition, in which case
        # LocalRDDCheckpointData launches a bounded FOLLOW-UP job for the
        # partitions the probe skipped (round-14 ADVICE). Accepted over
        # dropping limit(1): without it every CHANGED round's probe counts
        # all label mismatches instead of stopping at the first, and the
        # converged round (which must scan everything to prove 0 changes)
        # already materializes every partition either way.
        new_labels = compressed.localCheckpoint(eager=False)  # break lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning non-fixpoint labels would silently split clusters
        # (multiple "canonicals" per true cluster) — fail loudly instead.
        # min-propagation needs O(diameter) rounds; real near-dup clusters
        # are star-like (diameter ~2), so hitting this means either a
        # pathological chain or max_iter set too low for the graph.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (labels would be non-transitive otherwise)"
        )
    return labels


def dedup_by_components(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full near-dup dedup decision: every doc mapped to its cluster
    canonical (min id); docs outside any pair are their own canonical.
    Filter ``keep`` to materialize the deduplicated corpus."""
    comps = connected_components(pairs)
    return (
        corpus.join(comps.withColumnsRenamed({"id": id_col}), id_col, "left")
        .withColumn("canonical_id", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("keep", F.col(id_col) == F.col("canonical_id"))
        .drop("component")
    )
