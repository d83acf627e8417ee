#!/usr/bin/env python
"""Measured scaling curve (round 6, SCALE.md §7 evidence).

Derives a 5x dataset from sf0.1 by deterministic replication (key-shifted
copies, FK-consistent: o_custkey/c_custkey and l_orderkey/o_orderkey shift
together; dimension tables stay single-copy), then times the
shuffle-heaviest declared queries at both scales into the noop sink
(steady-state best-of-2, same protocol as bench.py) and prints the
time ratio next to the 5.0x data ratio.

Usage: python tools/scaling_probe.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpa_etl_spark import registry  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 5
SHIFT = 100_000_000
DERIVED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    f"scale_{COPIES}x",
)

# key columns shifted per replicated fact table (FK partners shift together)
REPLICATED: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "events": ["event_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region", "part", "supplier"]

# shuffle-heaviest families: multi-join TPC-H shapes, skew join, NDV
# Expand, banded dedups, gram/token corpus aggregations, plus (round 7)
# the two iterative training jobs — the IVF trainer after its broadcast
# hint removal (the cell join now shuffles; this measures that choice at
# 5x) and the distributed BPE trainer (cost should be dominated by
# per-round job overhead, i.e. nearly size-flat at these scales)
PROBE_QUERIES = [
    "q_tpch_q5_shape",
    "q_tpch_q10_shape",
    "q_tpch_q21_shape",
    "q_join_skew_salted",
    "q_profile_stats",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_novelty",
    "q_unigram_logprob",
    "q_bm25",
    "q_ann_ivf_trained",
    "q_bpe_train_distributed",
    # round 8: the AES-256 file-scale query is FIXTURE-sized (docs 0-47
    # regardless of corpus size) — its ratio should read ~1.0, proving the
    # one keyed shuffle it owns is corpus-size-independent. Per-row codec
    # queries (mpeg/mjpeg) are deliberately absent: they are narrow,
    # shuffle-free, and scale linearly with rows by construction — the
    # scan-speed shape, not a shuffle behavior this probe measures.
    "q_pdf_extract_encrypted",
    # round 9: the one iterative LLM-data operator previously absent from
    # this measured set — candidate pairs -> iterative min-label
    # propagation -> canonical-per-cluster. Time should scale ~linearly
    # (each round is one keyed shuffle over edges); the ITERATION COUNT
    # is diameter-bound, not size-bound, which components_iteration_probe
    # below measures directly at both scales.
    "q_dedup_clusters",
    # round-10 continuation: the new shuffle-bearing operators. Expected
    # shapes — q_pagerank: 3 fixed join+agg rounds over edges, ~linear in
    # edge count; q_sample_reservoir: one lang shuffle with map-side
    # WindowGroupLimit, shuffled volume is ~k·groups·partitions so the
    # ratio should read sub-linear; q_cusum_changepoint: one user_id
    # sort-shuffle, linear; q_linear_regression: scan-bound single
    # aggregate, linear; q_dedup_bloom: one tiny distinct+bit_or build
    # aggregate plus a constant-folded narrow probe, linear.
    "q_pagerank",
    "q_sample_reservoir",
    "q_cusum_changepoint",
    "q_linear_regression",
    "q_dedup_bloom",
    # round 11: the dangling-mass variant adds one global scalar
    # aggregate + 1-row broadcast per round on top of q_pagerank's
    # shape — expected ~q_pagerank's ratio with a small additive
    # constant (the scalar aggregate is corpus-size-linear map-side,
    # 1 row shuffled).
    "q_pagerank_dangling",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DERIVED, exist_ok=True)
    for name, keys in REPLICATED.items():
        src = spark.read.parquet(f"{BASE}/{name}.parquet")
        parts = []
        for k in range(COPIES):
            d = src
            for col in keys:
                d = d.withColumn(col, F.col(col) + F.lit(k * SHIFT))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DERIVED}/{name}.parquet")
        print(f"  replicated {name}: {src.count()} -> {out.count()} rows")
    for name in DIMS:
        spark.read.parquet(f"{BASE}/{name}.parquet").write.mode("overwrite").parquet(
            f"{DERIVED}/{name}.parquet"
        )
        print(f"  copied dim {name}")


def run_query(spark, qname: str, sf_dir: str) -> float:
    fn = registry.QUERIES[qname]
    best = None
    for _ in range(2):  # steady-state best-of-2 (bench.py protocol)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    registry.load_all_plans()
    spark = get_spark("rpa-etl-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --derived DIR --ratio N: probe against an alternate large dataset
    # (e.g. the tools/gen_sf.py sf1 output — REAL distributions, not
    # key-shifted replication; SCALE.md §10d) instead of the 5x replica.
    derived, data_ratio = DERIVED, float(COPIES)
    if "--derived" in sys.argv:
        try:
            derived = sys.argv[sys.argv.index("--derived") + 1]
            data_ratio = float(sys.argv[sys.argv.index("--ratio") + 1])
        except (ValueError, IndexError):
            sys.exit("usage: scaling_probe.py --derived DIR --ratio N "
                     "(both required together)")
        if not os.path.exists(f"{derived}/lineitem.parquet"):
            sys.exit(f"--derived {derived}: no lineitem.parquet there "
                     "(generate with tools/gen_sf.py first)")
    elif "--regen" in sys.argv or not os.path.exists(f"{DERIVED}/lineitem.parquet"):
        print(f"generating {COPIES}x dataset under {DERIVED}")
        generate(spark)

    results = {}
    for q in PROBE_QUERIES:
        run_query(spark, q, BASE)  # warm-up pass at base scale
        t1 = run_query(spark, q, BASE)
        run_query(spark, q, derived)
        t5 = run_query(spark, q, derived)
        results[q] = (t1, t5, t5 / t1 if t1 > 0 else float("nan"))
        print(f"{q:24s}  sf0.1 {t1:6.2f}s   {data_ratio:g}x {t5:6.2f}s   ratio {t5/t1:5.2f}")

    ivf = ivf_sqrt_cells_probe(spark)
    ivf_auto = ivf_train_auto_probe(spark, BASE, derived, data_ratio)
    comp = components_iteration_probe(spark)

    ratios = sorted(r for _, _, r in results.values())
    med = ratios[len(ratios) // 2]
    print(
        json.dumps(
            {
                "data_ratio": data_ratio,
                "median_time_ratio": round(med, 2),
                "queries": {q: [round(a, 2), round(b, 2), round(r, 2)] for q, (a, b, r) in results.items()},
                "ivf_sqrt_probe": ivf,
                "ivf_train_auto_probe": ivf_auto,
                "components_probe": comp,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()



def components_iteration_probe(spark) -> dict:
    """Round-8 verdict ask #5: connected components' CONVERGENCE count at
    both corpus scales. The q_dedup_clusters graph (exact-duplicate
    cliques) has constant diameter, so the fixpoint must converge in the
    same number of label-propagation rounds regardless of corpus size —
    measured here as the smallest max_iter whose output already equals
    the fully-converged labeling."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.operators.components import connected_components

    out = {}
    for tag, sf_dir in (("sf0.1", BASE), (f"{COPIES}x", DERIVED)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.unionByName(
            docs.select((F.col("doc_id") + 10**9).alias("doc_id"), "text")
        ).unionByName(
            docs.select((F.col("doc_id") + 2 * 10**9).alias("doc_id"), "text")
        )
        h = corpus.select("doc_id", F.sha2("text", 256).alias("sha"))
        pairs = (
            h.alias("a")
            .join(h.alias("b"), "sha")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        )

        def fingerprint(df):
            return df.select(
                F.sum(F.hash("id", "component").cast("long")).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]

        full = fingerprint(connected_components(pairs, max_iter=20))
        iters = None
        for k in (1, 2, 3, 4):
            if fingerprint(connected_components(pairs, max_iter=k)) == full:
                iters = k
                break
        out[tag] = {"n_vertices": int(full["n"]), "converged_at_iter": iters}
        print(f"components {tag}: {full['n']} vertices, converged at iteration {iters}")
    return out


def ivf_train_auto_probe(spark, base: str, derived: str, data_ratio: float) -> dict:
    """Round-10 verdict #4: measure the IVF TRAINING LOOP under the
    auto-sized (n_cells=None → √N) production path, on the same data pair
    as the main probe table. Context: the declared q_ann_ivf_trained row
    reads ~6.5x at 10x data because its oracle pins n_cells=8 (the ground
    truth cluster count), making retrieval candidate volume quadratic in
    the corpus. This probe runs the SAME work shape — clustered fixture →
    train (2 Lloyd rounds) → assign → whole-corpus top-1 retrieve at
    n_probe=1 — but auto-sized, where assignment+retrieval work is
    ~N·√N, so the 10x wall ratio should land near √10·overheads, not 6.5."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.operators import similarity as SIM
    from rpa_etl_spark.plans.llmdata_queries import _clustered_embedding_fixture

    out = {}
    for tag, sf_dir in (("base", base), ("derived", derived)):
        best = None
        for _ in range(2):  # best-of-2, like run_query
            fixture = _clustered_embedding_fixture(spark, sf_dir).persist()
            n = fixture.count()  # materialize cache before the clock
            t0 = time.time()
            cb = SIM.train_ivf_codebook(fixture, 64, n_cells=None, iters=2)
            SIM.ivf_topk(
                fixture, fixture, 64, k=1, n_probe=1, codebook=cb,
                broadcast_queries=False,  # query side IS the corpus here
            ).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            fixture.unpersist()
            best = dt if best is None else min(best, dt)
        out[tag] = {"n": n, "n_cells": cb.shape[0], "sec": round(best, 2)}
    ratio = out["derived"]["sec"] / out["base"]["sec"]
    out["ratio"] = round(ratio, 2)
    print(
        f"ivf_train_auto_probe base N={out['base']['n']} cells="
        f"{out['base']['n_cells']} {out['base']['sec']}s | {data_ratio:g}x "
        f"N={out['derived']['n']} cells={out['derived']['n_cells']} "
        f"{out['derived']['sec']}s | ratio {ratio:.2f}"
    )
    return out


def ivf_sqrt_cells_probe(spark) -> dict:
    """Round-8 verdict ask #3: measure `ivf_topk` under its PRODUCTION
    sizing — n_cells ~ √N — at two corpus scales and test the scaling
    claim the q_ann_ivf_trained docstring makes.

    Data honesty note (recorded in SCALE.md §10): on the ~uniform synthetic
    `embeddings` table, recall tracks the probed CORPUS FRACTION — no index
    sizing holds recall with sub-linear candidates on uniform vectors, which
    is a property of the data, not the index (measured: recall 0.73 at
    36% probed / N=500 vs 0.76 at 37% / N=2000). The probe therefore uses
    CLUSTERED corpora (the case IVF exists for) with scale-free geometry:
    √N clusters of √N points each, same dispersion at both scales. The
    claim under test: with n_cells=√N and FIXED n_probe, recall holds as N
    grows 4x while candidates/query grow only ~2x (=√4, vs 4x for brute
    force)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from rpa_etl_spark.operators import similarity as SIM

    DIM, K_TOP, N_PROBE = 64, 10, 4
    out = {}
    for n in (2048, 8192):
        n_cells = int(math.isqrt(n))
        per = n // n_cells
        rng = np.random.default_rng(7)  # same family at both scales
        centers = rng.normal(size=(n_cells, DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = [
            (
                int(c * per + j),
                [float(x) for x in centers[c] + 0.05 * rng.normal(size=DIM)],
            )
            for c in range(n_cells)
            for j in range(per)
        ]
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(32)
        corpus.cache().count()
        queries = corpus.where(F.col("vec_id") % per == 0)  # one per cluster
        # n_cells=None → the auto-sized production path (round-10 verdict
        # #4); on this geometry auto = isqrt(N) = the constructed cluster
        # count, asserted so the probe notices a sizing regression
        cb = SIM.train_ivf_codebook(corpus, DIM, n_cells=None, iters=4)
        assert cb.shape[0] == n_cells, (cb.shape, n_cells)
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(corpus, queries, k=K_TOP).collect()
        }
        t0 = time.time()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(
                corpus, queries, DIM, k=K_TOP, n_cells=n_cells,
                n_probe=N_PROBE, codebook=cb,
            ).collect()
        }
        ivf_sec = time.time() - t0
        recall = len(got & truth) / len(truth)
        sizes = {
            r["cell"]: r["n"]
            for r in corpus.select(
                F.element_at(
                    SIM._nearest_cells_kernel(cb, 1)(F.col("embedding")), 1
                ).alias("cell")
            )
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        probed = queries.select(
            F.explode(
                SIM._nearest_cells_kernel(cb, N_PROBE)(F.col("embedding"))
            ).alias("cell")
        ).collect()
        n_q = queries.count()
        cand = sum(sizes.get(r["cell"], 0) for r in probed) / n_q
        corpus.unpersist()
        out[n] = {
            "n_cells": n_cells,
            "recall": round(recall, 3),
            "cand_per_query": round(cand, 1),
            "ivf_sec": round(ivf_sec, 2),
        }
        print(
            f"ivf_sqrt_probe N={n} cells={n_cells} probe={N_PROBE} "
            f"recall={recall:.3f} cand/q={cand:.0f} sec={ivf_sec:.2f}"
        )
    small, big = out[2048], out[8192]
    cand_ratio = big["cand_per_query"] / small["cand_per_query"]
    out["cand_ratio_at_4x"] = round(cand_ratio, 2)
    # the gates the docstring claim must survive
    assert big["recall"] >= 0.85, f"recall degraded at 4x: {big['recall']}"
    assert big["recall"] >= small["recall"] - 0.05, (
        f"recall not stable: {small['recall']} -> {big['recall']}"
    )
    assert cand_ratio <= 2.6, (
        f"candidates/query grew {cand_ratio:.2f}x at 4x data — not ~sqrt"
    )
    print(json.dumps({"ivf_sqrt_probe": out}, separators=(",", ":")))
    return out


if __name__ == "__main__":
    main()
