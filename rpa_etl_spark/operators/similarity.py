"""Similarity search over embedding columns (`array<float>`).

Two tiers, mirroring what a real 100 TB pipeline does:

- **Brute-force cosine top-k** for a bounded query set: broadcast the
  queries, score against the full corpus scan (one pass, no shuffle of the
  corpus), per-query top-k via window rank. Exact; cost = |Q|·|corpus|.
- **Hyperplane-LSH ANN**: sign-bit signatures against deterministic
  pseudo-random hyperplanes → bucket join → exact cosine only within
  buckets. Sub-linear candidate volume; recall tested against brute force.

Scoring kernels are Arrow-batched numpy (`pandas_udf`): a 64-dim dot as a
JVM higher-order fold evaluates interpreted per element, while numpy does
the whole batch in one BLAS call — measured ~5x faster at bench scale and
the same ratio holds per-executor on a cluster. The JVM fold (`dot`,
`cosine`) is kept for plans that must stay pure-expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — strict left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


@F.pandas_udf(DoubleType())
def cosine_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over two array columns (one einsum per Arrow
    batch). Float64 throughout; agrees with the fold version to ~1 ulp."""
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    va = np.stack(a.to_numpy()).astype(np.float64)
    vb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", va, vb)
    na = np.sqrt(np.einsum("ij,ij->i", va, va))
    nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
    d = na * nb
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(d > 0, dots / d, 0.0)
    return pd.Series(out)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector. The query side is broadcast;
    the corpus is scanned once; the only shuffle carries |Q|·k-bounded rows
    into the per-query rank window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pd(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: components from a
    splitmix-style integer scramble of (plane, dim) — reproducible across
    runs and engines without an RNG."""
    comps = []
    for d in range(dim):
        z = (plane_idx * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
        z ^= z >> 31
        comps.append(((z % 2_000_001) / 1_000_000.0) - 1.0)  # [-1, 1]
    return comps


def lsh_signature(vec: Column, dim: int, num_planes: int = 16,
                  table_salt: int = 0) -> Column:
    """Sign-bit signature: bit_j = 1 iff vec · plane_j > 0. One long.
    ``table_salt`` selects an independent plane family per LSH table."""
    sig = F.lit(0).cast("long")
    for j in range(num_planes):
        plane = F.array(
            [F.lit(c) for c in _hyperplane(dim, j + table_salt * 1009)]
        )
        bit = F.when(dot(vec, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + (bit * F.lit(1 << j))
    return sig


def _plane_matrix(dim: int, num_planes: int, table_salt: int) -> np.ndarray:
    """numpy twin of :func:`_hyperplane` for one table (num_planes x dim)."""
    return np.array(
        [_hyperplane(dim, j + table_salt * 1009) for j in range(num_planes)],
        dtype=np.float64,
    )


def lsh_signatures_kernel(dim: int, num_planes: int, num_tables: int):
    """Vectorized all-tables signature: one (batch x dim)·(dim x planes)
    matmul per table per Arrow batch, bits packed into a long per table.
    Bit-identical to summing :func:`lsh_signature` per table (same planes,
    float64 dots; sign flips would need |dot| < 1e-15)."""
    planes = [
        _plane_matrix(dim, num_planes, t).T  # dim x planes
        for t in range(num_tables)
    ]
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sigs(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vec.to_numpy()).astype(np.float64)  # batch x dim
        per_table = [((m @ p) > 0) @ weights for p in planes]  # each: batch
        packed = np.stack(per_table, axis=1)  # batch x tables
        return pd.Series(list(packed))

    return sigs


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine evaluated only for candidates that
    collide with the query in ≥1 of ``num_tables`` independent LSH tables
    (multi-table = the standard recall amplifier: P[miss] decays
    exponentially in table count).

    At 100 TB the bucketed join replaces the |Q|·|corpus| scan with
    |Q|·E[candidates]; tune num_planes up for sparser buckets and
    num_tables up for recall. NB: on *uniformly random* vectors (like the
    synthetic test embeddings) there is no locality for any ANN method to
    exploit — recall targets only mean something on clustered real data.
    """

    kernel = lsh_signatures_kernel(dim, num_planes, num_tables)

    def sig(df: DataFrame, ids: str, vec_alias: str) -> DataFrame:
        signed = df.select(
            F.col(id_col).alias(ids),
            F.col(vec_col).alias(vec_alias),
            kernel(F.col(vec_col)).alias("tables"),
        )
        return signed.select(
            ids, vec_alias, F.posexplode("tables").alias("table_idx", "bucket")
        )

    q = sig(queries, "query_id", "q_vec")
    c = sig(corpus, "neighbor_id", "c_vec")
    candidates = (
        c.join(F.broadcast(q), ["table_idx", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])  # collided in ≥1 table
    )
    scored = candidates.select(
        "query_id", "neighbor_id", cosine_pd(F.col("q_vec"), F.col("c_vec")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.select("*", F.row_number().over(w).alias("rank")).where(
        F.col("rank") <= k
    )


def _nearest_cells_kernel(cmat: "np.ndarray", top: int):
    """pandas_udf: per vector, ids of the ``top`` nearest codebook rows by
    cosine. The codebook rides into the kernel as a closure — broadcast-
    equivalent (``cmat`` is n_cells x dim, a few KB)."""

    @F.pandas_udf(ArrayType(LongType()))
    def cells(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vec.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ cmat.T  # batch x cells
        order = np.argsort(-sims, axis=1)[:, :top].astype(np.int64)
        return pd.Series(list(order))

    return cells


def train_ivf_codebook(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 32,
    iters: int = 4,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Deterministic distributed k-means codebook for :func:`ivf_topk`.

    Seeding (k-means|| shape, RNG-free): OVERSAMPLE ``oversample *
    n_cells`` corpus vectors by smallest ``xxhash64(id)`` — deterministic
    and, unlike first-N-by-id, uncorrelated with ingest order — then
    reduce to ``n_cells`` seeds by farthest-point traversal on the driver
    (the sampled set is tiny; traversal starts from the smallest-hash
    point, so the whole pipeline is reproducible). Oversampling is what
    guarantees cluster COVERAGE: k hash-uniform draws miss a true cluster
    with coupon-collector probability, 4k draws make a miss rare, and
    farthest-point then picks one seed per distinct cluster before it
    ever doubles up. Refinement: ``iters`` Lloyd rounds, each one fully
    distributed — assign every vector to its nearest centroid (Arrow
    kernel, codebook as closure), then per-cell per-dimension means via
    ``n_cells``-keyed JVM aggregation (map-side partial sums absorb the
    volume; the shuffle carries at most n_cells x dim doubles per
    upstream partition). Only the n_cells x (dim+1) aggregate row set is
    ever collected per round — the exact structure a 100 TB k-means job
    has. Empty cells keep their previous centroid.

    Float caveat (why the declared oracle query does NOT use this path):
    per-cell means accumulate in parallel, so centroid low bits can vary
    with partitioning; on clustered data assignments are stable but
    bit-exact reproducibility across cluster layouts is not guaranteed.
    """
    seeds = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h", "v")
        .limit(oversample * n_cells)
        .select("v")
        .collect()
    )
    if not seeds:
        return np.zeros((0, dim), dtype=np.float64)
    pool = np.stack([np.asarray(r[0]) for r in seeds]).astype(np.float64)
    pool /= np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-30)
    # farthest-point reduction: start at the smallest-hash point, then
    # greedily add the pool vector most dissimilar (min cosine) to the
    # chosen set — one seed per distinct cluster before any doubling up
    chosen = [0]
    max_sim = pool @ pool[0]  # each point's max cosine to the chosen set
    while len(chosen) < min(n_cells, len(pool)):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, pool @ pool[nxt])
    cmat = pool[chosen]
    for _ in range(iters):
        assigned = corpus.select(
            F.element_at(_nearest_cells_kernel(cmat, 1)(F.col(vec_col)), 1).alias("cell"),
            F.col(vec_col).alias("v"),
        )
        # per-cell per-dimension sums via posexplode + (cell, pos)-keyed
        # aggregation, NOT dim-many named sum columns: the wide form makes
        # Janino recompile a dim-column aggregate EVERY Lloyd round (the
        # codebook closure changes per round, so no plan reuse) — measured
        # ~2s/round compile at dim=64. The exploded form is three fixed
        # columns regardless of dim, and the shuffle still carries at most
        # n_cells x dim partial rows per upstream partition.
        agg = (
            assigned.select(
                "cell", F.posexplode(F.col("v").cast("array<double>")).alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
            .collect()
        )
        new = cmat.copy()
        counts = np.zeros(cmat.shape[0], dtype=np.int64)
        sums = np.zeros_like(cmat)
        for row in agg:
            counts[row["cell"]] = row["n"]
            sums[row["cell"], row["pos"]] = row["s"]
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-30)
        cmat = new
    return cmat


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 32,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into ``n_cells``
    Voronoi cells around fixed centroids, probe only the ``n_probe`` cells
    nearest each query, score exactly within the probed cells.

    The default centroid "codebook" is deterministic — the first
    ``n_cells`` corpus vectors by id — chosen because the declared oracle
    query (q_ann_ivf) re-derives exactly those cells in SQL. Pass
    ``codebook=train_ivf_codebook(...)`` for the k-means-refined variant
    (same query path; training is the offline batch job at scale). Either
    way the codebook is tiny and rides into the cell-assignment kernel as
    a closure (the moral equivalent of a broadcast variable); the join
    that matters is the (cell)-keyed hash join, whose probe volume is
    |Q|·n_probe/n_cells of the corpus instead of |Q|·|corpus|.

    On uniformly random vectors (the synthetic corpus) cell membership of
    true neighbors is only weakly correlated with the query's cells, so
    recall targets are soft — clustered real embeddings prune far harder
    (tests/test_llmdata.py pins the trained codebook at ≥0.9 recall on a
    clustered fixture, above the untrained floor).
    """
    if codebook is not None:
        cmat = np.asarray(codebook, dtype=np.float64)
    else:
        cents = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(vec_col)
            .collect()
        )
        cmat = (
            np.stack([np.asarray(r[0]) for r in cents]).astype(np.float64)
            if cents
            else np.zeros((0, dim))
        )
    if cmat.shape[0] == 0:
        # empty corpus/codebook → empty result with the declared schema
        # (same degrade-to-zero-rows behavior as every other declared query)
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )
    if cmat.shape[1] != dim:
        raise ValueError(
            f"ivf_topk: corpus vectors have dim {cmat.shape[1]}, expected {dim}"
        )
    cmat = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-30)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(_nearest_cells_kernel(cmat, 1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_nearest_cells_kernel(cmat, n_probe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pd(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.select("*", F.row_number().over(w).alias("rank")).where(
        F.col("rank") <= k
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    window: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a bounded id window
    (the oracle-checkable slice of the general LSH-bucketed variant).

    The window predicate alone would plan as a BroadcastNestedLoopJoin
    (all-pairs — quadratic). Banding ids by ``window`` and exploding the
    right side into (bucket, bucket−1) makes it an equi hash join: for
    0 < b−a ≤ w, bucket(a) ∈ {bucket(b), bucket(b)−1}. Linear shuffle,
    same result set.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        (F.col(id_col) / window).cast("long").alias("bucket"),
    )
    bkt = (F.col(id_col) / window).cast("long")
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        F.explode(F.array(bkt, bkt - 1)).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .where((F.col("id_a") < F.col("id_b")) & (F.col("id_b") - F.col("id_a") <= window))
        .select("id_a", "id_b", cosine_pd(F.col("v_a"), F.col("v_b")).alias("score"))
        .where(F.col("score") >= threshold)
    )
