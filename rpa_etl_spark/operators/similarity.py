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

import math

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


def same_cell_top1(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Each vector's exact cosine top-1 WITHIN its assigned cell, as one
    grouped Arrow kernel per cell (round 14, guide §4.2).

    Equivalent to the cell self-join + per-pair cosine + max_by shape it
    replaces, but each vector crosses the Python boundary ONCE per side
    of the gram matrix instead of once per candidate pair: at n vectors
    per cell the join form ships n² pairs x 2 vectors (measured ~0.5 GB
    through Arrow at a 2000-vector corpus in 8 cells) while this ships
    n vectors and computes the n x n scores inside numpy.

    Tie-break matches the join form's ``max_by(struct(score, -id))``:
    candidates are ordered id-ascending, so ``argmax`` returns the
    smallest neighbor id among exact float ties. A vector alone in its
    cell has no candidates and is DROPPED (the join form's inner-join
    semantics). Cost is Σ n_cell², the same candidate volume as the
    join — this changes the constant, not the complexity; cells come
    from an n_cells ~ √N codebook at scale (train_ivf_codebook)."""
    out_schema = f"{id_col} long, nn_id long"

    def top1(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({id_col: [], "nn_id": []}).astype(
                {id_col: "int64", "nn_id": "int64"})
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        dots = V @ V.T
        nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
        denom = np.outer(nrm, nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom > 0, dots / denom, 0.0)
        np.fill_diagonal(scores, -np.inf)
        best = np.argmax(scores, axis=1)  # first max → smallest id on ties
        return pd.DataFrame({id_col: ids, "nn_id": ids[best]})

    return assigned.groupBy(cell_col).applyInPandas(top1, out_schema)


# brute_force_topk is the EXACT oracle baseline — quadratic by nature.
# Above this corpus size the caller must opt in with exact=True (the same
# philosophy as the plan gate that rejects corpus-side broadcasts: scale
# contracts are mechanical, not documentary).
BRUTE_FORCE_MAX_ROWS = 200_000


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    max_rows: int = BRUTE_FORCE_MAX_ROWS,
) -> DataFrame:
    """Exact top-k neighbors per query vector. The query side is broadcast;
    the corpus is scanned once; the only shuffle carries |Q|·k-bounded rows
    into the per-query rank window.

    Cost is |Q|·|corpus| — correct as the exact baseline, wrong as a scale
    path. Unless ``exact=True``, corpora above ``max_rows`` are refused
    (the probe is a column-pruned ``limit(max_rows+1).count()``, so the
    guard's own OUTPUT is bounded regardless of corpus size — but it is an
    eager job, so a corpus with expensive uncached upstream lineage pays
    that lineage once for the probe and again at materialization; persist
    first or pass ``exact=True`` to skip the probe). Streaming inputs skip
    the guard (count is undefined pre-sink). Route large corpora through
    :func:`ann_topk_lsh` / :func:`ivf_topk` / :func:`ivf_pq_topk`."""
    if not exact and not corpus.isStreaming:
        probe = corpus.select(id_col).limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"brute_force_topk: corpus exceeds {max_rows} rows; this "
                "path is the quadratic exact baseline — pass exact=True to "
                "force it, or use ann_topk_lsh/ivf_topk/ivf_pq_topk"
            )
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
    n_cells: "int | None" = 32,
    iters: int = 4,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Deterministic distributed k-means codebook for :func:`ivf_topk`.

    ``n_cells=None`` auto-sizes to ``isqrt(N)`` from one cheap count —
    the production default measured in SCALE.md §10b: √N cells keep the
    Lloyd assignment work N·√N (vs N·const growing quadratic candidate
    volume) and hold recall with candidates/query growing ~√(data ratio)
    at fixed n_probe. Pass an explicit int only when the cell count is
    semantically pinned (q_ann_ivf_trained fixes 8 because the oracle's
    ground truth has 8 clusters).

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
    if n_cells is None:
        n_cells = max(1, math.isqrt(corpus.count()))
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
    n_cells: "int | None" = 32,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into ``n_cells``
    Voronoi cells around fixed centroids, probe only the ``n_probe`` cells
    nearest each query, score exactly within the probed cells.

    ``broadcast_queries=True`` (default) hints the exploded query side
    into a broadcast hash join — right for the retrieval norm of few
    queries against a big corpus. Pass False when the query side is
    corpus-sized (e.g. all-pairs self-retrieval): a corpus-sized
    broadcast is the inverse of the small-side rule, and the cell-keyed
    SHUFFLED hash join is the correct 100 TB shape (the q_ann_ivf_trained
    round-7 lesson, now a knob instead of an inlined variant).

    The default centroid "codebook" is deterministic — the first
    ``n_cells`` corpus vectors by id — chosen because the declared oracle
    query (q_ann_ivf) re-derives exactly those cells in SQL.
    ``n_cells=None`` auto-sizes to ``isqrt(N)`` (one cheap count; the
    SCALE.md §10b production sizing). Pass
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
        if n_cells is None:
            # production default, same contract as train_ivf_codebook:
            # √N cells from one cheap count (SCALE.md §10b)
            n_cells = max(1, math.isqrt(corpus.count()))
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
        c.join(F.broadcast(q) if broadcast_queries else q, "cell")
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


def banded_id_pairs(
    df: DataFrame,
    id_col: str,
    window: int,
    payload: "list[tuple[str, str, str]]",
) -> DataFrame:
    """Candidate pairs (id_a < id_b, id_b − id_a ≤ window) as an EQUI
    hash join — the bounded-window blocking shared by the cosine and
    Levenshtein near-dup paths (round-10 review: the identity previously
    lived copy-pasted in two places). ``payload`` lists
    (source_col, a_alias, b_alias) columns carried onto the pair rows.

    The identity: with bucket(x) = floor(x / window) (cast-truncation —
    ids must be non-negative), 0 < b − a ≤ window implies bucket(a) ∈
    {bucket(b), bucket(b)−1}, so banding the left side once and exploding
    the right into its own and previous bucket covers exactly the window
    predicate. The window predicate alone would plan as a
    BroadcastNestedLoopJoin — all-pairs, quadratic; this is one linear
    shuffle with the same result set."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(s).alias(an) for s, an, _ in payload],
        (F.col(id_col) / window).cast("long").alias("bucket"),
    )
    bkt = (F.col(id_col) / window).cast("long")
    b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(s).alias(bn) for s, _, bn in payload],
        F.explode(F.array(bkt, bkt - 1)).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("id_b") - F.col("id_a") <= window)
        )
        .drop("bucket")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    window: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: "int | None" = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a bounded id window
    (the oracle-checkable slice of the general LSH-bucketed variant);
    blocking via :func:`banded_id_pairs`.

    ``score_round``: apply the threshold to the score ROUNDED to this
    many decimals (and emit the rounded score). Membership on a raw
    float64 cosine is engine-association-sensitive at the threshold
    boundary (numpy einsum vs a sequential fold agree only to ~1 ulp);
    rounding first makes the kept-pair set decidable at a resolution both
    engines reproduce — the declared oracle query passes 6."""
    pairs = banded_id_pairs(df, id_col, window, [(vec_col, "v_a", "v_b")])
    score = cosine_pd(F.col("v_a"), F.col("v_b"))
    if score_round is not None:
        score = F.round(score, score_round)
    return pairs.select("id_a", "id_b", score.alias("score")).where(
        F.col("score") >= threshold
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized residual codes + asymmetric-distance scoring
# ---------------------------------------------------------------------------
# What makes ANN memory-feasible at 100 TB: after coarse (IVF) assignment,
# each vector's RESIDUAL is split into m subspaces and each subvector is
# quantized to one of ksub codebook entries — the corpus index carries
# m small ints per vector instead of dim floats (64-dim float64 → 8 bytes
# of codes is a 64x shrink). Queries stay exact: ADC (asymmetric distance
# computation) builds one m x ksub lookup table of
# ||query_residual_subvector - codebook_entry||² per (query, probed cell)
# and scores every candidate in that cell with m table gathers instead of
# a dim-dimensional distance evaluation. Reference: Jégou, Douze, Schmid,
# "Product Quantization for Nearest Neighbor Search" (TPAMI 2011).


def _l2_nearest_cells_kernel(cmat: "np.ndarray", top: int):
    """pandas_udf: per vector, ids of the ``top`` nearest codebook rows by
    squared L2 (the IVFADC coarse metric; :func:`_nearest_cells_kernel` is
    the cosine twin). Stable argsort → ties break toward the lower cell id,
    matching the oracle's ``ORDER BY d2 ASC, cell ASC``."""

    @F.pandas_udf(ArrayType(LongType()))
    def cells(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vec.to_numpy()).astype(np.float64)
        d2 = ((v[:, None, :] - cmat[None]) ** 2).sum(axis=2)  # batch x cells
        order = np.argsort(d2, axis=1, kind="stable")[:, :top].astype(np.int64)
        return pd.Series(list(order))

    return cells


def pq_encode_kernel(cmat: "np.ndarray", codebooks: "np.ndarray"):
    """pandas_udf: vector → ``[cell, code_0 … code_{m-1}]`` (one
    array<long>; a struct return would cost a second Arrow column per
    field for no information gain). ``cmat`` is the coarse codebook
    (n_cells x dim), ``codebooks`` the residual PQ codebooks
    (m x ksub x dsub); both ride in as closures — broadcast-equivalent,
    a few KB. Ties break toward the lower index (np.argmin), matching
    the oracle's ``ORDER BY d2 ASC, idx ASC``."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf(ArrayType(LongType()))
    def enc(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vec.to_numpy()).astype(np.float64)  # batch x dim
        d2c = ((v[:, None, :] - cmat[None]) ** 2).sum(axis=2)
        cell = d2c.argmin(axis=1)
        res = (v - cmat[cell]).reshape(len(v), m, dsub)
        d2 = ((res[:, :, None, :] - codebooks[None]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2)  # batch x m
        out = np.concatenate([cell[:, None], codes], axis=1).astype(np.int64)
        return pd.Series(list(out))

    return enc


def pq_residual_kernel(cmat: "np.ndarray"):
    """pandas_udf: vector → residual (vector − nearest coarse centroid),
    the training-side twin of :func:`pq_encode_kernel`'s implicit
    residual."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def res(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vec.to_numpy()).astype(np.float64)
        d2c = ((v[:, None, :] - cmat[None]) ** 2).sum(axis=2)
        return pd.Series(list(v - cmat[d2c.argmin(axis=1)]))

    return res


def pq_train_kernel(cmat: "np.ndarray", codebooks: "np.ndarray"):
    """pandas_udf: vector → ``[code_0 … code_{m-1}, res_0 … res_{dim-1}]``
    (one array<double>; codes are small ints, exactly representable).
    The TRAINING-side kernel: codes and residual in ONE pass, so the
    batch x n_cells x dim coarse-assignment distance matrix — the
    round's most expensive per-row work — is computed once per Lloyd
    round, not once each for an encode kernel and a residual kernel
    (round-10 review fix)."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf(ArrayType(DoubleType()))
    def enc(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vec.to_numpy()).astype(np.float64)
        d2c = ((v[:, None, :] - cmat[None]) ** 2).sum(axis=2)
        res = v - cmat[d2c.argmin(axis=1)]
        rs = res.reshape(len(v), m, dsub)
        codes = ((rs[:, :, None, :] - codebooks[None]) ** 2).sum(axis=3).argmin(axis=2)
        out = np.concatenate([codes.astype(np.float64), res], axis=1)
        return pd.Series(list(out))

    return enc


def adc_score_kernel(cmat: "np.ndarray", codebooks: "np.ndarray"):
    """pandas_udf ``(q_vec, cell, codes) → approximate squared L2``.

    The ADC shape, for real: within each Arrow batch, ONE m x ksub lookup
    table is built per distinct (query, probed cell) —
    LUT[j][t] = ||(q − cent_cell) subvector j − codebooks[j][t]||² — and
    every candidate row in that group is scored with m gathers
    (``LUT[j, code_j]`` summed over j). No candidate ever touches the
    full-dimension vectors; per-batch kernel cost is
    O(groups·m·ksub·dsub + rows·m) instead of O(rows·dim)."""
    m, ksub, dsub = codebooks.shape
    ar = np.arange(m)

    @F.pandas_udf(DoubleType())
    def adc(q_vec: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        n = len(q_vec)
        if n == 0:
            return pd.Series([], dtype=np.float64)
        q = np.stack(q_vec.to_numpy()).astype(np.float64)
        cl = cell.to_numpy().astype(np.int64)
        cd = np.stack(codes.to_numpy()).astype(np.int64)  # n x m
        groups: dict[tuple[bytes, int], list[int]] = {}
        for i in range(n):
            groups.setdefault((q[i].tobytes(), int(cl[i])), []).append(i)
        out = np.empty(n, dtype=np.float64)
        for (_, c), idx in groups.items():
            qr = (q[idx[0]] - cmat[c]).reshape(m, 1, dsub)
            lut = ((qr - codebooks) ** 2).sum(axis=2)  # m x ksub
            sel = np.asarray(idx)
            out[sel] = lut[ar[None, :], cd[sel]].sum(axis=1)
        return pd.Series(out)

    return adc


def _deterministic_pq_codebooks(
    corpus: DataFrame,
    cmat: "np.ndarray",
    m: int,
    ksub: int,
    id_col: str,
    vec_col: str,
    skip: int = 0,
) -> "np.ndarray":
    """Deterministic PQ codebooks: the residuals of the corpus vectors
    ranked ``skip`` … ``skip+ksub-1`` by id, sub-sliced. Exactly
    SQL-re-derivable (the reason the declared oracle query uses this rule
    — same contract as :func:`ivf_topk`'s first-n_cells default); pass
    the trained variant for retrieval quality. ``skip`` exists so the
    default composition skips the coarse seed vectors: a seed's residual
    is identically zero, and ksub entries drawn from the first ids would
    otherwise contain n_cells duplicate zero rows."""
    dim = cmat.shape[1]
    dsub = dim // m
    rows = (
        corpus.orderBy(id_col).limit(skip + ksub).select(vec_col).collect()
    )[skip:]
    if len(rows) < ksub:
        raise ValueError(f"pq: corpus has fewer than skip+ksub={skip + ksub} vectors")
    v = np.stack([np.asarray(r[0]) for r in rows]).astype(np.float64)
    d2c = ((v[:, None, :] - cmat[None]) ** 2).sum(axis=2)
    res = v - cmat[d2c.argmin(axis=1)]  # ksub x dim
    # codebooks[j] = sub-residuals of entries 0..ksub-1 in subspace j
    return res.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 4,
    oversample: int = 4,
    coarse_codebook: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Distributed k-means PQ codebooks over coarse-quantizer RESIDUALS
    (classic IVFADC training), returned as (m x ksub x dsub).

    Same distributed shape as :func:`train_ivf_codebook`, with all m
    subspaces trained in ONE aggregate per Lloyd round (not m jobs):
    seeding takes ``oversample·ksub`` residuals by smallest
    ``xxhash64(id)`` (deterministic, ingest-order-free) and reduces to
    ksub seeds per subspace by farthest-point on the driver; each round
    then encodes every vector (Arrow kernel, codebooks as closure),
    explodes to (subspace, code, dim-within-subspace, value) — m·dsub =
    dim rows per vector, the same explode volume a plain dim-keyed
    k-means round carries — and takes (j, code, pos)-keyed count/sum with
    map-side partial aggregation. Only the m·ksub·dsub aggregate rows
    ever reach the driver per round. Empty codes keep their previous
    entry. Means are NOT normalized (PQ is an L2 quantizer — the optimal
    entry for a cell IS the mean).

    Float caveat (same as train_ivf_codebook, and why the declared oracle
    query pins DETERMINISTIC codebooks instead): per-code means accumulate
    in parallel, so low bits can vary with partitioning; quality gates for
    this path live in pytest (recall + quantization-error tests)."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    if coarse_codebook is None:
        raise ValueError("pq training needs the coarse codebook (residuals)")
    cmat = np.asarray(coarse_codebook, dtype=np.float64)
    res_k = pq_residual_kernel(cmat)
    seeds = (
        corpus.select(
            res_k(F.col(vec_col)).alias("r"),
            F.xxhash64(F.col(id_col)).alias("h"),
        )
        .orderBy("h", "r")
        .limit(oversample * ksub)
        .select("r")
        .collect()
    )
    if len(seeds) < ksub:
        raise ValueError(f"pq: corpus has fewer than ksub={ksub} vectors")
    pool = np.stack([np.asarray(r[0]) for r in seeds]).astype(np.float64)
    pool = pool.reshape(len(pool), m, dsub)
    cbs = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = pool[:, j, :]
        chosen = [0]
        mind2 = ((sub - sub[0]) ** 2).sum(axis=1)
        while len(chosen) < ksub:
            nxt = int(np.argmax(mind2))
            chosen.append(nxt)
            mind2 = np.minimum(mind2, ((sub - sub[nxt]) ** 2).sum(axis=1))
        cbs[j] = sub[chosen]
    dim_ = m * dsub
    for _ in range(iters):
        trk = pq_train_kernel(cmat, cbs)
        assigned = corpus.select(trk(F.col(vec_col)).alias("cr"))
        agg = (
            assigned.select(
                F.posexplode(F.slice("cr", 1, m)).alias("j", "codef"),
                F.slice(F.col("cr"), m + 1, dim_).alias("res"),
            )
            .select(
                "j",
                F.col("codef").cast("int").alias("code"),
                F.posexplode(
                    F.slice(F.col("res"), F.col("j") * dsub + 1, F.lit(dsub))
                ).alias("pos", "val"),
            )
            .groupBy("j", "code", "pos")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
            .collect()
        )
        counts = np.zeros((m, ksub), dtype=np.int64)
        sums = np.zeros((m, ksub, dsub), dtype=np.float64)
        for row in agg:
            counts[row["j"], row["code"]] = row["n"]
            sums[row["j"], row["code"], row["pos"]] = row["s"]
        nonempty = counts > 0
        cbs[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return cbs


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    ksub: int = 16,
    coarse_codebook: "np.ndarray | None" = None,
    pq_codebooks: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank: bool = True,
) -> DataFrame:
    """IVFADC approximate top-k (ascending squared-L2): coarse cells prune
    the corpus exactly like :func:`ivf_topk`, then candidates are scored
    against PQ CODES via the ADC lookup-table kernel — never against raw
    vectors.

    The scale story this composition buys over ivf_topk: the shuffled side
    of the cell join carries (id, cell, m codes) per corpus row — the codes
    ≪ raw-vectors property that makes a 100 TB index hold in cluster
    memory. Defaults are the deterministic, SQL-re-derivable codebooks
    (coarse = first n_cells by id; PQ = residuals of the first ksub by
    id); pass ``train_ivf_codebook`` / :func:`train_pq_codebooks` outputs
    for retrieval quality. ``rank=False`` returns the scored candidates
    for callers that rank on a rounded distance (the oracle-stable form).
    """
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    coarse_defaulted = coarse_codebook is None
    if coarse_defaulted and pq_codebooks is None:
        # one TakeOrdered collect serves BOTH deterministic codebooks
        # (review fix: previously two full ordered corpus scans); the PQ
        # entries start after the coarse seeds, whose residuals are
        # identically zero and would duplicate one codebook entry
        head = corpus.orderBy(id_col).limit(n_cells + ksub).select(vec_col).collect()
        if not head:
            spark = corpus.sparkSession
            empty = "query_id long, neighbor_id long, cell long, adc_d2 double"
            return spark.createDataFrame(
                [], empty + (", rank int" if rank else "")
            )
        if len(head) < n_cells + ksub:
            raise ValueError(
                f"ivf_pq_topk: corpus has fewer than n_cells+ksub="
                f"{n_cells + ksub} vectors"
            )
        vs = np.stack([np.asarray(r[0]) for r in head]).astype(np.float64)
        cmat = vs[:n_cells]
        tail = vs[n_cells:]
        d2c = ((tail[:, None, :] - cmat[None]) ** 2).sum(axis=2)
        res = tail - cmat[d2c.argmin(axis=1)]
        cbs = res.reshape(ksub, m, dim // m).transpose(1, 0, 2).copy()
    else:
        if coarse_codebook is not None:
            cmat = np.asarray(coarse_codebook, dtype=np.float64)
        else:
            cents = corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
            if not cents:
                spark = corpus.sparkSession
                empty = "query_id long, neighbor_id long, cell long, adc_d2 double"
                return spark.createDataFrame(
                    [], empty + (", rank int" if rank else "")
                )
            cmat = np.stack([np.asarray(r[0]) for r in cents]).astype(np.float64)
        if pq_codebooks is not None:
            cbs = np.asarray(pq_codebooks, dtype=np.float64)
            # fail fast on shape drift: a codebook trained with a different
            # m would otherwise truncate codes at F.slice and crash as an
            # opaque numpy broadcast error inside an executor Arrow batch
            if cbs.ndim != 3 or cbs.shape[0] != m or cbs.shape[2] != dim // m:
                raise ValueError(
                    f"ivf_pq_topk: pq_codebooks shape {cbs.shape} incompatible "
                    f"with m={m}, dsub={dim // m} (expected (m, ksub, dsub))"
                )
        else:
            cbs = _deterministic_pq_codebooks(
                corpus, cmat, m, ksub, id_col, vec_col,
                skip=n_cells if coarse_defaulted else 0,
            )
    if cmat.shape[1] != dim:
        raise ValueError(
            f"ivf_pq_topk: codebook dim {cmat.shape[1]}, expected {dim}"
        )

    enc = pq_encode_kernel(cmat, cbs)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), enc(F.col(vec_col)).alias("cc")
        )
        .select(
            "neighbor_id",
            F.element_at("cc", 1).alias("cell"),
            F.slice("cc", 2, m).alias("codes"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            _l2_nearest_cells_kernel(cmat, n_probe)(F.col(vec_col))
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            adc_score_kernel(cmat, cbs)(
                F.col("q_vec"), F.col("cell"), F.col("codes")
            ).alias("adc_d2"),
        )
    )
    if not rank:
        return scored
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return scored.select("*", F.row_number().over(w).alias("rank")).where(
        F.col("rank") <= k
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.8,
    num_planes: int = 4,
    num_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: "int | None" = 6,
) -> DataFrame:
    """Embedding near-duplicate PAIRS over the whole corpus via LSH
    blocking — the scale path whose oracle-checkable bounded-window
    slice is :func:`cosine_near_dup_pairs` (SemDeDup-style semantic
    dedup, blocked by sign-bit hyperplane buckets instead of trained
    clusters).

    Candidates are generated ONLY by the (table, bucket) equi-join —
    never all pairs: expected pair volume is Σ_t Σ_b (n_b choose 2),
    i.e. corpus² / 2^num_planes per table under uniform buckets. The
    recall knob is num_tables (P[miss] decays exponentially); the
    candidate-volume knob is num_planes. With the defaults (4 planes ×
    12 tables) a cosine-0.8 pair (θ ≈ 37°) collides per table with
    p ≈ 0.795⁴ ≈ 0.40, so P[missed by all 12] ≈ 0.6¹² ≈ 0.2% —
    tests/test_mlstats.py gates measured recall vs the exact all-pairs
    ground truth.

    Pairs are formed on ids only (vectors joined back afterwards), so
    the bucket self-join shuffles num_tables small rows per vector, not
    num_tables copies of the vector. Threshold membership is decided on
    the ROUNDED score (same convention and rationale as
    cosine_near_dup_pairs — raw float64 cosine at the boundary is
    engine-association-sensitive to ~1 ulp)."""
    from rpa_etl_spark.tables import spread

    kernel = lsh_signatures_kernel(dim, num_planes, num_tables)
    # signatures computed ONCE and lineage-cut: both sides of the bucket
    # self-join read the materialized (id, sigs) rows instead of each
    # re-running the Arrow kernel subtree (r14, guide §4/§5 — the
    # checkpoint is ids+signatures only, never the vectors)
    sigs = df.select(
        F.col(id_col).alias("pid"), kernel(F.col(vec_col)).alias("sigs")
    ).localCheckpoint(eager=False)
    bk = sigs.select("pid", F.posexplode("sigs").alias("t", "bucket"))
    # spread the PROBE side: the tiny build side broadcasts, so the join
    # output — Σ n_bucket² candidate rows, orders of magnitude more than
    # the input — inherits the probe side's partitioning, and the
    # dedup's partial aggregate must run at CPU parallelism, not at the
    # checkpoint's partition count (r14, guide §2.2; measured 2x on the
    # candidate+dedup stage)
    a = spread(bk.selectExpr("pid AS id_a", "t AS t_a", "bucket AS b_a"))
    b = bk.selectExpr("pid AS id_b", "t AS t_b", "bucket AS b_b")
    cand = (
        a.join(
            b,
            (F.col("t_a") == F.col("t_b"))
            & (F.col("b_a") == F.col("b_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])  # collided in ≥1 table
    )
    va = df.selectExpr(f"{id_col} AS id_a", f"{vec_col} AS v_a")
    vb = df.selectExpr(f"{id_col} AS id_b", f"{vec_col} AS v_b")
    score = cosine_pd(F.col("v_a"), F.col("v_b"))
    if score_round is not None:
        score = F.round(score, score_round)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", score.alias("score"))
        .where(F.col("score") >= threshold)
    )
