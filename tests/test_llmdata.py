"""Quality gates for the approximate (rows-only) LLM-data operators: the
DuckDB oracle can't reproduce xxhash64-seeded hashing, so recall and structural
correctness are asserted here instead. Everything is deterministic (seeded
hash families), so thresholds are exact, not flaky."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_spark.operators import dedup as D
from rpa_etl_spark.operators import similarity as SIM
from rpa_etl_spark.operators import textstats as TS
from rpa_etl_spark.sources.multimodal import attach_media_columns, extract_image_features
from rpa_etl_spark.tables import load


def test_minhash_lsh_finds_near_dups(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = docs.unionByName(near)
    g = corpus.select("doc_id", D.word_shingles(F.col("text"), 3).alias("grams"))
    signed = g.select("doc_id", D.minhash_signature(F.col("grams"), 32).alias("minhash"))
    pairs = D.lsh_candidate_pairs(signed.select("doc_id", "minhash"), bands=8)
    n_docs = docs.count()
    found = pairs.where(F.col("id_b") - F.col("id_a") == 100000).count()
    recall = found / n_docs
    assert recall >= 0.9, f"minhash near-dup recall {recall:.3f}"
    # candidate volume stays linear-ish, not quadratic
    assert pairs.count() < 3 * n_docs


def test_simhash_identical_docs_zero_hamming(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    sigs = docs.select(
        "doc_id", D.simhash64(TS.tokens(F.col("text"))).alias("sig")
    ).collect()
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    # deterministic: recompute → identical signatures
    sigs2 = docs.select(
        "doc_id", D.simhash64(TS.tokens(F.col("text"))).alias("sig")
    ).collect()
    assert all(by_id[r["doc_id"]] == r["sig"] for r in sigs2)


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 30)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    ann = SIM.ann_topk_lsh(emb, queries, dim=64, k=10, num_planes=4, num_tables=16)
    rows = ann.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(got & truth) / len(truth)
    # random vectors = worst case for ANN; multi-table LSH still gets there
    assert recall >= 0.7, f"ann recall {recall:.3f}"
    # scores must be true cosines: spot-check one against brute force
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_scores:
            assert abs(r["score"] - bf_scores[key]) < 1e-12


def test_ann_ivf_recall_and_pruning(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 30)
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    truth = set(bf_scores)
    n_cells, n_probe = 32, 16
    ivf = SIM.ivf_topk(emb, queries, dim=64, k=10, n_cells=n_cells, n_probe=n_probe)
    rows = ivf.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(got & truth) / len(truth)
    # uniformly random vectors: cell membership of true neighbors is only
    # weakly query-correlated, so the gate sits just above the n_probe/n_cells
    # random floor; clustered real embeddings land far higher
    assert recall >= 0.55, f"ivf recall {recall:.3f}"
    # scores inside probed cells are exact cosines
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_scores:
            assert abs(r["score"] - bf_scores[key]) < 1e-12


def test_exact_dedup_canonicalization(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tripled = docs.unionByName(
        docs.select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    ).unionByName(docs.select((F.col("doc_id") + 2 * 10**6).alias("doc_id"), "text"))
    out = D.exact_dedup(tripled)
    assert out.where(F.col("n_copies") != 3).count() == 0
    # canonical id is always the original (smallest) id
    assert out.where(F.col("canonical_id") >= 10**6).count() == 0


def test_multimodal_feature_extraction_stub(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(30)
    media = attach_media_columns(docs)
    feats = extract_image_features(media).collect()
    media_rows = {r["media_id"]: r for r in media.collect()}
    assert len(feats) == sum(1 for r in media_rows.values() if r["mime"] == "image/png")
    for f in feats:
        payload = bytes(media_rows[f["media_id"]]["payload"])
        assert f["n_bytes"] == len(payload)
        assert abs(f["mean_byte"] - sum(payload) / len(payload)) < 1e-9
        assert f["decoder"] == "stub"


def test_multimodal_resize_and_frame_sampling(spark, sf_dir):
    from rpa_etl_spark.sources.multimodal import resize_images, sample_frames

    docs = load(spark, sf_dir, "documents").limit(30)
    media = attach_media_columns(docs)
    media_rows = {r["media_id"]: r for r in media.collect()}

    resized = resize_images(media, width=64, height=64).collect()
    assert len(resized) == sum(
        1 for r in media_rows.values() if r["mime"] == "image/png"
    )
    for r in resized:
        assert (r["out_width"], r["out_height"]) == (64, 64)
        assert len(bytes(r["resized_payload"])) == 64 * 64 // 64

    frames = sample_frames(media, fps=0.5).collect()
    videos = {m: r for m, r in media_rows.items() if r["mime"] == "video/mp4"}
    # 1 video row fans out to max(1, floor(duration*fps)) frame rows
    expected = sum(max(1, int(r["meta_duration_s"] * 0.5)) for r in videos.values())
    assert len(frames) == expected
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    for mid, fs in by_media.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))
        for f in fs:
            assert abs(f["frame_ts_s"] - f["frame_idx"] / 0.5) < 1e-9
            # rotation preserves content length
            assert len(bytes(f["frame_payload"])) == len(
                bytes(videos[mid]["payload"])
            )


def test_quality_score_bands(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),  # good
        (2, "x"),                                                  # too short
        (3, "!!! ??? ;;; " * 40),                                  # punct-heavy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: float(r["q"])
        for r in df.select("doc_id", TS.quality_score(F.col("text")).alias("q")).collect()
    }
    assert got[1] == 1.0
    assert got[2] < 0.5
    assert got[3] < got[1]


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog in a house"),
        (2, "der hund und die katze ist nicht hier"),
        (3, "el perro y la casa es una con"),
        (4, "qwzx bnmp vcxz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", TS.lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got[1] == "en" and got[2] == "de" and got[3] == "es" and got[4] == "und"


def test_word_shingles_short_documents_no_crash(spark):
    """Documents with fewer than n words must yield empty shingle sets —
    the unguarded form crashed the whole job (descending sequence() +
    ANSI element_at) on the first 1-2-word doc."""
    rows = [(1, ""), (2, "one"), (3, "only two"), (4, "now three words"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", D.word_shingles(F.col("text"), 3).alias("g")
        ).collect()
    }
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["now three words"]
    assert got[5] == []  # NULL text → empty set (no null arrays downstream)
    # and the full minhash query path survives a mixed corpus
    sigs = df.where(F.col("text").isNotNull()).select(
        "doc_id",
        D.minhash_signature(D.word_shingles(F.col("text"), 3), 8).alias("mh"),
    ).collect()
    assert len(sigs) == 4


def test_lang_quality_arrow_matches_expressions(spark, sf_dir):
    """The Arrow kernel (textstats_arrow) must be cell-exact against the
    pure-expression twin on the real corpus PLUS adversarial rows that probe
    every documented Java-regex parity hazard: tab/newline/NBSP whitespace,
    leading/trailing separators (empty tokens), non-ASCII first chars,
    empty string, null, punctuation-heavy text."""
    from rpa_etl_spark.operators.textstats_arrow import lang_quality_arrow
    from rpa_etl_spark.plans.llmdata_queries import lang_quality_expr

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    adversarial = spark.createDataFrame(
        [
            (900001, ""),
            (900002, None),
            (900003, " \t\n the  and\tof \x0b\f\r"),
            (900004, "café naïve über straße"),
            (900005, " nbsp is a token char"),
            (900006, "!!!***(((;;;:::---"),
            (900007, "the " * 200),
            (900008, "\tleading and trailing\t"),
            (900009, "12 3.14 x9y8z7 mixed42tokens"),
            (900010, "你好 the 世界"),
        ],
        "doc_id bigint, text string",
    )
    corpus = docs.unionByName(adversarial)

    got = lang_quality_arrow(corpus).drop("text")
    want = lang_quality_expr(corpus)
    # nullability differs (mapInPandas fields are always nullable); the
    # driver compares (name, dtype) only, so that's what we pin
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in want.schema
    ]

    cols = got.columns
    g = {r["doc_id"]: tuple(r[c] for c in cols) for r in got.collect()}
    w = {r["doc_id"]: tuple(r[c] for c in cols) for r in want.collect()}
    assert g.keys() == w.keys()
    diffs = {k: (g[k], w[k]) for k in g if g[k] != w[k]}
    assert not diffs, f"{len(diffs)} mismatched rows, e.g. {next(iter(diffs.items()))}"


def test_resize_images_real_codec_paths(spark, sf_dir):
    """resize_images must run the REAL decode->nearest->re-encode path for
    every format with an in-repo codec, selected by magic bytes, and the
    resized payload must decode back to exactly the pixels resize_nearest
    picks from the source image."""
    import numpy as np

    from rpa_etl_spark.sources import multimodal as MM
    from rpa_etl_spark.sources.jpeg import jpeg_decode

    rows = [
        (1, MM.synth_bmp_image(1, 16, 16), "image/bmp"),
        (2, MM.synth_png_image(2, 16, 16), "image/png"),
        (3, b"not an image at all", "image/unknown"),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary, mime string")
    out = {r["media_id"]: r for r in MM.resize_images(media, width=8, height=8).collect()}

    def expected(mid):
        r = np.arange(16).reshape(-1, 1, 1)
        x = np.arange(16).reshape(1, -1, 1)
        c = np.arange(3).reshape(1, 1, -1)
        arr = ((mid + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
        return MM.resize_nearest(arr, 8, 8)

    assert out[1]["method"] == "numpy-nearest-bmp"
    assert np.array_equal(MM.bmp_decode(bytes(out[1]["resized_payload"])), expected(1))
    assert out[2]["method"] == "numpy-nearest-png"
    assert np.array_equal(MM.png_decode(bytes(out[2]["resized_payload"])), expected(2))
    assert out[3]["method"] == "stub"

    # JPEG: lossy — decode must yield the right shape and be close to the
    # nearest-neighbor pixels (baseline JPEG at default quality)
    from rpa_etl_spark.sources.jpeg import jpeg_encode

    jrows = [(4, jpeg_encode(expected(4).repeat(2, axis=0).repeat(2, axis=1)), "image/jpeg")]
    jmedia = spark.createDataFrame(jrows, "media_id bigint, payload binary, mime string")
    jout = MM.resize_images(jmedia, width=8, height=8).collect()[0]
    assert jout["method"] == "numpy-nearest-jpeg"
    arr = jpeg_decode(bytes(jout["resized_payload"]))
    assert arr.shape == (8, 8, 3)


def test_ivf_trained_codebook_beats_first_n_on_clustered_data(spark):
    """On clustered embeddings (the realistic case) the k-means-refined
    codebook must materially beat the first-N-by-id codebook: the fixture's
    ids are SORTED by cluster, so first-N centroids all sit inside cluster
    0 — the exact ingest-order pathology train_ivf_codebook's hash seeding
    + Lloyd refinement removes. Deterministic: fixed RNG seed, RNG-free
    seeding, and assignment on well-separated clusters is float-stable."""
    import numpy as np

    rng = np.random.default_rng(7)
    K, per, dim = 8, 50, 64
    centers = rng.normal(size=(K, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for k in range(K):
        for j in range(per):
            v = centers[k] + 0.05 * rng.normal(size=dim)
            rows.append((k * per + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id") % per < 2)  # 2 per cluster

    def recall(df):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(got & truth) / len(truth)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(corpus, queries, k=5).collect()
    }
    # the honest setting: as many cells as true clusters, single-cell
    # probe — codebook quality is the ONLY thing recall can come from
    base = recall(SIM.ivf_topk(corpus, queries, dim=dim, k=5, n_cells=K, n_probe=1))
    cb = SIM.train_ivf_codebook(corpus, dim=dim, n_cells=K, iters=4)
    trained = recall(
        SIM.ivf_topk(corpus, queries, dim=dim, k=5, n_cells=K, n_probe=1, codebook=cb)
    )
    assert trained >= 0.95, f"trained recall {trained:.3f}"
    assert trained > base + 0.2, f"trained {trained:.3f} vs first-N {base:.3f}"


def test_sample_frames_real_avi_dispatch(spark):
    """sample_frames must sniff RIFF/AVI payloads and emit REAL decoded
    frames (as BMP payloads) sampled against the container's true frame
    rate, while non-AVI video stays on the deterministic stub path."""
    import numpy as np

    from rpa_etl_spark.sources import multimodal as MM

    avi = MM.synth_avi_video(3, n_frames=6, width=8, height=8, fps=10)
    rows = [
        (3, avi, "video/avi", 0.6),
        (9, b"not a riff container", "video/mp4", 4.0),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, payload binary, mime string, meta_duration_s double"
    )
    out = MM.sample_frames(media, fps=5.0).collect()
    real = sorted((r for r in out if r["media_id"] == 3), key=lambda r: r["frame_idx"])
    stub = [r for r in out if r["media_id"] == 9]
    # avi fps=10, sample fps=5 -> step 2 -> frames 0, 2, 4
    assert [r["frame_idx"] for r in real] == [0, 1, 2]
    assert [r["frame_ts_s"] for r in real] == [0.0, 0.2, 0.4]
    for j, fidx in enumerate((0, 2, 4)):
        arr = MM.bmp_decode(bytes(real[j]["frame_payload"]))
        r = np.arange(8).reshape(-1, 1, 1)
        x = np.arange(8).reshape(1, -1, 1)
        c = np.arange(3).reshape(1, 1, -1)
        want = ((3 + 5 * fidx + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
        assert np.array_equal(arr, want)
    # stub: duration 4.0 * fps 5.0 -> 20 rotated-payload frames
    assert len(stub) == 20


def test_minhash_md5_arrow_matches_expression(spark, sf_dir):
    """attach_minhash_md5_arrow must be cell-exact against the pure
    expression form on real corpus shingles plus edge rows (single gram,
    unicode grams)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    extra = spark.createDataFrame(
        [(900001, "uno due tre"), (900002, "café königs straße naïve ação x")],
        "doc_id bigint, text string",
    )
    g = (
        docs.unionByName(extra)
        .select("doc_id", D.word_shingles(F.col("text"), 3).alias("grams"))
        .where(F.size("grams") > 0)
    )
    want = {
        r["doc_id"]: list(r["m"])
        for r in g.select(
            "doc_id", D.minhash_signature_md5(F.col("grams"), 16).alias("m")
        ).collect()
    }
    got = {
        r["doc_id"]: list(r["minhash"])
        for r in D.attach_minhash_md5_arrow(g).select("doc_id", "minhash").collect()
    }
    assert got.keys() == want.keys()
    diffs = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {next(iter(diffs.items()))}"


def test_resize_and_frames_degrade_on_unsupported_variants(spark):
    """A magic-byte match with an unsupported codec variant (compressed
    AVI stand-in, truncated PNG) must degrade to the stub path, not abort
    the Spark stage; degenerate metadata must not divide by zero."""
    from rpa_etl_spark.sources import multimodal as MM

    bad_png = b"\x89PNG\r\n\x1a\n" + b"garbage-not-a-real-chunk"
    bad_bmp = b"BM" + b"\x00" * 10
    media = spark.createDataFrame(
        [(1, bad_png, "image/png"), (2, bad_bmp, "image/bmp")],
        "media_id bigint, payload binary, mime string",
    )
    out = {r["media_id"]: r for r in MM.resize_images(media, width=8, height=8).collect()}
    assert out[1]["method"] == "stub" and out[2]["method"] == "stub"

    bad_avi = b"RIFF" + b"\x10\x00\x00\x00" + b"AVI " + b"garbage"
    vids = spark.createDataFrame(
        [(3, bad_avi, "video/avi", 4.0)],
        "media_id bigint, payload binary, mime string, meta_duration_s double",
    )
    frames = MM.sample_frames(vids, fps=0.5).collect()
    assert len(frames) == 2  # stub path: duration 4.0 * fps 0.5


def test_minhash_arrow_guard_and_null_grams(spark):
    import pytest as _pytest

    from rpa_etl_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, None)], "doc_id bigint, grams array<string>"
    )
    with _pytest.raises(ValueError):
        DD.attach_minhash_md5_arrow(df, num_hashes=18)
    rows = {r["doc_id"]: r["minhash"] for r in DD.attach_minhash_md5_arrow(df).collect()}
    assert rows[2] == [None] * 16
    assert all(len(s) == 16 for s in rows[1])


def test_simhash60_arrow_matches_expression(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    extra = spark.createDataFrame(
        [(900001, ""), (900002, None), (900003, " \tthe and\x0b of "),
         (900004, "café 你好 the")],
        "doc_id bigint, text string",
    )
    corpus = docs.unionByName(extra)
    want = {
        r["doc_id"]: r["s"]
        for r in corpus.select(
            "doc_id", D.simhash60_md5(TS.tokens(F.col("text"))).alias("s")
        ).collect()
    }
    got = {
        r["doc_id"]: r["sig"]
        for r in D.attach_simhash60_md5_arrow(corpus).select("doc_id", "sig").collect()
    }
    diffs = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {next(iter(diffs.items()))}"


def test_brute_force_topk_size_guard(spark):
    """Round-9 verdict ask #3: the quadratic exact baseline must refuse
    oversized corpora unless the caller opts in with exact=True — the
    scale contract is mechanical, not a docstring."""
    import pytest

    rows = [(i, [float(i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="exact=True"):
        SIM.brute_force_topk(df, df.limit(2), k=3, max_rows=10)
    assert SIM.brute_force_topk(df, df.limit(2), k=3, max_rows=10, exact=True).count() == 6
    # under the threshold the guard stays out of the way
    assert SIM.brute_force_topk(df.limit(5), df.limit(2), k=2, max_rows=10).count() == 4


def _pq_cluster_fixture(spark, seed=11, K=8, per=40, dim=64, rank=3):
    """Clustered corpus whose within-cluster variation lives on a low-dim
    manifold — the realistic embedding geometry (isotropic white residuals
    are PQ's information-theoretic worst case and make recall numbers
    meaningless). Returns (corpus DataFrame, V numpy matrix)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    V = np.empty((K * per, dim))
    for k in range(K):
        b, _ = np.linalg.qr(rng.normal(size=(dim, rank)))
        for j in range(per):
            v = centers[k] + 0.2 * (b @ rng.normal(size=rank)) + 0.002 * rng.normal(size=dim)
            V[k * per + j] = v
            rows.append((k * per + j, [float(x) for x in v]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        V,
    )


def test_pq_trained_codebooks_recall_and_quantization_error(spark):
    """train_pq_codebooks (distributed per-subspace Lloyd over residuals)
    must (a) beat the deterministic sampled-residual codebooks on the
    objective k-means optimizes — mean quantization error — and (b) carry
    the full IVF-PQ retrieval to >=0.7 recall@5 vs exact L2 on clustered
    low-rank data. (Recall parity between trained and sampled codebooks is
    NOT asserted: sampled actual residuals already lie on the manifold, so
    the recall gap is fixture-dependent; the error gap is not.)"""
    import numpy as np

    corpus, V = _pq_cluster_fixture(spark)
    K, per, dim = 8, 40, 64
    queries = corpus.where(F.col("vec_id") % per < 2)
    coarse = SIM.train_ivf_codebook(corpus, dim=dim, n_cells=K, iters=3)
    trained = SIM.train_pq_codebooks(
        corpus, dim=dim, m=16, ksub=16, iters=3, coarse_codebook=coarse
    )
    det = SIM._deterministic_pq_codebooks(corpus, coarse, 16, 16, "vec_id", "embedding")

    cmat = np.asarray(coarse)
    d2c = ((V[:, None, :] - cmat[None]) ** 2).sum(2)
    res = (V - cmat[d2c.argmin(1)]).reshape(len(V), 16, 4)

    def qerr(cbs):
        dd = ((res[:, :, None, :] - np.asarray(cbs)[None]) ** 2).sum(3)
        return dd.min(2).sum(1).mean()

    assert qerr(trained) < 0.8 * qerr(det), (qerr(trained), qerr(det))

    d2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(2)
    np.fill_diagonal(d2, np.inf)
    qids = [r["vec_id"] for r in queries.select("vec_id").collect()]
    truth = {(q, int(nb)) for q in qids for nb in np.argsort(d2[q])[:5]}
    got = SIM.ivf_pq_topk(
        corpus, queries, dim=dim, k=5, n_cells=K, n_probe=1, m=16, ksub=16,
        coarse_codebook=coarse, pq_codebooks=trained,
    ).collect()
    recall = len({(r["query_id"], r["neighbor_id"]) for r in got} & truth) / len(truth)
    assert recall >= 0.7, f"ivf-pq recall {recall:.3f}"


def test_adc_lut_scoring_equals_reconstruction_distance(spark):
    """The ADC lookup-table kernel must equal the definitionally obvious
    form — squared L2 between the raw query and the candidate's
    reconstruction (centroid + concatenated codebook entries) — to float
    round-off. This pins the LUT decomposition (grouping, gather indexing,
    subspace slicing) against an independent formulation."""
    import numpy as np

    corpus, V = _pq_cluster_fixture(spark, seed=23, K=4, per=20)
    queries = corpus.where(F.col("vec_id") % 20 < 2)
    coarse = SIM.train_ivf_codebook(corpus, dim=64, n_cells=4, iters=2)
    pq = SIM.train_pq_codebooks(
        corpus, dim=64, m=8, ksub=8, iters=2, coarse_codebook=coarse
    )
    scored = SIM.ivf_pq_topk(
        corpus, queries, dim=64, k=5, n_cells=4, n_probe=2,
        coarse_codebook=coarse, pq_codebooks=pq, rank=False,
    ).collect()
    assert len(scored) > 50
    cmat, cbs = np.asarray(coarse), np.asarray(pq)
    d2c = ((V[:, None, :] - cmat[None]) ** 2).sum(2)
    cell = d2c.argmin(1)
    res = (V - cmat[cell]).reshape(len(V), 8, 8)
    codes = ((res[:, :, None, :] - cbs[None]) ** 2).sum(3).argmin(2)
    for r in scored:
        q, nb = r["query_id"], r["neighbor_id"]
        recon = cmat[r["cell"]] + cbs[np.arange(8), codes[nb]].reshape(-1)
        want = ((V[q] - recon) ** 2).sum()
        assert abs(want - r["adc_d2"]) < 1e-9, (q, nb, want, r["adc_d2"])
        assert r["cell"] == cell[nb]


def test_ivf_pq_rejects_mismatched_codebook_shape(spark):
    """Round-10 review: a user-supplied PQ codebook whose m disagrees with
    the call must fail fast with a clear ValueError, not surface as an
    opaque numpy broadcast error inside an executor Arrow batch."""
    import numpy as np
    import pytest

    rows = [(i, [float(i + d) for d in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    wrong = np.zeros((16, 8, 4))  # m=16, dsub=4 — incompatible with m=8
    with pytest.raises(ValueError, match="pq_codebooks shape"):
        SIM.ivf_pq_topk(
            df, df.limit(2), dim=64, n_cells=4, m=8, ksub=8,
            coarse_codebook=np.zeros((4, 64)), pq_codebooks=wrong,
        )


def test_same_cell_top1_matches_join_form(spark):
    """Round-14 kernel swap gate: similarity.same_cell_top1 (grouped
    numpy gram per cell) must reproduce the cell self-join + per-pair
    cosine + max_by(struct(score, -id)) shape it replaced — including
    the smallest-id tie-break and the inner-join drop of vectors alone
    in their cell."""
    import numpy as np

    from rpa_etl_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    rows = []
    # 3 populated cells + one singleton cell (id 999 must vanish)
    for k in range(3):
        for j in range(40):
            v = rng.normal(size=16)
            rows.append((k * 100 + j, [float(x) for x in v], k))
    rows.append((999, [float(x) for x in rng.normal(size=16)], 7))
    # exact tie pair: two identical vectors in cell 8 plus a third copy —
    # each must pick the SMALLEST other id among equal scores
    tie = [float(x) for x in rng.normal(size=16)]
    rows += [(2001, tie, 8), (2002, tie, 8), (2003, tie, 8)]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int"
    )

    q_side = assigned.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"), "cell",
    )
    joined = (
        assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"), "cell",
        )
        .join(q_side, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            S.cosine_pd(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
        .groupBy("query_id")
        .agg(F.max_by(
            "neighbor_id",
            F.struct(F.col("score"), (-F.col("neighbor_id")).alias("neg")),
        ).alias("nn_id"))
    )
    want = {(r["query_id"], r["nn_id"]) for r in joined.collect()}
    got = {(r["vec_id"], r["nn_id"])
           for r in S.same_cell_top1(assigned).collect()}
    assert got == want
    assert not any(q == 999 for q, _ in got)  # singleton cell dropped
    assert (2002, 2001) in got and (2003, 2001) in got  # smallest-id tie
