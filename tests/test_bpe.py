"""Corpus-trained BPE tokenizer tests (round 6, operators/bpe.py)."""

from __future__ import annotations

import pytest

from rpa_etl_spark.operators import bpe as B


def _train_local(word_freq: dict[str, int], n_merges: int):
    """Driver merge loop isolated from Spark for property tests."""
    vocab = [(list(w), f) for w, f in word_freq.items()]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(
            counts.items(), key=lambda kv: (-kv[1], f"\x02{kv[0][0]} \x02{kv[0][1]} ")
        )
        (left, right), cnt = best
        merges.append((left, right))
        for k, (syms, freq) in enumerate(vocab):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[k] = (out, freq)
    return merges


def test_apply_merges_roundtrip():
    merges = _train_local({"lower": 5, "lowest": 3, "newer": 6, "wider": 2}, 10)
    for w in ["lower", "lowest", "newer", "wider", "low", "unseen"]:
        toks = B.apply_merges(w, merges)
        assert "".join(toks) == w  # lossless
        assert all(toks)  # no empty symbols


def test_apply_merges_sequential_semantics():
    # merge (s,t) before (a,s): "fast" must NOT merge a+s after st exists
    merges = [("s", "t"), ("a", "s")]
    assert B.apply_merges("fast", merges) == ["f", "a", "st"]
    assert B.apply_merges("assst", merges) == ["as", "s", "st"]


def test_apply_merges_nonoverlapping_left_to_right():
    assert B.apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
    assert B.apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert B.apply_merges("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]


def test_train_deterministic_tiebreak():
    # equal counts: pair with the smaller marker-string form wins
    merges = _train_local({"ab": 1, "cd": 1}, 1)
    assert merges == [("a", "b")]


def test_train_bpe_on_spark(spark, sf_dir):
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    m1 = B.train_bpe(docs, n_merges=8)
    m2 = B.train_bpe(docs, n_merges=8)
    assert m1 == m2  # deterministic across runs
    assert 0 < len(m1) <= 8
    for left, right, cnt in m1:
        assert cnt > 0 and left and right
    # counts are non-increasing only per greedy step on the ORIGINAL corpus,
    # not monotone in general — but the first merge must be the global max
    assert m1[0][2] == max(c for _, _, c in m1)


def test_train_bpe_full_vocab(spark, sf_dir):
    """top_words=None = full word-frequency table (round-7 knob). On the
    test corpus the vocabulary is far below the default cutoff, so the
    full-vocab table must equal the top-K one; on heavy-tailed corpora it
    may legitimately differ (SCALE.md §11 records the measured delta)."""
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    assert B.train_bpe(docs, n_merges=8, top_words=None) == B.train_bpe(
        docs, n_merges=8
    )


def test_train_bpe_distributed_equals_driver_loop(spark, sf_dir):
    """The distributed Sennrich trainer (keyed pair-count aggregate per
    round, one-row argmax collect, localCheckpoint lineage cuts) must be
    OUTPUT-IDENTICAL to the driver merge loop — full-vocab, bounded
    top_words, and NULL-text cases."""
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("text")
    assert B.train_bpe_distributed(docs, n_merges=8) == B.train_bpe(
        docs, n_merges=8, top_words=None
    )
    small = docs.limit(40).union(
        spark.createDataFrame([(None,)], "text string")
    )
    assert B.train_bpe_distributed(small, n_merges=5, top_words=7) == B.train_bpe(
        small, n_merges=5, top_words=7
    )


def test_train_bpe_distributed_marker_byte_in_text(spark):
    """A literal \\x02 (the internal symbol marker) INSIDE a word must not
    seed phantom pairs: the round-14 anchored-lookahead pair regex admits
    a match only at symbol starts, so a marker byte in symbol CONTENT is
    inert — pinned by equality with the driver loop, whose pair counting
    iterates real symbol lists and cannot be confused by content bytes."""
    docs = spark.createDataFrame(
        [("ab\x02ab ab\x02ab xy",), ("ab\x02ab \x02\x02 xy xy",), (None,)],
        "text string",
    )
    assert B.train_bpe_distributed(docs, n_merges=6) == B.train_bpe(
        docs, n_merges=6, top_words=None
    )


def test_attach_bpe_tokens_null_text(spark):
    """NULL text is an empty document (0 words, 0 tokens) — not the
    literal word 'None' (round-7 ADVICE fix)."""
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in B.attach_bpe_tokens(docs, [("a", "b")]).collect()}
    assert rows[2]["n_words"] == 0 and rows[2]["n_tokens"] == 0
    assert rows[1]["n_words"] == 2 and rows[1]["n_tokens"] == 2


def test_whitespace_class_excludes_vertical_tab_consistently(spark):
    """\\x0b is NOT a separator in the pinned [ \\t\\n\\r\\f] class — the
    Spark split and the Arrow kernel must agree (the three-way \\s
    divergence the round-7 ADVICE pinned)."""
    txt = "aa\x0bbb cc"
    docs = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    wf = {r["word"]: r["freq"] for r in B.word_frequencies(docs).collect()}
    assert wf == {"aa\x0bbb": 1, "cc": 1}
    out = B.attach_bpe_tokens(docs, []).collect()[0]
    assert out["n_words"] == 2  # kernel splits identically


def test_attach_bpe_tokens_counts(spark, sf_dir):
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    merges = B.train_bpe(docs, n_merges=8)
    out = B.attach_bpe_tokens(docs, merges).collect()
    assert len(out) == docs.count()
    for r in out:
        # more merges → fewer tokens than chars, never fewer than words
        assert r["n_tokens"] >= r["n_words"]


def test_oracle_sql_generators_shape():
    sql = B.bpe_train_oracle_sql(n_merges=4)
    assert sql.count("MATERIALIZED") >= 12  # 3 CTEs per merge + bases
    assert "m3" in sql and "m4" not in sql
    sql2 = B.bpe_tokenize_oracle_sql(n_merges=4)
    assert "a3" in sql2 and "docsyms" in sql2


def test_attach_bpe_tokens_carry_columns(spark, sf_dir):
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    merges = B.train_bpe(docs, n_merges=4)
    out = B.attach_bpe_tokens(docs, merges, carry=["lang"])
    assert out.columns == ["doc_id", "lang", "n_words", "n_tokens"]
    rows = {r["doc_id"]: r["lang"] for r in out.collect()}
    truth = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    assert rows == truth


def test_bpe_distributed_symbolizes_line_separator(spark):
    """U+2028 LINE SEPARATOR is NOT whitespace in the pinned class and is
    skipped by Java-regex '.' without DOTALL — the distributed trainer
    must still symbolize it identically to the driver loop."""
    from rpa_etl_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [("a b a b xy xy xy",)], "text string"
    )
    assert B.train_bpe_distributed(docs, n_merges=3) == B.train_bpe(
        docs, n_merges=3, top_words=None
    )


# ---- byte-level mode (round 8) --------------------------------------------


def test_byte_syms_bijection_and_order():
    """Hex-pair symbolization is lossless and order-faithful: joining the
    pairs re-decodes to the word, and for ASCII the pair order mirrors
    char order (the property the shared tie-break relies on)."""
    for w in ["lower", "aB9!", "ação", "naïve", " x"]:
        syms = B._byte_syms(w)
        assert bytes.fromhex("".join(syms)).decode("utf-8") == w
        assert all(len(s) == 2 and s == s.upper() for s in syms)
    assert B._byte_syms("a") < B._byte_syms("b") < B._byte_syms("z")


def test_byte_level_equals_char_level_on_pure_ascii(spark):
    """On a pure-ASCII corpus every char is one byte, so the byte-level
    trainer must produce EXACTLY the char-level merge table under the
    hex bijection — same ranks, same counts."""
    rows = [(i, t) for i, t in enumerate(
        ["low lower lowest", "new newer newest", "wide wider", "low low new"]
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    char_m = B.train_bpe(docs, n_merges=10, top_words=None)
    byte_m = B.train_bpe(docs, n_merges=10, top_words=None, byte_level=True)
    def unhex(s: str) -> str:
        return bytes.fromhex(s).decode("ascii")
    assert [(unhex(l), unhex(r), c) for l, r, c in byte_m] == char_m
    # and token counts agree per document
    a = {r["doc_id"]: r["n_tokens"] for r in B.attach_bpe_tokens(
        docs, char_m).collect()}
    b = {r["doc_id"]: r["n_tokens"] for r in B.attach_bpe_tokens(
        docs, byte_m, byte_level=True).collect()}
    assert a == b


def test_byte_level_distributed_equals_driver_loop(spark):
    """The distributed trainer honors byte_level identically — including
    multi-byte UTF-8 words, where a char is 2+ byte symbols."""
    rows = [(1, "ação ação ação nação"), (2, "maçã maçã"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    drv = B.train_bpe(docs, n_merges=6, top_words=None, byte_level=True)
    dist = B.train_bpe_distributed(docs, n_merges=6, byte_level=True)
    assert drv == dist and len(drv) == 6


def test_byte_level_multibyte_no_unk():
    """Non-ASCII chars decompose into byte symbols instead of needing an
    UNK: 'ç' (C3 A7) starts as two symbols, and applying its merge
    reassembles it — apply_merges stays lossless at byte level."""
    merges = [("C3", "A7")]
    syms = B.apply_merges("ço", merges, byte_level=True)
    assert syms == ["C3A7", "6F"]
    assert bytes.fromhex("".join(syms)).decode("utf-8") == "ço"
