"""WARC reader/writer + HTML extraction tests (round 8, sources/warc.py)."""

from __future__ import annotations

import pytest

from rpa_etl_spark.sources import warc as W

HTML = (
    b"<html><head><title>Doc 7</title>"
    b'<script>var x = "<p>not text</p>";</script>'
    b"<style>p { color: red }</style></head>"
    b"<body><h1>DOC 7</h1><p>ol\xc3\xa1 &amp; <b>mundo</b> &#233; &#x41;</p>"
    b"<!-- hidden --></body></html>"
)
EXPECT = "Doc 7 DOC 7 olá & mundo é A"


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = [
        ("https://ex.com/doc/7", HTML),
        ("https://ex.com/doc/8", b"<p>oi</p>"),
    ]
    data = W.write_warc(recs, gzip_members=gz)
    assert (data[:2] == b"\x1f\x8b") == gz
    out = W.parse_warc(data)
    assert [r["type"] for r in out] == ["warcinfo", "response", "response"]
    r = out[1]
    assert r["uri"] == "https://ex.com/doc/7"
    assert r["http_status"] == 200
    assert r["http_headers"]["content-type"].startswith("text/html")
    assert r["body"] == HTML  # exact Content-Length framing
    assert W.html_to_text(r["body"].decode("utf-8")) == EXPECT


def test_warc_deterministic():
    recs = [("https://e/doc/1", b"<p>a</p>")]
    assert W.write_warc(recs) == W.write_warc(recs)  # no uuid/wall-clock


def test_warc_binary_payload_with_crlf_inside():
    """Content-Length framing, not delimiter scanning: a body containing
    WARC-looking bytes and blank lines must round-trip verbatim."""
    evil = b"abc\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\nxyz"
    data = W.write_warc([("https://e/doc/2", evil)])
    out = W.parse_warc(data)
    assert out[1]["body"] == evil


def test_html_to_text_corners():
    f = W.html_to_text
    assert f("<p>a</p><p>b</p>") == "a b"  # tags are word boundaries
    assert f("a &lt;tag&gt; &amp;amp; fim") == "a <tag> &amp; fim"
    assert f("<script>while(1){'</b>'}</script>ok") == "ok"
    assert f("<SCRIPT>x</script >y<STYLE a=b>z</style>w") == "y w"
    assert f("&bogus; &#xZZ; kept") == "&bogus; &#xZZ; kept"
    assert f("  a\t\nb  ") == "a b"
    assert f("&#65;&#x42;") == "AB"


def test_truncated_warc_degrades():
    data = W.write_warc([("https://e/doc/3", b"<p>abc</p>" * 50)])
    out = W.parse_warc(data[: len(data) // 2])
    assert isinstance(out, list)  # no raise; partial records dropped


def test_spark_warc_extract(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, i % 2, f"texto <b>{i}</b> & mais") for i in range(8)],
        "doc_id long, bucket int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in W.extract_warc_text(W.synth_warc_archives(docs)).collect()
    }
    assert len(rows) == 8
    for i in range(8):
        r = rows[i]
        # raw corpus text containing markup survives escape→strip→decode
        assert r["extracted"] == f"Doc {i} NOTA {i} texto <b>{i}</b> & mais & fim"
        assert r["gzipped"] == (i % 2 == 1)
        assert r["http_status"] == 200


# ---- round-8 second-review regressions -------------------------------------


def test_non_utf8_bodies_never_fail():
    """Real crawls carry mislabeled/mixed encodings: the charset header
    wins when known, UTF-8 is tried next, latin-1 absorbs the rest —
    decode must NEVER raise (round-8 review)."""
    rec = {
        "body": b"ol\xe1 mundo",  # latin-1 bytes
        "http_headers": {"content-type": "text/html; charset=iso-8859-1"},
    }
    assert W.decode_http_body(rec) == "olá mundo"
    rec["http_headers"] = {"content-type": "text/html"}  # no charset
    assert W.decode_http_body(rec) == "olá mundo"  # utf-8 fails → latin-1
    rec["http_headers"] = {"content-type": "text/html; charset=bogus-enc"}
    assert W.decode_http_body(rec) == "olá mundo"  # unknown codec → fallback
    rec["body"] = "çedilha".encode("utf-8")
    rec["http_headers"] = {}
    assert W.decode_http_body(rec) == "çedilha"


def test_entities_are_case_sensitive():
    f = W.html_to_text
    assert f("&Eacute;rico &eacute;") == "Érico é"
    assert f("&AMP; &amp;") == "& &"
    assert f("&EACUTE;") == "&EACUTE;"  # not a valid name: pass through
    assert f("&#X41;&#x42;") == "AB"  # uppercase hex refs decode too


def test_gzip_trailing_garbage_degrades():
    data = W.write_warc([("https://e/doc/9", b"<p>ok</p>")], gzip_members=True)
    out = W.parse_warc(data + b"NOT GZIP TAIL")
    assert [r["type"] for r in out] == ["warcinfo", "response"]
    assert W.html_to_text(W.decode_http_body(out[1])) == "ok"


def test_parse_warc_zst_roundtrip():
    """Seekable .warc.zst layout: skippable dictionary-slot frame + one
    zstd frame per record, decoded transparently by parse_warc."""
    from rpa_etl_spark.sources import zstd as Z

    plain = W.write_warc([("https://x/doc/1", b"<p>um</p>"),
                          ("https://x/doc/2", b"<p>dois</p>")])
    # frame-per-record split on the WARC/ marker
    recs, at = [], 0
    while True:
        nxt = plain.find(b"WARC/", at + 1)
        if nxt < 0:
            break
        recs.append(plain[at:nxt]); at = nxt
    recs.append(plain[at:])
    blob = Z.skippable_frame(b"dict-slot") + b"".join(
        Z.compress(r, level=19) for r in recs
    )
    out = W.parse_warc(blob)
    assert [r["uri"] for r in out if r["type"] == "response"] == [
        "https://x/doc/1", "https://x/doc/2",
    ]
    assert W.parse_warc(blob[:10]) == []  # truncated: degrade


def test_spark_warc_extract_zst(spark):
    docs = spark.createDataFrame(
        [(i % 6, i, f"texto {i}  com   <markup> & stuff") for i in range(12)],
        "bucket int, doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in W.extract_warc_text_zst(
        W.synth_warc_archives_zst(docs)).collect()}
    assert len(rows) == 12
    for i in range(12):
        r = rows[i]
        assert r["checksummed"] == (i % 6 % 3 == 0)
        assert r["http_status"] == 200
        assert f"texto {i} com <markup> & stuff" in r["extracted"]


def test_warc_zst_truncated_tail_recovers_intact_records():
    """Round-9 review: a transfer-cut .warc.zst keeps the records whose
    frames arrived intact (the gzip-member parity the seekable layout
    exists for) instead of dropping the whole archive."""
    from rpa_etl_spark.sources import zstd as Z

    plain = W.write_warc([("https://x/doc/1", b"<p>um</p>"),
                          ("https://x/doc/2", b"<p>dois</p>")])
    recs, at = [], 0
    while True:
        nxt = plain.find(b"WARC/", at + 1)
        if nxt < 0:
            break
        recs.append(plain[at:nxt]); at = nxt
    recs.append(plain[at:])
    frames = [Z.compress_store(r, checksum=True) for r in recs]
    blob = b"".join(frames)
    cut = blob[: len(blob) - len(frames[-1]) + 3]  # cut the last record
    out = W.parse_warc(cut)
    assert [r["uri"] for r in out if r["type"] == "response"] == [
        "https://x/doc/1",
    ]
