"""WARC (ISO 28500) web-archive source + HTML text extraction (round 8).

Common Crawl — the de-facto LLM training corpus — ships as WARC: records
of HTTP responses, each a header block + payload, optionally gzipped
PER RECORD so members concatenate into one seekable .warc.gz. This module
is a from-scratch reader/writer for that shape:

- ``write_warc`` emits conformant files (warcinfo + response records,
  exact Content-Length framing, deterministic record IDs) in plain or
  member-gzip form — fixtures round-trip the real parse path;
- ``parse_warc`` walks both forms (gzip members are detected by magic and
  split on decompressobj.unused_data — the standard member-concatenation
  trick), parses WARC headers, and splits HTTP payloads into
  status/headers/body;
- ``html_to_text`` is the extraction step a web pipeline runs next:
  drop script/style/comment blocks, strip tags, decode the common +
  numeric entities, collapse whitespace. Deterministic and closed-form
  enough for the DuckDB oracle to reconstruct expected text exactly
  (q_warc_extract).

Spark shape: WARC bytes live in a binary column; parsing + extraction is
one Arrow-batched ``mapInPandas`` fan-out (1 archive row → N record
rows) — narrow, scan-speed at any corpus size, exactly like the
PDF/multimodal kernels.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip framing
    return co.compress(data) + co.flush()


def _record(warc_type: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {warc_type}".encode())
    for k, v in headers.items():
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def write_warc(
    responses: list[tuple[str, bytes]],
    *,
    gzip_members: bool = False,
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """[(target_uri, html_body), ...] → WARC bytes: one warcinfo record,
    then one HTTP-response record per entry. ``gzip_members`` emits each
    record as its own gzip member (the .warc.gz layout). Record IDs are
    deterministic (content-derived) — no uuid/wall-clock, per the repo's
    oracle rules."""
    import hashlib

    info_body = b"software: rpa-etl-spark-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
    out_records = [
        _record(
            "warcinfo",
            {
                "WARC-Record-ID": "<urn:sha1:" + hashlib.sha1(info_body).hexdigest() + ">",
                "WARC-Date": date,
                "Content-Type": "application/warc-fields",
            },
            info_body,
        )
    ]
    for uri, body in responses:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}".encode()
            + b"\r\n\r\n"
            + body
        )
        rid = hashlib.sha1(uri.encode() + body).hexdigest()
        out_records.append(
            _record(
                "response",
                {
                    "WARC-Record-ID": f"<urn:sha1:{rid}>",
                    "WARC-Date": date,
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    if gzip_members:
        return b"".join(_gzip_member(r) for r in out_records)
    return b"".join(out_records)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        try:
            yield d.decompress(rest)
        except zlib.error:
            # trailing garbage / corrupted member (partial transfer):
            # stop at the last good member — degrade, don't fail the task
            return
        rest = d.unused_data


def _parse_plain(data: bytes) -> Iterator[dict]:
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1", "replace").strip()
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        yield {"headers": headers, "payload": body}
        pos = hdr_end + 4 + length
        while data[pos : pos + 2] == _CRLF:  # record separators
            pos += 2


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or member-gzip) → records: each a dict with
    ``type``, ``uri``, ``http_status``, ``http_headers``, ``body``.
    Non-HTTP records (warcinfo etc.) carry their raw payload as body."""
    if data[:2] == b"\x1f\x8b":
        chunks = b"".join(_split_gzip_members(data))
    else:
        from rpa_etl_spark.sources import zstd as _zstd

        if _zstd.is_zstd(data):
            # .warc.zst: per-record zstd frames (the seekable-WARC
            # convention, minus its optional dictionary — carried in a
            # leading skippable frame, which the decoder skips). A
            # transfer-cut tail frame degrades to the records that
            # arrived intact, like the gzip-member path
            try:
                chunks, _ = _zstd.decompress_with_info(data, tolerant=True)
            except ValueError:
                return []
        else:
            chunks = data
    out: list[dict] = []
    for rec in _parse_plain(chunks):
        h = rec["headers"]
        item = {
            "type": h.get("warc-type", ""),
            "uri": h.get("warc-target-uri", ""),
            "http_status": None,
            "http_headers": {},
            "body": rec["payload"],
        }
        ctype = h.get("content-type", "")
        if ctype.startswith("application/http"):
            split = rec["payload"].find(b"\r\n\r\n")
            if split >= 0:
                head, body = rec["payload"][:split], rec["payload"][split + 4 :]
                lines = head.split(_CRLF)
                m = re.match(rb"HTTP/\d\.\d (\d{3})", lines[0])
                if m:
                    item["http_status"] = int(m.group(1))
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    item["http_headers"][k.decode("latin-1").strip().lower()] = (
                        v.decode("latin-1", "replace").strip()
                    )
                item["body"] = body
        out.append(item)
    return out


_CHARSET_RE = re.compile(r"charset=([A-Za-z0-9_.-]+)")


def decode_http_body(rec: dict) -> str:
    """Record body → str: honor the Content-Type charset when it names a
    codec Python knows, else try UTF-8, else latin-1 (which never fails).
    Real crawls are full of mislabeled and mixed encodings — a decode
    must NEVER fail the Spark task (round-8 review)."""
    body = rec["body"]
    ctype = rec.get("http_headers", {}).get("content-type", "")
    m = _CHARSET_RE.search(ctype)
    if m:
        try:
            return body.decode(m.group(1), errors="replace")
        except LookupError:
            pass  # unknown codec name → fall through
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
# named references are CASE-SENSITIVE in HTML (&Eacute; ≠ &eacute;) —
# the table carries both cases explicitly; unknown names pass through
# verbatim rather than being case-folded into the wrong glyph
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "AMP": "&", "LT": "<", "GT": ">", "QUOT": '"',  # HTML5 allows these
    "nbsp": " ", "aacute": "á", "eacute": "é", "iacute": "í",
    "oacute": "ó", "uacute": "ú", "atilde": "ã", "otilde": "õ",
    "ccedil": "ç", "agrave": "à", "acirc": "â", "ecirc": "ê",
    "ocirc": "ô",
    "Aacute": "Á", "Eacute": "É", "Iacute": "Í", "Oacute": "Ó",
    "Uacute": "Ú", "Atilde": "Ã", "Otilde": "Õ", "Ccedil": "Ç",
    "Agrave": "À", "Acirc": "Â", "Ecirc": "Ê", "Ocirc": "Ô",
}
_ENT_RE = re.compile(r"&(#[xX][0-9A-Fa-f]+|#[0-9]+|[A-Za-z]+);")


def _entity(m: re.Match) -> str:
    t = m.group(1)
    if t[:2] in ("#x", "#X"):
        try:
            return chr(int(t[2:], 16))
        except ValueError:
            return m.group(0)
    if t.startswith("#"):
        try:
            return chr(int(t[1:]))
        except ValueError:
            return m.group(0)
    return _ENTITIES.get(t, m.group(0))


def html_to_text(html: str) -> str:
    """Deterministic tag-stripping extraction: script/style/comment blocks
    drop entirely, every other tag becomes a space (block boundaries must
    separate words), entities decode (named subset + numeric), whitespace
    collapses to single spaces, ends trimmed."""
    s = _SCRIPT_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENT_RE.sub(_entity, s)
    return _WS_RE.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _doc_responses(pdf) -> list[tuple[str, bytes]]:
    """The shared per-bucket fixture construction BOTH warc synths use:
    each member document becomes an HTTP response whose HTML embeds the
    doc's whitespace-collapsed prefix, HTML-escaped. TWO DuckDB oracles
    (q_warc_extract, q_warc_extract_zst) state this construction's
    inverse, so it must exist exactly once (round-9 review)."""
    responses = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        doc_id = int(doc_id)
        prefix = _WS_RE.sub(" ", str(text)[:64]).strip()
        esc = (
            prefix.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        html = (
            f"<html><head><title>Doc {doc_id}</title>"
            f'<script>var x = "<p>not text</p>";</script></head>'
            f"<body><h1>NOTA {doc_id}</h1>"
            f"<p>{esc} &amp; fim</p><!-- crawler --></body></html>"
        )
        responses.append(
            (f"https://corpus.example/doc/{doc_id}", html.encode("utf-8"))
        )
    return responses


def synth_warc_archives(docs) -> "DataFrame":  # noqa: F821 — forward ref
    """One WARC archive per ``bucket`` group (the multi-record file shape
    real crawls have): each member document becomes an HTTP-response
    record whose HTML body embeds the doc's whitespace-collapsed prefix,
    HTML-escaped so arbitrary corpus text round-trips the entity decoder.
    Odd buckets write member-gzip (.warc.gz layout), even buckets plain —
    both parse paths rotate. groupBy→applyInPandas over fixture-sized
    groups (same corpus-size-independent shape as the AES-256 fixture)."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("content", BinaryType()),
            StructField("length", LongType()),
        ]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        content = write_warc(_doc_responses(pdf), gzip_members=bucket % 2 == 1)
        return pd.DataFrame(
            [
                {
                    "path": f"synth://warc/{bucket}.warc"
                    + (".gz" if bucket % 2 == 1 else ""),
                    "content": content,
                    "length": len(content),
                }
            ],
            columns=["path", "content", "length"],
        )

    return (
        docs.select("bucket", "doc_id", "text")
        .groupBy("bucket")
        .applyInPandas(build, schema=schema)
    )


def extract_warc_text(archives) -> "DataFrame":  # noqa: F821
    """WARC archives → one row per HTTP-response record with the
    HTML-extracted text (1 archive row → N record rows inside one Arrow
    batch — no shuffle; at crawl scale this runs at scan speed)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("uri", StringType()),
            StructField("gzipped", BooleanType()),
            StructField("http_status", IntegerType()),
            StructField("extracted", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, uris, gzs, sts, texts, ns = [], [], [], [], [], []
            for payload in pdf["content"]:
                raw = bytes(payload)
                gz = raw[:2] == b"\x1f\x8b"
                for rec in parse_warc(raw):
                    if rec["type"] != "response":
                        continue
                    m = re.search(r"/doc/(\d+)$", rec["uri"])
                    text = html_to_text(decode_http_body(rec))
                    ids.append(int(m.group(1)) if m else -1)
                    uris.append(rec["uri"])
                    gzs.append(gz)
                    sts.append(rec["http_status"])
                    texts.append(text)
                    ns.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "uri": uris,
                    "gzipped": gzs,
                    "http_status": sts,
                    "extracted": texts,
                    "n_chars": ns,
                }
            )

    return archives.select("content").mapInPandas(kernel, schema=schema)


def synth_warc_archives_zst(docs) -> "DataFrame":  # noqa: F821
    """``.warc.zst`` fixtures in the seekable-WARC layout Common Crawl
    ships: a leading SKIPPABLE frame (the dictionary slot — empty here;
    frames are dictionary-less) followed by one zstd frame PER RECORD,
    so readers can seek to any record boundary. Codec rotates on
    bucket % 3: 0 → from-scratch store frames WITH XXH64 checksums,
    1 → reference level 3, 2 → reference level 19."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from rpa_etl_spark.sources import zstd as _zstd

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("content", BinaryType()),
            StructField("length", LongType()),
        ]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        plain = write_warc(_doc_responses(pdf))
        # split back into per-record chunks on the WARC/ record marker so
        # each record gets its own frame (every chunk starts with WARC/)
        marks = []
        at = 0
        while True:
            nxt = plain.find(b"WARC/", at + 1)
            if nxt < 0:
                break
            marks.append(nxt)
            at = nxt
        records = [
            plain[a:b] for a, b in zip([0] + marks, marks + [len(plain)])
        ]
        mode = bucket % 3
        if mode == 0:
            frames = [_zstd.compress_store(r, checksum=True) for r in records]
        else:
            lvl = 3 if mode == 1 else 19
            frames = [_zstd.compress(r, level=lvl) for r in records]
        content = _zstd.skippable_frame(b"") + b"".join(frames)
        return pd.DataFrame(
            [
                {
                    "path": f"synth://warc/{bucket}.warc.zst",
                    "content": content,
                    "length": len(content),
                }
            ],
            columns=["path", "content", "length"],
        )

    return (
        docs.select("bucket", "doc_id", "text")
        .groupBy("bucket")
        .applyInPandas(build, schema=schema)
    )


def extract_warc_text_zst(archives) -> "DataFrame":  # noqa: F821
    """``.warc.zst`` → one row per HTTP-response record with the HTML
    -extracted text. ``checksummed`` reports whether every content frame
    carried a VERIFIED XXH64 checksum (detected from frame headers).
    Same no-shuffle Arrow fan-out as the gzip WARC kernel."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from rpa_etl_spark.sources import zstd as _zstd

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("uri", StringType()),
            StructField("checksummed", BooleanType()),
            StructField("http_status", IntegerType()),
            StructField("extracted", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, uris, cks, sts, texts, ns = [], [], [], [], [], []
            for payload in pdf["content"]:
                raw = bytes(payload)
                if not _zstd.is_zstd(raw):
                    continue
                try:
                    plain, info = _zstd.decompress_with_info(raw, tolerant=True)
                except ValueError:
                    continue  # nothing decodable at all: skip the archive
                for rec in parse_warc(plain):
                    if rec["type"] != "response":
                        continue
                    m = re.search(r"/doc/(\d+)$", rec["uri"])
                    text = html_to_text(decode_http_body(rec))
                    ids.append(int(m.group(1)) if m else -1)
                    uris.append(rec["uri"])
                    cks.append(info["all_checksummed"])
                    sts.append(rec["http_status"])
                    texts.append(text)
                    ns.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "uri": uris,
                    "checksummed": cks,
                    "http_status": sts,
                    "extracted": texts,
                    "n_chars": ns,
                }
            )

    return archives.select("content").mapInPandas(kernel, schema=schema)
