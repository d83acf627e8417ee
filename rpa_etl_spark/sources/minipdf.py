"""Minimal pure-stdlib PDF text extractor (the S1/S2 decode kernel).

The reference extracts per-page text with PyMuPDF (robot/pdf_reader.py:23-94).
That library is not available in this container, so this module implements
the common-case subset of the (public) PDF file format directly:

- unencrypted PDFs;
- content streams stored uncompressed or with ``FlateDecode`` (zlib);
- objects inside ``/Type /ObjStm`` object streams (PDF 1.5+) are expanded;
- text via the standard content-stream operators: ``Tj``, ``'``, ``"``,
  ``TJ`` (array form with kerning), with ``Td``/``TD``/``T*`` treated as
  line breaks;
- literal ``(...)`` strings (including escape sequences and nested
  parentheses) and hex ``<...>`` strings;
- simple one-byte font encodings decoded as Latin-1 (WinAnsi-compatible
  for the printable range). Composite/CID (2-byte) fonts, encryption, and
  non-Flate filters (DCT, LZW, ...) are out of scope — such streams simply
  contribute no text, they never raise.

This is a best-effort extractor for machine-generated text PDFs (exactly
the reference's input class: NFS-e invoices). It is deterministic: same
bytes in, same text out.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")
_ANY_FILTER_RE = re.compile(rb"/Filter\b")

# content-stream text operators; see PDF 32000-1:2008 §9.4
_TEXT_OP_RE = re.compile(
    rb"""
    \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<litop>Tj|'|")      # (string) Tj / ' / "
  | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hexop>Tj|'|")          # <hex> Tj
  | \[(?P<arr>(?:\\.|\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ
  | (?P<nl>T\*|TD|Td)                                      # line motion
    """,
    re.S | re.X,
)
_ARR_ITEM_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>|(?P<num>-?\d+(?:\.\d+)?)"
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    """Resolve PDF literal-string escapes: \\n-style, \\ooo octal, and
    escaped line continuations."""
    out, i, n = bytearray(), 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt and nxt in b"01234567":
            j = 0
            while j < 3 and raw[i + 1 + j : i + 2 + j] and raw[i + 1 + j] in b"01234567":
                j += 1
            out.append(int(raw[i + 1 : i + 1 + j], 8) & 0xFF)
            i += 1 + j
        elif nxt in (b"\n", b"\r"):  # escaped newline = continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _decode_hex(raw: bytes) -> bytes:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _stream_text(stream: bytes) -> str:
    """Extract show-text operators from one decoded content stream."""
    pieces: list[bytes] = []
    for m in _TEXT_OP_RE.finditer(stream):
        if m.group("lit") is not None:
            if m.group("litop") in (b"'", b'"'):
                pieces.append(b"\n")
            pieces.append(_unescape_literal(m.group("lit")))
        elif m.group("hex") is not None:
            if m.group("hexop") in (b"'", b'"'):
                pieces.append(b"\n")
            pieces.append(_decode_hex(m.group("hex")))
        elif m.group("arr") is not None:
            for it in _ARR_ITEM_RE.finditer(m.group("arr")):
                if it.group("lit") is not None:
                    pieces.append(_unescape_literal(it.group("lit")))
                elif it.group("hex") is not None:
                    pieces.append(_decode_hex(it.group("hex")))
                elif float(it.group("num")) < -150:
                    # large negative kerning ≈ inter-word gap
                    pieces.append(b" ")
        elif m.group("nl") is not None:
            pieces.append(b"\n")
    text = b"".join(pieces).decode("latin-1", errors="ignore")
    # collapse the newline bursts Td/TD motion produces around each show op
    return re.sub(r"\n{2,}", "\n", text).strip("\n")


def _inflate(data: bytes) -> bytes | None:
    try:
        return zlib.decompress(data)
    except zlib.error:
        # tolerate trailing garbage after the deflate body
        try:
            d = zlib.decompressobj()
            return d.decompress(data)
        except zlib.error:
            return None


def _decode_stream(obj_body: bytes) -> bytes | None:
    """Return the decoded stream bytes of an object, or None when absent /
    undecodable (non-Flate filter, bad deflate data)."""
    sm = _STREAM_RE.search(obj_body)
    if not sm:
        return None
    data = sm.group(1)
    head = obj_body[: sm.start()]
    if _FLATE_RE.search(head):
        return _inflate(data)
    if _ANY_FILTER_RE.search(head):
        return None  # unsupported filter
    return data


def _expand_objects(content: bytes) -> list[bytes]:
    """All object bodies: top-level ``N G obj ... endobj`` plus the objects
    packed inside /Type /ObjStm streams (decompressed and split using the
    offset table in the stream header)."""
    bodies: list[bytes] = []
    for m in _OBJ_RE.finditer(content):
        body = m.group(3)
        bodies.append(body)
        if _OBJSTM_RE.search(body):
            decoded = _decode_stream(body)
            if decoded is None:
                continue
            nm = re.search(rb"/N\s+(\d+)", body)
            fm = re.search(rb"/First\s+(\d+)", body)
            if not (nm and fm):
                continue
            n, first = int(nm.group(1)), int(fm.group(1))
            header = decoded[:first].split()
            offsets = [int(x) for x in header[1 : 2 * n : 2]]
            offsets.append(len(decoded) - first)
            for a, b in zip(offsets, offsets[1:]):
                bodies.append(decoded[first + a : first + b])
    return bodies


def extract_text(content: bytes) -> tuple[str, int]:
    """Best-effort (text, page_count) from raw PDF bytes.

    Never raises on malformed input: undecodable streams are skipped and a
    PDF with no extractable text yields ``("", 1)``.
    """
    bodies = _expand_objects(content)
    pages = 0
    texts: list[str] = []
    for body in bodies:
        pages += len(_PAGE_RE.findall(body[:2000]))
        decoded = _decode_stream(body)
        if decoded is None:
            continue
        # treat any stream containing text-block markers as a content stream
        if b"BT" in decoded and b"ET" in decoded:
            t = _stream_text(decoded)
            if t:
                texts.append(t)
    return "\n".join(texts), max(pages, 1)


def write_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Minimal spec-conformant PDF WRITER (catalog → pages → one content
    stream per page, each line shown with ``Tj``/``T*``; streams
    FlateDecode-compressed when ``compress``). Independent of the extractor
    above — it emits standard PDF 1.4 structures, so round-tripping
    write→extract exercises the real parse path, and the unit tests in
    tests/test_pdf_source.py additionally pin the extractor against
    hand-built hex/TJ/ObjStm/escape fixtures the writer never produces.
    Used by the fixture layer and by the declared q_pdf_extract query."""

    def esc(s: str) -> str:
        # control chars must use PDF escape sequences — a raw newline inside
        # a literal string would be merged with Td/T* line breaks by the
        # extractor's newline collapse, breaking write→extract round-trips
        out = (
            s.replace("\\", r"\\")
            .replace("(", r"\(")
            .replace(")", r"\)")
            .replace("\n", r"\n")
            .replace("\r", r"\r")
            .replace("\t", r"\t")
            .replace("\x08", r"\b")
            .replace("\x0c", r"\f")
        )
        # any remaining control char gets a 3-digit octal escape — nothing
        # below 0x20 may reach a literal string raw (ADVICE round 5)
        return "".join(
            ch if ord(ch) >= 0x20 else "\\%03o" % ord(ch) for ch in out
        )

    objects: list[bytes] = []
    n_pages = len(pages)
    kid_ids = [3 + 2 * i for i in range(n_pages)]
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    kids = " ".join(f"{k} 0 R" for k in kid_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    font_id = 3 + 2 * n_pages
    for i, lines in enumerate(pages):
        content_id = kid_ids[i] + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_id} 0 R "
                f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>"
            ).encode()
        )
        shows = " T* ".join(f"({esc(ln)}) Tj" for ln in lines)
        stream = f"BT /F1 12 Tf 72 720 Td {shows} ET".encode("latin-1")
        if compress:
            data = zlib.compress(stream)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = stream
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
