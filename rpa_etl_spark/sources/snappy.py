"""Snappy block format, from scratch (round 9).

Snappy is the de-facto codec of the data-lake interchange layer — the
default for parquet files and the most common Avro container codec in
the wild (Kafka archive dumps, warehouse exports). The round-8 Avro
source supported null/deflate only; this module closes that gap with a
complete implementation of the public block format
(google/snappy format_description.txt):

- decoder: uvarint uncompressed-length header, then the element stream —
  literals (1-byte tag lengths plus the 60/61/62/63 extended-length
  forms) and the three copy forms (tag-embedded 11-bit offset,
  2-byte LE offset, 4-byte LE offset), with overlapping copies given
  RLE-expansion semantics like LZ77 requires;
- encoder: ``compress_literal`` emits the always-valid literal-only
  stream (every byte range is expressible as literals — the same
  zero-dependency fixture story as zstd's store frames), while
  ``compress`` prefers the real reference encoder exposed through
  pyarrow so fixtures exercise genuine copy elements.

Conformance is pinned both directions against pyarrow's bundled
reference snappy in tests/test_snappy.py.

Corrupt input raises ValueError only (the container kernels' degrade
contract).
"""

from __future__ import annotations


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated uvarint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: uvarint too long")


def decompress(data: bytes) -> bytes:
    """Snappy block → raw bytes; ValueError on any corruption."""
    n, pos = _uvarint(data, 0)
    if n >= (1 << 32):  # format caps the length uvarint at 2^32 - 1
        raise ValueError("snappy: implausible uncompressed length")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:  # 61..64 → 1..4 extra LE length bytes
                extra = ln - 60
                if pos + extra > len(data):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + ln > len(data):
                raise ValueError("snappy: truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 11-bit offset in tag + 1 byte
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= len(data):
                raise ValueError("snappy: truncated 1-byte-offset copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("snappy: truncated 2-byte-offset copy")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte LE offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("snappy: truncated 4-byte-offset copy")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        if off >= ln:  # non-overlapping fast path
            start = len(out) - off
            out += out[start : start + ln]
        else:
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != n:
        raise ValueError(
            f"snappy: length mismatch ({len(out)} != declared {n})"
        )
    return bytes(out)


def _uvarint_enc(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def compress_literal(data: bytes) -> bytes:
    """Always-valid literal-only snappy stream (no copies) — the
    zero-dependency fixture path."""
    out = bytearray(_uvarint_enc(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            out.append(62 << 2)  # 3 extended length bytes
            out += ln.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    if not data:
        pass  # header alone: uvarint 0, zero elements
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Reference-encoded snappy via pyarrow when importable (real copy
    elements flow through the decoder), else the literal-only stream."""
    try:
        import pyarrow as pa
    except ImportError:
        return compress_literal(data)
    return bytes(pa.Codec("snappy").compress(data))
