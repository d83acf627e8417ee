"""Avro object-container source (round 8) — the data-lake interchange
format (Kafka archives, warehouse exports) alongside the tar/zip/WARC
corpus containers.

From-scratch implementation of the Avro 1.x container spec on stdlib
zlib:

- wire primitives: ZIGZAG VARINT longs (the KATs 0→00, -1→01, 1→02,
  -2→03, 64→8001 are test-pinned), length-prefixed strings/bytes,
  little-endian IEEE doubles, 1-byte booleans, union branch indexes;
- ``write_avro``: header (magic ``Obj\\x01`` + metadata map carrying the
  JSON schema and codec + 16-byte content-derived sync marker),
  record blocks (count + byte length + payload + sync), codecs
  ``null``, ``deflate`` (raw -15 wbits per spec), ``snappy`` (block +
  BIG-endian CRC32 of the uncompressed payload, via the from-scratch
  sources/snappy.py), and ``zstandard`` (plain frames via the
  from-scratch sources/zstd.py);
- ``parse_avro``: header walk, per-block sync-marker VERIFICATION (a
  desynced or truncated block ends the walk — degrade, don't raise),
  and a schema-driven record decoder for the flat-record subset corpus
  rows use: null/boolean/int/long/double/string/bytes fields and
  ``[null, X]`` unions.

Spark shape identical to the other containers: archive bytes in a
binary column → one Arrow-batched ``mapInPandas`` fan-out.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        if pos >= len(data):
            raise ValueError("avro: varint runs past end of data")
        b = data[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (z >> 1) ^ -(z & 1), pos


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


# ---------------------------------------------------------------------------
# schema-driven record codec (flat-record subset)
# ---------------------------------------------------------------------------

_PRIMS = {"null", "boolean", "int", "long", "double", "string", "bytes"}


def _check_schema(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("avro: only record schemas are supported")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"avro: only [null, X] unions supported: {t}")
        elif t not in _PRIMS:
            raise ValueError(f"avro: unsupported field type {t!r}")
        fields.append((f["name"], t))
    return fields


def _enc_value(t: object, v: object) -> bytes:
    if isinstance(t, list):  # [null, X] union: branch index then value
        if v is None:
            return zigzag_encode(t.index("null"))
        other = t[1 - t.index("null")]
        return zigzag_encode(1 - t.index("null")) + _enc_value(other, v)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return zigzag_encode(int(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        return _enc_str(str(v))
    if t == "bytes":
        return _enc_bytes(bytes(v))
    raise ValueError(f"avro: unsupported type {t!r}")


def _dec_value(t: object, data: bytes, pos: int) -> tuple[object, int]:
    if isinstance(t, list):
        idx, pos = zigzag_decode(data, pos)
        branch = t[idx]
        if branch == "null":
            return None, pos
        return _dec_value(branch, data, pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        return data[pos] != 0, pos + 1
    if t in ("int", "long"):
        return zigzag_decode(data, pos)
    if t == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("avro: string/bytes length out of range")
        raw = data[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    raise ValueError(f"avro: unsupported type {t!r}")


# ---------------------------------------------------------------------------
# container writer / reader
# ---------------------------------------------------------------------------


def write_avro(
    schema: dict,
    records: list[dict],
    *,
    codec: str = "null",
    block_records: int = 64,
) -> bytes:
    """Avro object-container bytes for flat records under ``schema``.
    ``codec``: 'null', 'deflate' (raw zlib per spec), or 'snappy'
    (block + BE CRC32). The 16-byte sync marker is content-derived —
    deterministic, no uuid/wall-clock."""
    import hashlib

    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    fields = _check_schema(schema)
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode() + str(len(records)).encode()).digest()
    out = bytearray(_MAGIC)
    # metadata map: one block of 2 entries, then end-of-map count 0
    out += zigzag_encode(2)
    out += _enc_str("avro.schema") + _enc_str(schema_json)
    out += _enc_str("avro.codec") + _enc_str(codec)
    out += zigzag_encode(0)
    out += sync
    for at in range(0, len(records), block_records):
        block = records[at : at + block_records]
        payload = bytearray()
        for rec in block:
            for name, t in fields:
                payload += _enc_value(t, rec.get(name))
        data = bytes(payload)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        elif codec == "snappy":
            # spec: snappy block followed by the BIG-endian CRC32 of
            # the UNCOMPRESSED block payload
            from rpa_etl_spark.sources import snappy as _snappy

            data = _snappy.compress(data) + zlib.crc32(data).to_bytes(
                4, "big"
            )
        elif codec == "zstandard":
            # spec: plain zstd frame(s), no extra checksum (zstd's own
            # optional XXH64 covers integrity)
            from rpa_etl_spark.sources import zstd as _zstd

            data = _zstd.compress(data, level=3)
        out += zigzag_encode(len(block))
        out += zigzag_encode(len(data))
        out += data
        out += sync
    return bytes(out)


def parse_avro(data: bytes) -> tuple[dict, str, list[dict]]:
    """Avro container bytes → (schema, codec, records). Per-block sync markers
    are VERIFIED; a truncated, desynced, or undecodable block ends the
    walk with the records that arrived intact (degrade, don't raise).
    Raises ValueError only when the HEADER is not an Avro container."""
    if data[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = zigzag_decode(data, pos)
        if count == 0:
            break
        if count < 0:  # block form: a byte size precedes the entries
            count = -count
            _, pos = zigzag_decode(data, pos)
        for _ in range(count):
            klen, pos = zigzag_decode(data, pos)
            if klen < 0 or pos + klen > len(data):
                raise ValueError("avro: metadata key length out of range")
            key = data[pos : pos + klen].decode("utf-8", "replace")
            pos += klen
            vlen, pos = zigzag_decode(data, pos)
            if vlen < 0 or pos + vlen > len(data):
                raise ValueError("avro: metadata value length out of range")
            meta[key] = data[pos : pos + vlen]
            pos += vlen
    if "avro.schema" not in meta:
        raise ValueError("avro: container metadata lacks avro.schema")
    try:
        schema = json.loads(meta["avro.schema"])
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        raise ValueError(f"avro: undecodable schema metadata: {e}") from e
    codec = meta.get("avro.codec", b"null").decode("utf-8", "replace")
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    fields = _check_schema(schema)
    sync = data[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        try:
            n_rec, p = zigzag_decode(data, pos)
            n_bytes, p = zigzag_decode(data, p)
        except ValueError:
            break
        if n_rec < 0 or n_bytes < 0 or p + n_bytes + 16 > len(data):
            break  # truncated block
        if data[p + n_bytes : p + n_bytes + 16] != sync:
            break  # desynced: never emit records from a misframed block
        payload = data[p : p + n_bytes]
        if codec == "deflate":
            try:
                payload = zlib.decompressobj(-15).decompress(payload)
            except zlib.error:
                break
        elif codec == "snappy":
            from rpa_etl_spark.sources import snappy as _snappy

            if len(payload) < 4:
                break
            body, want = payload[:-4], payload[-4:]
            try:
                payload = _snappy.decompress(body)
            except ValueError:
                break
            if zlib.crc32(payload).to_bytes(4, "big") != want:
                break  # CRC mismatch: drop the block, never emit wrong
        elif codec == "zstandard":
            from rpa_etl_spark.sources import zstd as _zstd

            try:
                payload = _zstd.decompress(payload)
            except ValueError:
                break
        try:
            bp = 0
            block_out = []
            for _ in range(n_rec):
                rec = {}
                for name, t in fields:
                    rec[name], bp = _dec_value(t, payload, bp)
                block_out.append(rec)
        except (ValueError, IndexError, struct.error):
            break  # corrupt payload: drop the whole block
        records.extend(block_out)
        pos = p + n_bytes + 16
    return schema, codec, records


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_DOC_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
    ],
}


def synth_avro_archives(docs) -> "DataFrame":  # noqa: F821
    """One Avro container per ``bucket`` group holding (doc_id, text)
    records — the codec rotates on bucket % 4 (null / deflate / snappy
    / zstandard) so every block path flows through the driver-checked
    query."""
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    ws = _re.compile(r"[ \t\n\r\f\v]+")
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
        records = [
            {
                "doc_id": int(doc_id),
                "text": ws.sub(" ", str(text)[:64]).strip(),
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"])
        ]
        content = write_avro(
            _DOC_SCHEMA, records,
            codec=("null", "deflate", "snappy", "zstandard")[bucket % 4],
        )
        return pd.DataFrame(
            [
                {
                    "path": f"synth://avro/{bucket}.avro",
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


def extract_avro_records(archives) -> "DataFrame":  # noqa: F821
    """Avro containers → one row per record (fan-out inside the Arrow
    batch — no shuffle)."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("codec", StringType()),
            StructField("text", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, codecs, texts, ns = [], [], [], []
            for payload in pdf["content"]:
                # codec comes from the container's own metadata — never
                # sniffed from raw bytes (the zip-review lesson). A corrupt
                # container (bad magic, truncated header, undecodable
                # schema) is SKIPPED like the tar/zip/warc kernels degrade
                # — it must never kill the Spark task (round-8 advice)
                try:
                    _, codec, records = parse_avro(bytes(payload))
                except ValueError:
                    continue
                for rec in records:
                    ids.append(rec["doc_id"])
                    codecs.append(codec)
                    texts.append(rec["text"])
                    ns.append(len(rec["text"]) if rec["text"] is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "codec": codecs,
                    "text": texts,
                    "n_chars": ns,
                }
            )

    return archives.select("content").mapInPandas(kernel, schema=schema)
