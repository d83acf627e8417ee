"""Avro object-container tests (round 8, sources/avro_src.py)."""

from __future__ import annotations

import pytest

from rpa_etl_spark.sources import avro_src as A

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}
RECS = [
    {
        "doc_id": i * 7 - 3,
        "text": None if i == 2 else f"texto {i} ção",
        "score": i * 0.5,
        "ok": i % 2 == 0,
        "raw": bytes([i] * i),
    }
    for i in range(10)
]


def test_zigzag_known_answers():
    """The Avro spec's varint examples — the wire format's ground truth
    (a sign or shift slip breaks these immediately)."""
    kats = {
        0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
        64: b"\x80\x01", -64: b"\x7f", -65: b"\x81\x01",
    }
    for n, enc in kats.items():
        assert A.zigzag_encode(n) == enc
        assert A.zigzag_decode(enc, 0) == (n, len(enc))
    big = 2**62 - 7
    assert A.zigzag_decode(A.zigzag_encode(big), 0)[0] == big
    assert A.zigzag_decode(A.zigzag_encode(-big), 0)[0] == -big


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_multiblock_unions(codec):
    data = A.write_avro(SCHEMA, RECS, codec=codec, block_records=3)
    schema, got_codec, out = A.parse_avro(data)
    assert schema == SCHEMA and got_codec == codec and out == RECS
    assert data == A.write_avro(SCHEMA, RECS, codec=codec, block_records=3)


def test_truncation_and_desync_degrade():
    data = A.write_avro(SCHEMA, RECS, block_records=3)
    _, _, cut = A.parse_avro(data[:-20])  # cut inside the final block
    assert 0 < len(cut) < 10 and cut == RECS[: len(cut)]
    bad = bytearray(data)
    bad[-10] ^= 0xFF  # corrupt the final sync marker
    _, _, out = A.parse_avro(bytes(bad))
    assert out == RECS[: len(out)] and len(out) < 10
    with pytest.raises(ValueError):
        A.parse_avro(b"not avro")


def test_unsupported_schema_rejected():
    with pytest.raises(ValueError):
        A.write_avro({"type": "record", "name": "x",
                      "fields": [{"name": "m", "type": "map"}]}, [])
    with pytest.raises(ValueError):
        A.write_avro(SCHEMA, [], codec="lz4")


def test_spark_avro_extract(spark):
    rows = {
        r["doc_id"]: r
        for r in A.extract_avro_records(
            A.synth_avro_archives(
                spark.createDataFrame(
                    [(i, i % 4, f"texto {i}  com   espaços") for i in range(8)],
                    "doc_id long, bucket int, text string",
                )
            )
        ).collect()
    }
    assert len(rows) == 8
    for i in range(8):
        r = rows[i]
        assert r["text"] == f"texto {i} com espaços"
        assert r["codec"] == ("null", "deflate", "snappy", "zstandard")[i % 4]
        assert r["n_chars"] == len(r["text"])


def test_corrupt_header_degrades(spark):
    """Round-8 advice: a corrupt container (bad magic / truncated header
    metadata / undecodable schema) must be SKIPPED by the Spark kernel
    like the tar/zip/warc kernels degrade, never kill the task."""
    good = A.write_avro(SCHEMA, RECS[:2])
    for bad in (
        b"Obj\x01\x03",  # header varint runs past end
        b"Obj\x01" + b"\x02" + b"\xff" * 6,  # metadata key length insane
        good[:6],  # truncated mid-metadata
        b"Obj\x01\x02\x16avro.schema\x08not}{\x00" + b"\x00" * 16,  # bad JSON
    ):
        with pytest.raises(ValueError):
            A.parse_avro(bad)
    import pandas as pd

    arch = spark.createDataFrame(
        pd.DataFrame({"content": [good, b"Obj\x01\x03", b"nope"]})
    )
    out = A.extract_avro_records(arch).collect()
    assert len(out) == 2  # corrupt containers skipped, good one intact


def test_zstandard_codec_roundtrip():
    data = A.write_avro(SCHEMA, RECS, codec="zstandard", block_records=3)
    _, codec, out = A.parse_avro(data)
    assert codec == "zstandard" and out == RECS
    _, _, cut = A.parse_avro(data[:-20])  # truncated final block degrades
    assert cut == RECS[: len(cut)]


def test_snappy_codec_roundtrip_and_crc():
    """Avro snappy blocks: payload + BIG-endian CRC32 of the
    UNCOMPRESSED data; a CRC mismatch drops the block (never emits
    wrong records)."""
    import zlib

    data = A.write_avro(SCHEMA, RECS, codec="snappy", block_records=3)
    _, codec, out = A.parse_avro(data)
    assert codec == "snappy" and out == RECS
    # flip a payload byte INSIDE the first snappy block: CRC must catch it
    # (find the block payload start: header ends after sync marker)
    bad = bytearray(data)
    # corrupt near the end of the first block's compressed body
    sync = data[-16:]
    first_sync_end = data.find(sync, 4) + 16
    bad[first_sync_end + 10] ^= 0x01
    _, _, out2 = A.parse_avro(bytes(bad))
    assert out2 == [] or out2 == RECS[: len(out2)]  # degraded, never wrong
    for rec in out2:
        assert rec in RECS
