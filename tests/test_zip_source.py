"""ZIP source tests (round 8, sources/zipfile_src.py)."""

from __future__ import annotations

import io
import zipfile as Z

import pytest

from rpa_etl_spark.sources import zipfile_src as ZS

MEMBERS = [
    ("corpus/doc_1.txt", b"ola mundo"),
    ("a/b/doc_2.txt", b"x" * 5000),
    ("doc_3.txt", b""),
]


@pytest.mark.parametrize("deflate", [False, True])
def test_roundtrip_and_stdlib_cross_conformance(deflate):
    data = ZS.write_zip(MEMBERS, deflate=deflate)
    assert [(m["name"], m["content"]) for m in ZS.parse_zip(data)] == MEMBERS
    zf = Z.ZipFile(io.BytesIO(data))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS
    assert zf.testzip() is None  # stdlib verifies our CRCs too


def test_parses_stdlib_written_with_directories():
    buf = io.BytesIO()
    with Z.ZipFile(buf, "w", compression=Z.ZIP_DEFLATED) as zf:
        zf.writestr("d/", "")
        for n, c in MEMBERS:
            zf.writestr(n, c)
    got = [(m["name"], m["content"]) for m in ZS.parse_zip(buf.getvalue())]
    assert got == MEMBERS  # directory entries skipped


def test_self_extractor_prefix_tolerated():
    """EOCD offsets are archive-relative: a byte prefix (SFX stub) must
    not shift member resolution — the central-directory-first walk
    rebases on the EOCD position."""
    data = ZS.write_zip(MEMBERS)
    got = [(m["name"], m["content"]) for m in ZS.parse_zip(b"SFX-STUB" + data)]
    assert got == MEMBERS


def test_crc_verification_drops_corrupt_member():
    data = ZS.write_zip(MEMBERS[:2], deflate=False)
    bad = bytearray(data)
    bad[48] ^= 0xFF  # inside the first member's stored payload
    names = [m["name"] for m in ZS.parse_zip(bytes(bad))]
    assert names == ["a/b/doc_2.txt"]  # corrupt member dropped, rest kept


def test_truncation_and_garbage_degrade():
    data = ZS.write_zip(MEMBERS)
    assert ZS.parse_zip(data[:50]) == []  # no EOCD at all
    assert ZS.parse_zip(b"not a zip") == []


def test_spark_zip_extract(spark):
    rows = {
        r["doc_id"]: r
        for r in ZS.extract_zip_members(
            ZS.synth_zip_archives(
                spark.createDataFrame(
                    [(i, i % 3, f"texto {i}  com   espaços") for i in range(6)],
                    "doc_id long, bucket int, text string",
                )
            )
        ).collect()
    }
    assert len(rows) == 6
    for i in range(6):
        r = rows[i]
        assert r["member"] == f"corpus/doc_{i}.txt"
        assert r["text"] == f"texto {i} com espaços"
        assert r["method"] == ("store", "deflate", "zstd")[i % 3]
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))


def test_zstandard_members_roundtrip_and_crc():
    """APPNOTE method 93 (round 9): members compress as zstd frames; the
    ZIP-level CRC-32 still verifies the UNCOMPRESSED bytes, so a corrupt
    zstd payload is dropped, never returned wrong."""
    members = [("a.txt", b"alpha " * 200), ("b.txt", b"beta")]
    blob = ZS.write_zip(members, method=93)
    out = ZS.parse_zip(blob)
    assert [(m["name"], m["content"]) for m in out] == members
    assert all(m["method"] == 93 for m in out)
    bad = bytearray(blob)
    body_at = blob.find(b"a.txt") + 5  # into the first member's zstd frame
    bad[body_at + 6] ^= 0xFF
    out2 = ZS.parse_zip(bytes(bad))
    assert [m["name"] for m in out2] == ["b.txt"]  # corrupt member dropped
