"""TAR source tests (round 8, sources/tarball.py)."""

from __future__ import annotations

import io
import tarfile

import pytest

from rpa_etl_spark.sources import tarball as T

MEMBERS = [
    ("corpus/doc_1.txt", b"ola mundo"),
    ("corpus/" + "d" * 120 + "/doc_2.txt", b"x" * 513),  # needs long-name form
    ("doc_3.txt", b""),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_and_stdlib_reads_our_writer(gz):
    data = T.write_tar(MEMBERS[:1] + MEMBERS[2:], gzip_archive=gz)
    got = [(m["name"], m["content"]) for m in T.parse_tar(data)]
    assert got == MEMBERS[:1] + MEMBERS[2:]
    if not gz:
        tf = tarfile.open(fileobj=io.BytesIO(data))
        std = [(ti.name, tf.extractfile(ti).read()) for ti in tf if ti.isreg()]
        assert std == MEMBERS[:1] + MEMBERS[2:]


@pytest.mark.parametrize(
    "fmt", [tarfile.PAX_FORMAT, tarfile.GNU_FORMAT, tarfile.USTAR_FORMAT]
)
def test_parses_all_stdlib_writer_formats(fmt):
    """Real tarballs come in three header dialects (Python's default is
    PAX): ustar prefix splits, GNU 'L' longname members, and PAX 'x'
    extended headers must all resolve long paths."""
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=fmt)
    for n, c in MEMBERS:
        ti = tarfile.TarInfo(n)
        ti.size = len(c)
        tf.addfile(ti, io.BytesIO(c))
    tf.close()
    got = [(m["name"], m["content"]) for m in T.parse_tar(buf.getvalue())]
    assert got == MEMBERS


def test_checksum_verified_and_truncation_degrades():
    data = T.write_tar(MEMBERS[:1] + MEMBERS[2:])
    corrupt = bytearray(data)
    corrupt[0] ^= 0xFF  # break the first header's checksum
    assert T.parse_tar(bytes(corrupt)) == []
    cut = T.parse_tar(data[:700])  # mid-second-member
    assert [m["name"] for m in cut] == ["corpus/doc_1.txt"]
    assert T.parse_tar(b"\x1f\x8bnot really gzip") == []


def test_directories_and_links_skipped():
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    d = tarfile.TarInfo("corpus")
    d.type = tarfile.DIRTYPE
    tf.addfile(d)
    ti = tarfile.TarInfo("corpus/doc_9.txt")
    ti.size = 2
    tf.addfile(ti, io.BytesIO(b"ok"))
    tf.close()
    got = T.parse_tar(buf.getvalue())
    assert [(m["name"], m["content"]) for m in got] == [("corpus/doc_9.txt", b"ok")]


def test_spark_tar_extract(spark):
    rows = {
        r["doc_id"]: r
        for r in T.extract_tar_members(
            T.synth_tar_archives(
                spark.createDataFrame(
                    [(i, i % 2, f"texto {i}  com   espaços") for i in range(6)],
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
        assert r["gzipped"] == (i % 2 == 1)
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))
