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
    """Round-trip INCLUDING the writer's ustar prefix-split branch (the
    137-char member) — round-8 review: the long name was previously only
    covered read-side."""
    data = T.write_tar(MEMBERS, gzip_archive=gz)
    got = [(m["name"], m["content"]) for m in T.parse_tar(data)]
    assert got == MEMBERS
    if not gz:
        tf = tarfile.open(fileobj=io.BytesIO(data))
        std = [(ti.name, tf.extractfile(ti).read()) for ti in tf if ti.isreg()]
        assert std == MEMBERS


def test_writer_rejects_unencodable_values():
    with pytest.raises(ValueError):
        T.write_tar([("x" * 300, b"")])  # name too long for ustar split
    with pytest.raises(ValueError):
        T._header("big.bin", 8 * 1024**3)  # size needs base-256 extension


def test_old_gnu_header_prefix_field_not_misread():
    """Old-GNU headers (magic 'ustar  ') store atime at offset 345 — a
    POSIX-prefix read there corrupts names (round-8 review). stdlib's
    GNU writer emits that magic; our parse must keep the short name."""
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT)
    ti = tarfile.TarInfo("doc_7.txt")
    ti.size = 2
    tf.addfile(ti, io.BytesIO(b"ok"))
    tf.close()
    raw = bytearray(buf.getvalue())
    assert raw[257:263] == b"ustar "  # old-GNU magic, NOT 'ustar\0'
    # plant a nonzero atime-like octal where POSIX would put the prefix
    raw[345:357] = b"00000001230\0"
    h = raw[0:512]
    chk = sum(h) - sum(h[148:156]) + 8 * ord(" ")
    raw[148:156] = f"{chk:06o}".encode() + b"\0 "
    got = T.parse_tar(bytes(raw))
    assert [(m["name"], m["content"]) for m in got] == [("doc_7.txt", b"ok")]


def _pax_block(payload: bytes) -> bytes:
    """Hand-craft a PAX 'x' extended header block + padded payload."""
    h = bytearray(T._header("pax", len(payload)))
    h[156] = ord("x")
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\0 "
    return bytes(h) + payload + bytes((-len(payload)) % 512)


def test_pax_size_override_is_authoritative_and_truncation_drops():
    """A PAX 'size' record overrides the ustar size field (stdlib writes
    0 there for >8 GiB members); when the overridden extent runs past the
    available data the member must be DROPPED, not emitted as a bogus
    empty one (round-8 review)."""
    pax = _pax_block(b"12 size=700\n")
    member_hdr = T._header("corpus/doc_5.txt", 0)  # ustar field says 0
    body = b"z" * 700
    whole = pax + member_hdr + body + bytes((-len(body)) % 512) + bytes(1024)
    got = T.parse_tar(whole)
    assert [(m["name"], m["size"], m["content"]) for m in got] == [
        ("corpus/doc_5.txt", 700, body)
    ]
    cut = pax + member_hdr  # header present, data never arrived
    assert T.parse_tar(cut) == []


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


def test_parse_tar_zst_roundtrip():
    from rpa_etl_spark.sources import zstd as Z

    tar = T.write_tar([("a.txt", b"alpha"), ("dir/b.txt", b"beta" * 1000)])
    for blob in (Z.compress_store(tar, checksum=True), Z.compress(tar, level=19)):
        out = T.parse_tar(blob)
        assert [(m["name"], m["content"][:5]) for m in out] == [
            ("a.txt", b"alpha"), ("dir/b.txt", b"betab"),
        ]
    corrupt = bytearray(Z.compress_store(tar, checksum=True))
    corrupt[-1] ^= 0xFF  # break the XXH64 checksum
    assert T.parse_tar(bytes(corrupt)) == []  # degrade, don't raise


def test_spark_tar_extract_zst(spark):
    docs = spark.createDataFrame(
        [(i % 6, i, f"texto {i}  com   espaços") for i in range(12)],
        "bucket int, doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.extract_tar_members_zst(
        T.synth_tar_archives_zst(docs)).collect()}
    assert len(rows) == 12
    for i in range(12):
        r = rows[i]
        assert r["member"] == f"corpus/doc_{i}.txt"
        assert r["checksummed"] == (i % 6 % 3 == 0)
        assert r["text"] == f"texto {i} com espaços"
