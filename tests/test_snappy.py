"""Snappy block-format conformance (sources/snappy.py, round 9) —
pinned both directions against pyarrow's bundled reference snappy."""

from __future__ import annotations

import numpy as np
import pytest

from rpa_etl_spark.sources import snappy as S


def _ref():
    import pyarrow as pa

    return pa.Codec("snappy")


def _shapes() -> list[bytes]:
    rng = np.random.default_rng(3)
    return [
        b"",
        b"x",
        b"hello world " * 500,
        bytes(range(256)) * 30,
        rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
        b"\x00" * 10000,
        b"abcab" * 20000,  # copy-element heavy
        rng.integers(0, 4, 90000, dtype=np.uint8).tobytes(),
    ]


def test_decode_reference_streams():
    c = _ref()
    for i, d in enumerate(_shapes()):
        assert S.decompress(bytes(c.compress(d))) == d, f"shape {i}"


def test_reference_decodes_literal_streams():
    c = _ref()
    for d in _shapes():
        assert bytes(c.decompress(S.compress_literal(d), len(d))) == d
        assert S.decompress(S.compress_literal(d)) == d


def test_long_literal_extended_length_forms():
    # >60-byte literals use the extended length bytes; 65536-chunking
    # exercises the 3-byte form
    d = bytes(np.random.default_rng(1).integers(0, 256, 200000, dtype=np.uint8))
    assert S.decompress(S.compress_literal(d)) == d


def test_corruption_raises_valueerror_only():
    c = _ref()
    base = bytes(c.compress(b"abcab" * 5000))
    rng = np.random.default_rng(9)
    for _ in range(200):
        bad = bytearray(base)
        if rng.integers(0, 2):
            bad = bad[: rng.integers(1, len(bad))]
        else:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            S.decompress(bytes(bad))
        except ValueError:
            pass  # the only acceptable failure mode


def test_overlapping_copy_rle_semantics():
    # offset < length: LZ77 RLE expansion
    d = b"ab" * 40000
    assert S.decompress(bytes(_ref().compress(d))) == d


def test_uvarint_length_cap_is_exclusive():
    """Round-10 advice: the format caps the declared uncompressed length
    at 2^32 - 1, so exactly 2^32 is implausible too (the old guard was
    ``n > 2^32``, off by one)."""
    enc = bytearray()
    n = 1 << 32
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            enc.append(b | 0x80)
        else:
            enc.append(b)
            break
    with pytest.raises(ValueError, match="implausible"):
        S.decompress(bytes(enc))
