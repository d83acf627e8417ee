"""PNG codec (stdlib-zlib DEFLATE + spec filters): the unfilter logic is
pinned by hand-FILTERED fixtures for every filter type (our encoder only
emits type 0, so a plain round-trip would never exercise Sub/Up/Average/
Paeth), CRC verification by a corrupted-chunk fixture, and the Spark stage
by the q_multimodal_png oracle."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rpa_etl_spark.sources.multimodal import (
    _PNG_SIG,
    _png_chunk,
    png_decode,
    png_encode,
    synth_png_image,
)


def _forward_filter(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Spec-conformant forward filtering (test-side reference
    implementation, independent of the decoder under test)."""
    h, w, _ = arr.shape
    bpp, stride = 3, w * 3
    flat = arr.reshape(h, stride).astype(np.int32)
    out = b""
    for r, ft in enumerate(ftypes):
        cur = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                line[i] = cur[i]
            elif ft == 1:
                line[i] = cur[i] - a
            elif ft == 2:
                line[i] = cur[i] - b
            elif ft == 3:
                line[i] = cur[i] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = cur[i] - pred
        out += bytes([ft]) + (line & 0xFF).astype(np.uint8).tobytes()
    return out


def _build_png(arr: np.ndarray, ftypes: list[int]) -> bytes:
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(_forward_filter(arr, ftypes)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_unfilter_each_type(ftype):
    rng = np.random.default_rng(ftype)
    arr = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8).astype(np.uint8)
    data = _build_png(arr, [ftype] * 6)
    np.testing.assert_array_equal(png_decode(data), arr)


def test_unfilter_mixed_rows():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8).astype(np.uint8)
    data = _build_png(arr, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(png_decode(data), arr)


def test_roundtrip_own_encoder():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(arr)), arr)


def test_crc_is_verified():
    data = bytearray(png_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    idx = bytes(data).find(b"IDAT")
    data[idx + 6] ^= 0xFF  # flip a compressed byte, keep stored CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"\x89PNX\r\n\x1a\n" + b"\x00" * 20)
    # grayscale (color type 0) must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(bad)


def test_synth_matches_bmp_closed_form():
    arr = png_decode(synth_png_image(11))
    r = np.arange(16).reshape(-1, 1, 1)
    x = np.arange(16).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    np.testing.assert_array_equal(arr, ((11 + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8))
