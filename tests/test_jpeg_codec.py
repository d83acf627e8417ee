"""Baseline JPEG codec: JPEG is lossy, so the gate is bounded-error
round-trip (tight on smooth content, exact on flat, loose on noise) plus
marker-structure, determinism, real-compression, and strictness checks.
The oracle-checked compressed-image path stays on PNG (bit-exact); JPEG
completes the entropy-coded end of the codec set."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rpa_etl_spark.sources.jpeg import jpeg_decode, jpeg_encode


def _gradient(h=24, w=32):
    r = np.arange(h).reshape(-1, 1, 1)
    x = np.arange(w).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    return ((r * 3 + x * 2 + c * 40) % 256).astype(np.uint8)


def test_flat_image_roundtrips_exactly():
    arr = np.full((8, 8, 3), 200, dtype=np.uint8)
    np.testing.assert_array_equal(jpeg_decode(jpeg_encode(arr)), arr)


def test_smooth_gradient_small_bounded_error():
    arr = _gradient()
    back = jpeg_decode(jpeg_encode(arr))
    assert back.shape == arr.shape
    err = np.abs(back.astype(int) - arr.astype(int))
    assert err.max() <= 6, err.max()
    assert err.mean() <= 2.0, err.mean()


def test_noise_bounded_error_and_non_multiple_of_8_dims():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8).astype(np.uint8)
    back = jpeg_decode(jpeg_encode(arr))
    assert back.shape == (17, 19, 3)  # cropped back from 24x24 padding
    assert np.abs(back.astype(int) - arr.astype(int)).max() <= 64


def test_marker_structure_and_determinism():
    arr = _gradient()
    data = jpeg_encode(arr)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    assert jpeg_encode(arr) == data  # fully deterministic
    # SOF0 carries the true (unpadded) dimensions
    idx = data.find(b"\xff\xc0")
    h, w = struct.unpack_from(">HH", data, idx + 5)
    assert (h, w) == (24, 32)


def test_actually_compresses_smooth_content():
    arr = _gradient(48, 64)
    assert len(jpeg_encode(arr)) < 48 * 64 * 3 / 4


def test_rejects_non_jpeg_and_non_baseline():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    data = bytearray(jpeg_encode(_gradient()))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # claim progressive
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(bytes(data))


def test_rejects_subsampled_streams():
    data = bytearray(jpeg_encode(_gradient()))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 11] = 0x22  # luma sampling 2x2 (4:2:0)
    with pytest.raises(ValueError, match="4:4:4"):
        jpeg_decode(bytes(data))


def test_spark_decode_stage_bounded_error(spark):
    """Arrow-batched decode of JPEG payloads synthesized from the same
    closed-form gradient as the BMP/PNG queries: per-image mean intensity
    must land within the quantization error band of the exact value."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ids = list(range(12))

    def synth(mid):
        r = np.arange(16).reshape(-1, 1, 1)
        x = np.arange(16).reshape(1, -1, 1)
        c = np.arange(3).reshape(1, 1, -1)
        return ((mid + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)

    pdf = pd.DataFrame(
        {"media_id": ids, "payload": [jpeg_encode(synth(i)) for i in ids]}
    )
    sdf = spark.createDataFrame(pdf)
    schema = StructType(
        [StructField("media_id", LongType()), StructField("mean_rgb", DoubleType())]
    )

    def kernel(batches):
        for b in batches:
            means = []
            for p in b["payload"]:
                arr = jpeg_decode(bytes(p)).astype(np.int64)
                means.append(float(arr.mean()))
            yield pd.DataFrame({"media_id": b["media_id"], "mean_rgb": means})

    got = {r["media_id"]: r["mean_rgb"] for r in sdf.mapInPandas(kernel, schema).collect()}
    for i in ids:
        exact = synth(i).astype(np.int64).mean()
        assert abs(got[i] - exact) < 20.0, (i, got[i], exact)


def test_block_symbols_zrl_and_eob_semantics():
    """round 15: _block_symbols walks only the nonzero ACs. Pin the
    run-length semantics of the rewrite against T.81: runs >= 16 emit
    ZRL(s), a nonzero at k=63 suppresses EOB, an all-zero AC block is a
    bare EOB, and trailing zeros never emit ZRL."""
    from rpa_etl_spark.sources.jpeg import _block_symbols

    def syms(coeffs):
        (_, _), acs, _ = _block_symbols(np.asarray(coeffs, dtype=np.int64), 0)
        return acs

    z = [0] * 64
    # all-zero ACs -> bare EOB
    assert syms(z) == [(0x00, (0, 0))]
    # 16 zeros then 1 at k=17 -> one ZRL + (run 0, size 1) + EOB
    c = list(z); c[17] = 1
    assert syms(c) == [(0xF0, (0, 0)), (0x01, (1, 1)), (0x00, (0, 0))]
    # 33 zeros then -1 at k=34 -> two ZRLs + (run 1, size 1, bits 0) + EOB
    c = list(z); c[34] = -1
    assert syms(c) == [(0xF0, (0, 0)), (0xF0, (0, 0)), (0x11, (0, 1)), (0x00, (0, 0))]
    # nonzero at the LAST position (k=63): run 61 -> 3 ZRLs + run 13, no EOB
    c = list(z); c[1] = 3; c[63] = 2
    assert syms(c) == [
        (0x02, (3, 2)),
        (0xF0, (0, 0)), (0xF0, (0, 0)), (0xF0, (0, 0)),
        ((13 << 4) | 2, (2, 2)),
    ]
    # trailing zeros after the last nonzero emit nothing but EOB
    c = list(z); c[1] = 5
    got = syms(c)
    assert got == [(0x03, (5, 3)), (0x00, (0, 0))]


def test_encode_batched_dct_matches_per_block_form():
    """round 15: jpeg_encode quantizes all blocks of a component in one
    batched matmul. Pin it to the per-block scalar walk on content with
    every filter of block positions exercised (random, odd dims)."""
    from rpa_etl_spark.sources.jpeg import (
        _DCT,
        _QUANT_CHROMA,
        _QUANT_LUMA,
        _ZIGZAG,
        _rgb_to_ycbcr,
    )

    rng = np.random.default_rng(1503)
    arr = rng.integers(0, 256, size=(23, 37, 3), dtype=np.uint8)
    h, w, _ = arr.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        arr.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    ycc = _rgb_to_ycbcr(padded)
    quants = [_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA]
    # scalar reference walk (the pre-round-15 form)
    ref_blocks = [[], [], []]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                block = ycc[by : by + 8, bx : bx + 8, ci] - 128.0
                coeff = _DCT @ block @ _DCT.T
                q = np.round(coeff / quants[ci]).astype(np.int64)
                ref_blocks[ci].append(q.reshape(-1)[_ZIGZAG])
    # batched form (what jpeg_encode now does)
    nby, nbx = ph // 8, pw // 8
    for ci in range(3):
        ch = ycc[..., ci] - 128.0
        blocks = ch.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coeff = _DCT @ blocks @ _DCT.T
        q = np.round(coeff / quants[ci]).astype(np.int64)
        got = q.reshape(-1, 64)[:, _ZIGZAG]
        assert np.array_equal(got, np.stack(ref_blocks[ci]))
