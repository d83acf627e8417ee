"""Pure-numpy BMP codec: format pinned by a hand-built byte fixture (so an
encode/decode bug can't cancel itself out via round-trip), resize pinned by
a known pattern, and the Spark decode stage by the q_multimodal_decode
oracle (tests/test_oracle_parity.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rpa_etl_spark.sources.multimodal import (
    attach_bmp_media,
    bmp_decode,
    bmp_encode,
    resize_bmp,
    resize_nearest,
    synth_bmp_image,
)

# Hand-built 2x2 24-bit BMP (spec-derived, not produced by our encoder):
# pixels RGB: (0,0)=red (1,2,3)-ish... use exact values:
#   top-left  = (255, 0, 0)   top-right = (0, 255, 0)
#   bot-left  = (0, 0, 255)   bot-right = (10, 20, 30)
# File stores rows bottom-up, channels BGR, rows padded to 4 bytes
# (2 px * 3 B = 6 B -> 2 pad bytes).
_FIXTURE_PIXELS = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
)
_FIXTURE_BYTES = (
    struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + 16, 0, 0, 54, 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0,
    )
    # bottom row first: (0,0,255) -> BGR ff 00 00 ; (10,20,30) -> 1e 14 0a
    + bytes([255, 0, 0, 30, 20, 10, 0, 0])
    # top row: (255,0,0) -> 00 00 ff ; (0,255,0) -> 00 ff 00
    + bytes([0, 0, 255, 0, 255, 0, 0, 0])
)


def test_decode_matches_spec_fixture():
    assert (bmp_decode(_FIXTURE_BYTES) == _FIXTURE_PIXELS).all()


def test_encode_matches_spec_fixture():
    assert bmp_encode(_FIXTURE_PIXELS) == _FIXTURE_BYTES


def test_round_trip_odd_width_needs_padding():
    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (3, 2), (5, 4), (16, 16), (7, 3)]:
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (bmp_decode(bmp_encode(arr)) == arr).all(), (w, h)


def test_decode_rejects_non_bmp():
    with pytest.raises(ValueError):
        bmp_decode(b"\x89PNG not a bmp")


def test_resize_nearest_downsamples_checkerboard():
    # 4x4 checkerboard -> 2x2 picks the top-left of each 2x2 cell
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[::2, ::2] = 255  # (0,0),(0,2),(2,0),(2,2) white
    out = resize_nearest(base, 2, 2)
    assert (out == 255).all()
    up = resize_nearest(base, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (resize_nearest(up, 4, 4) == base).all()


def test_spark_resize_stage_emits_valid_bmps(spark, sf_dir):
    from rpa_etl_spark.tables import load

    media = attach_bmp_media(load(spark, sf_dir, "documents").limit(8))
    rows = resize_bmp(media, out_w=4, out_h=4).collect()
    assert len(rows) == 8
    for r in rows:
        arr = bmp_decode(bytes(r.resized_payload))
        assert arr.shape == (4, 4, 3)
        # nearest-neighbor of the synthetic gradient: pixel (r', x') samples
        # source pixel (r'*16//4, x'*16//4)
        src = bmp_decode(synth_bmp_image(int(r.media_id)))
        assert (arr == resize_nearest(src, 4, 4)).all()
