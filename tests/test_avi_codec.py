"""Pure-numpy uncompressed-AVI codec: container structure pinned by byte
assertions, frames by round-trip + the closed-form q_multimodal_frames
oracle (which recomputes pixels from the formula, independent of these
tests)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rpa_etl_spark.sources.multimodal import (
    avi_decode,
    avi_encode,
    synth_avi_video,
)


def _frames(n=3, h=4, w=5, seed=1):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_container_structure():
    data = avi_encode(_frames(), fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # first LIST must be hdrl, containing avih then a strl LIST
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    assert data[24:28] == b"avih"
    # RIFF size field covers the rest of the file exactly
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8


def test_roundtrip_preserves_frames_and_fps():
    frames = _frames(n=4, h=6, w=7)  # w*3=21 -> 3 pad bytes per row
    fps, back = avi_decode(avi_encode(frames, fps=25))
    assert fps == 25
    assert len(back) == 4
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)


def test_decode_accepts_compressed_chunk_id_for_dib():
    """'00dc' is what some muxers emit even for uncompressed DIBs — the
    decoder must accept both ids (strf's compression field is the truth)."""
    data = bytearray(avi_encode(_frames(n=1), fps=10))
    idx = bytes(data).find(b"00db")
    data[idx : idx + 4] = b"00dc"
    _, back = avi_decode(bytes(data))
    assert len(back) == 1


def test_decode_rejects_non_avi_and_compressed():
    with pytest.raises(ValueError):
        avi_decode(b"RIFF\x00\x00\x00\x00WAVE")
    data = bytearray(avi_encode(_frames(n=1), fps=10))
    idx = bytes(data).find(b"strf")
    # biCompression lives 16 bytes into the BITMAPINFOHEADER body
    struct.pack_into("<I", data, idx + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        avi_decode(bytes(data))


def test_synth_matches_closed_form():
    fps, frames = avi_decode(synth_avi_video(7, n_frames=6, width=8, height=8))
    assert fps == 10 and len(frames) == 6
    r = np.arange(8).reshape(-1, 1, 1)
    x = np.arange(8).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    for f in (0, 3, 5):
        np.testing.assert_array_equal(
            frames[f], ((7 + 5 * f + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
        )


# -- MJPEG-in-AVI (round 6) ------------------------------------------------


def test_mjpeg_avi_roundtrip_solid_gray_exact():
    """Every solid gray must survive encode→decode exactly (DC-only block)
    — the invariant q_multimodal_mjpeg's closed-form oracle relies on."""
    import numpy as np

    from rpa_etl_spark.sources.multimodal import avi_decode, mjpeg_avi_encode

    frames = [np.full((8, 8, 3), v, dtype=np.uint8) for v in range(0, 256, 5)]
    fps, out = avi_decode(mjpeg_avi_encode(frames, fps=10))
    assert fps == 10 and len(out) == len(frames)
    for f, o in zip(frames, out):
        assert (f == o).all()


def test_mjpeg_avi_gradient_bounded_error():
    import numpy as np

    from rpa_etl_spark.sources.multimodal import avi_decode, mjpeg_avi_encode

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(3)]
    _, out = avi_decode(mjpeg_avi_encode(frames))
    for f, o in zip(frames, out):
        assert o.shape == f.shape
        assert np.abs(o.astype(int) - f.astype(int)).max() <= 128  # lossy, bounded


def test_mjpeg_detected_by_sample_frames_kernel():
    """The generic sample_frames path must take the REAL decode branch for
    MJPEG payloads now (no stub rotation)."""
    import numpy as np

    from rpa_etl_spark.sources.multimodal import avi_decode, synth_mjpeg_video

    payload = synth_mjpeg_video(7, n_frames=6)
    fps, frames = avi_decode(payload)
    assert fps > 0 and len(frames) == 6
    for f, arr in enumerate(frames):
        assert (arr == (7 + 37 * f) % 256).all()


def test_unknown_compression_still_raises():
    import struct

    import numpy as np
    import pytest

    from rpa_etl_spark.sources.multimodal import avi_decode, mjpeg_avi_encode

    data = bytearray(mjpeg_avi_encode([np.zeros((8, 8, 3), np.uint8)]))
    i = bytes(data).find(b"MJPG", 40)  # the strf biCompression fourcc
    while i >= 0:
        data[i : i + 4] = b"XVID"
        i = bytes(data).find(b"MJPG", i + 4)
    with pytest.raises(ValueError):
        avi_decode(bytes(data))
