"""GIF87a/89a codec tests (round 8, sources/multimodal.py GIF section).

The LZW here is the GIF dialect — LSB-first packing, variable 3..12-bit
codes, CLEAR/EOI, 255-byte sub-blocks — distinct from the PDF LZWDecode
filter (MSB-first, early-change) already tested in test_minipdf_hard.
"""

from __future__ import annotations

import numpy as np
import pytest

from rpa_etl_spark.sources import multimodal as MM


def _pal(n: int = 256) -> np.ndarray:
    i = np.arange(n)
    return np.stack([(3 * i) % 256, (7 * i) % 256, (11 * i) % 256], axis=1).astype(
        np.uint8
    )


def test_roundtrip_random_rasters_and_palettes():
    rng = np.random.default_rng(5)
    for _ in range(8):
        h, w = (int(v) for v in rng.integers(1, 40, 2))
        n = int(rng.integers(2, 257))
        idx = rng.integers(0, n, (h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        for interlace in (False, True):
            rgb = MM.gif_decode(MM.gif_encode(idx, pal, interlace=interlace))
            assert np.array_equal(rgb, pal[idx])


def test_lzw_width_growth_and_table_reset():
    """A 64K-pixel noisy raster drives the code width to 12 bits and
    forces a 4096-entry table CLEAR/reset mid-stream."""
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 256, (256, 256)).astype(np.uint8)
    rgb = MM.gif_decode(MM.gif_encode(idx, _pal()))
    assert np.array_equal(rgb, _pal()[idx])


def test_kwkwk_case():
    """The code-equals-next-table-entry (KwKwK) LZW corner: a run of one
    repeated symbol produces it immediately."""
    idx = np.zeros((4, 16), dtype=np.uint8)
    rgb = MM.gif_decode(MM.gif_encode(idx, _pal(4)))
    assert np.array_equal(rgb, _pal(4)[idx])


def test_small_palette_min_code_size():
    """2-entry palettes still use min_code_size >= 2 per spec."""
    idx = (np.arange(64).reshape(8, 8) % 2).astype(np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    b = MM.gif_encode(idx, pal)
    assert np.array_equal(MM.gif_decode(b), pal[idx])


def test_89a_extensions_skipped_and_version_bytes():
    idx = np.full((8, 8), 3, dtype=np.uint8)
    b89 = MM.gif_encode(idx, _pal(), version=b"89a")
    b87 = MM.gif_encode(idx, _pal(), version=b"87a")
    assert b89[:6] == b"GIF89a" and b"\x21\xf9" in b89
    assert b87[:6] == b"GIF87a"
    assert np.array_equal(MM.gif_decode(b89), MM.gif_decode(b87))


def test_truncated_stream_degrades_not_raises():
    """A transfer-truncated GIF (cut mid-LZW-sub-block) must yield a
    padded raster, not fail the task; the decoded prefix must match the
    intact image (round-8 review: the original test decoded the intact
    bytes and the degrade path was never exercised)."""
    idx = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    b = MM.gif_encode(idx, _pal())
    full = MM.gif_decode(b)
    cut = MM.gif_decode(b[: len(b) * 3 // 4])  # drop the tail sub-blocks
    assert cut.shape == (16, 16, 3)
    # some prefix of rows decoded correctly, the rest is zero padding
    flat_full, flat_cut = full.reshape(-1, 3), cut.reshape(-1, 3)
    n_good = next(
        (k for k in range(len(flat_cut)) if not np.array_equal(flat_cut[k], flat_full[k])),
        len(flat_cut),
    )
    assert 0 < n_good < 256  # genuinely truncated, genuinely partial
    pal0 = _pal()[0]
    assert all(
        np.array_equal(px, pal0) or px.sum() == 0 for px in flat_cut[n_good:][-10:]
    )


def test_not_a_gif_raises():
    with pytest.raises(ValueError):
        MM.gif_decode(b"PNG nope")


def test_spark_gif_features(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    out = MM.decode_gif_features(MM.attach_gif_media(docs)).collect()
    assert len(out) == 6
    for r in out:
        # recompute the closed form the oracle uses
        mid = r["media_id"]
        rr, xx = np.mgrid[0:16, 0:16]
        idx = (mid + 5 * rr + 3 * xx) % 256
        rgb = _pal()[idx].astype(np.int64)
        flat = rgb.reshape(-1)
        assert r["mean_rgb"] == flat.sum() / flat.size
        assert r["weighted_checksum"] == int((flat * (np.arange(flat.size) + 1)).sum())


def test_truncated_extension_degrades_cleanly():
    """Round-8 advice: a GIF cut mid-EXTENSION (before any image block)
    must raise a clean ValueError the feature kernel tolerates — not
    IndexError, which would kill the whole Arrow batch."""
    idx = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    b = MM.gif_encode(idx, _pal(), version=b"89a")
    ext_at = b.find(b"\x21")  # first extension introducer
    assert ext_at > 0
    with pytest.raises(ValueError):
        MM.gif_decode(b[: ext_at + 3])  # ends inside the sub-block chain


def test_truncated_image_descriptor_degrades_cleanly():
    """Round-9 review: truncation AT or INSIDE the image descriptor
    (not just the extension walk) must raise ValueError, never
    struct.error/IndexError."""
    idx = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    b = MM.gif_encode(idx, _pal())
    img_at = b.find(b"\x2c")
    assert img_at > 0
    for cut in (img_at + 1, img_at + 5, img_at + 10):
        with pytest.raises(ValueError):
            MM.gif_decode(b[:cut])
