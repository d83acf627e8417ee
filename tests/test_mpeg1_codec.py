"""MPEG-1 intra codec tests (round 8, sources/mpeg1.py).

There is no reference MPEG decoder in this container, so conformance
rests on two machine gates stated in the module docstring: (a) every VLC
table is prefix-free with no duplicate codes (a transcription slip from
ISO 11172-2 Annex B almost always breaks this), and (b) encode→decode
round-trips — exact for DC-only content, bounded-error for structured
content — through the full syntax (sequence/GOP/picture/slice headers,
address increments, both intra macroblock types, escape coding, 4:2:0).
"""

from __future__ import annotations

import numpy as np
import pytest

from rpa_etl_spark.sources import mpeg1 as M


def _flat(v: int, n: int = 6, size: int = 16) -> list:
    return [np.full((size, size, 3), v, dtype=np.uint8) for _ in range(n)]


def _prefix_free(codes: list[str]) -> list[tuple[str, str]]:
    return [
        (a, b) for a in codes for b in codes if a != b and b.startswith(a)
    ]


def test_all_vlc_tables_prefix_free():
    tables = {
        "ac": list(M._AC_VLC.values()) + [M._AC_EOB, M._AC_ESCAPE],
        "dc_luma": list(M._DC_SIZE_LUMA.values()),
        "dc_chroma": list(M._DC_SIZE_CHROMA.values()),
        "mb_inc": list(M._MB_ADDR_INC.values()) + [M._MB_ESCAPE, M._MB_STUFFING],
    }
    for name, codes in tables.items():
        assert len(codes) == len(set(codes)), f"{name}: duplicate codes"
        assert not _prefix_free(codes), f"{name}: prefix violations"


def test_ac_table_has_full_spec_coverage():
    """Table B.5's run/level span: levels 1..40 at run 0, 1..18 at run 1,
    and the long single-level tail to run 31 — 111 entries + EOB + ESC."""
    assert len(M._AC_VLC) == 111
    assert all((0, lv) in M._AC_VLC for lv in range(1, 41))
    assert all((1, lv) in M._AC_VLC for lv in range(1, 19))
    assert all((r, 1) in M._AC_VLC for r in range(0, 32))


def test_flat_roundtrip_exact_all_values():
    """Solid gray is DC-only through the DCT: the intra path must
    reproduce every possible value EXACTLY (the property the declared
    query's closed-form oracle relies on)."""
    for v in range(256):
        bs = M.mpeg1_encode(_flat(v, n=2), gop=2)
        n, frames = M.mpeg1_decode_iframes(bs)
        assert n == 2 and len(frames) == 1
        tref, arr = frames[0]
        assert tref == 0 and arr.shape == (16, 16, 3)
        assert np.all(arr == v), f"value {v}: got {np.unique(arr)}"


def test_iframes_only_and_temporal_refs():
    bs = M.mpeg1_encode(_flat(100, n=7), gop=3)
    n, frames = M.mpeg1_decode_iframes(bs)
    assert n == 7
    assert [t for t, _ in frames] == [0, 3, 6]  # P payloads skipped


def test_gradient_roundtrip_bounded_error_multi_mb():
    """Structured 32x32 content (4 macroblocks): the full AC path — runs,
    levels, escapes — under the lossy gate (same bar as jpeg.py)."""
    y, x = np.mgrid[0:32, 0:32]
    frames = [
        np.stack([(y * 3 + f * 11) % 256, (x * 5) % 256, ((x + y) * 2) % 256],
                 axis=-1).astype(np.uint8)
        for f in range(4)
    ]
    bs = M.mpeg1_encode(frames, gop=2, qscale=4)
    n, dec = M.mpeg1_decode_iframes(bs)
    assert n == 4 and [t for t, _ in dec] == [0, 2]
    for t, arr in dec:
        err = np.abs(arr.astype(int) - frames[t].astype(int))
        assert err.max() <= 12, f"frame {t}: max err {err.max()}"


def test_intra_quant_macroblock_type():
    """The '01' (intra + new quantizer_scale) macroblock type must decode
    identically to plain intra when the restated scale is unchanged."""
    y, x = np.mgrid[0:16, 0:16]
    frame = np.stack([(y * 7) % 256] * 3, axis=-1).astype(np.uint8)
    a = M.mpeg1_encode([frame], gop=1, qscale=6)
    b = M.mpeg1_encode([frame], gop=1, qscale=6, requant_first_mb=True)
    assert a != b  # the syntax differs...
    _, da = M.mpeg1_decode_iframes(a)
    _, db = M.mpeg1_decode_iframes(b)
    assert np.array_equal(da[0][1], db[0][1])  # ...the pixels do not


def test_escape_coding_roundtrip():
    """A high-contrast block forces levels outside Table B.5's range, so
    the 6-bit-run + 8/16-bit-level escape path must round-trip."""
    frame = np.zeros((16, 16, 3), dtype=np.uint8)
    frame[::2] = 255  # alternating rows: huge high-frequency coefficients
    bs = M.mpeg1_encode([frame], gop=1, qscale=2)
    n, dec = M.mpeg1_decode_iframes(bs)
    err = np.abs(dec[0][1].astype(int) - frame.astype(int))
    # lossy, but structure must survive: rows still alternate dark/bright
    assert dec[0][1][::2].mean() > 200 and dec[0][1][1::2].mean() < 55
    assert err.mean() < 30


def test_stream_structure():
    """Start codes appear in spec order and the stream is byte-exact
    deterministic for identical input."""
    bs = M.mpeg1_encode(_flat(9, n=2))
    assert bs == M.mpeg1_encode(_flat(9, n=2))
    assert bs.startswith(b"\x00\x00\x01\xb3")  # sequence header
    assert b"\x00\x00\x01\xb8" in bs  # GOP
    assert b"\x00\x00\x01\x00" in bs  # picture
    assert b"\x00\x00\x01\x01" in bs  # slice 1
    assert bs.rstrip(b"\x00").endswith(b"\x00\x00\x01\xb7".rstrip(b"\x00")) or (
        b"\x00\x00\x01\xb7" in bs
    )  # sequence end


def test_frame_size_must_be_macroblock_aligned():
    with pytest.raises(ValueError):
        M.mpeg1_encode([np.zeros((12, 16, 3), dtype=np.uint8)])


def test_spark_iframe_sampling(spark):
    """The declared-query surface: synth → attach → sample, closed-form
    features per keyframe."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.sources import multimodal as MM

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    out = MM.sample_mpeg1_iframes(MM.attach_mpeg1_media(docs)).collect()
    assert len(out) == 8 * 3
    for r in out:
        v = (r["media_id"] + 37 * r["frame_id"]) % 256
        assert r["frame_id"] in (0, 2, 4)
        assert r["mean_rgb"] == float(v)
        assert r["weighted_checksum"] == v * 295296
        assert (r["width"], r["height"]) == (16, 16)


def test_multi_slice_picture_decodes_identically():
    """slice-per-MB-row (the error-resilient layout real encoders use)
    must decode to the same pixels as the one-slice layout — per-slice DC
    predictor resets and slice_vertical_position addressing included."""
    y, x = np.mgrid[0:48, 0:32]
    frame = np.stack([(y * 5) % 256, (x * 3) % 256, ((x + y)) % 256],
                     axis=-1).astype(np.uint8)
    one = M.mpeg1_encode([frame], gop=1, qscale=4)
    per_row = M.mpeg1_encode([frame], gop=1, qscale=4, slice_per_row=True)
    assert per_row.count(b"\x00\x00\x01\x03") == 1  # slice 3 exists
    _, da = M.mpeg1_decode_iframes(one)
    _, db = M.mpeg1_decode_iframes(per_row)
    assert np.array_equal(da[0][1], db[0][1])


def test_custom_intra_quantizer_matrix_roundtrip():
    """A custom intra matrix in the sequence header (transmitted in
    zigzag order) must be used by the decoder: an all-16 flat matrix at
    low qscale quantizes a gradient much more finely than the default's
    high-frequency tail, and the decode must agree with the encode-side
    matrix, not the default."""
    flat16 = np.full((8, 8), 16, dtype=np.int64)
    flat16[0, 0] = 8
    y, x = np.mgrid[0:16, 0:16]
    frame = np.stack([(y * 16) % 256] * 3, axis=-1).astype(np.uint8)
    bs = M.mpeg1_encode([frame], gop=1, qscale=2, intra_q=flat16)
    n, dec = M.mpeg1_decode_iframes(bs)
    err = np.abs(dec[0][1].astype(int) - frame.astype(int))
    assert err.max() <= 4, f"custom-matrix decode err {err.max()}"
    # and the matrix genuinely changes the stream vs the default
    assert bs != M.mpeg1_encode([frame], gop=1, qscale=2)
    with pytest.raises(ValueError):
        M.mpeg1_encode([frame], intra_q=np.zeros((8, 8)))  # 0 is illegal


# ---- round-8 review regressions --------------------------------------------


def test_zero_stuffing_before_start_codes_tolerated():
    """§2.3 allows any number of zero STUFFING bytes before a start code;
    real encoders emit them. Insert stuffing before every start code of a
    multi-slice stream — the decode must be unchanged (round-8 review)."""
    y, x = np.mgrid[0:32, 0:32]
    frame = np.stack([(y * 5) % 256] * 3, axis=-1).astype(np.uint8)
    bs = M.mpeg1_encode([frame], gop=1, qscale=4, slice_per_row=True)
    stuffed = bs.replace(b"\x00\x00\x01", b"\x00\x00\x00\x00\x00\x01")
    _, da = M.mpeg1_decode_iframes(bs)
    _, db = M.mpeg1_decode_iframes(stuffed)
    assert len(db) == 1 and np.array_equal(da[0][1], db[0][1])


def test_dequant_truncates_toward_zero():
    """§2.4.4.2: the dequant division truncates TOWARD ZERO — Python's
    floor division would mis-reconstruct negative levels (level=-1,
    qscale=5, w=13: trunc gives -8 → odd -7; floor gives -9). Pin sign
    symmetry on the reconstruction math (round-8 review)."""
    from rpa_etl_spark.sources.mpeg1 import _Bits, _Reader, _decode_intra_block

    qmat = np.full((8, 8), 13, dtype=np.int64)
    for level in (1, -1):
        bs = _Bits()
        bs.put_str(M._DC_SIZE_LUMA[0])  # dc diff 0
        bs.put_str(M._AC_VLC[(0, 1)])   # run 0, |level| 1
        bs.put(0 if level > 0 else 1, 1)
        bs.put_str(M._AC_EOB)
        bs.align()
        blk, _ = _decode_intra_block(
            _Reader(bs.bytes()), 128, 5, True, qmat
        )
        coef = (M._DCT @ blk @ M._DCT.T)
        got = int(np.rint(coef.reshape(-1)[M._ZZ_FLAT[1]]))
        assert got == 7 * (1 if level > 0 else -1), (level, got)


def test_encoder_parameter_validation():
    f = [np.zeros((16, 16, 3), dtype=np.uint8)]
    with pytest.raises(ValueError):
        M.mpeg1_encode(f, qscale=0)
    with pytest.raises(ValueError):
        M.mpeg1_encode(f, qscale=32)
    tall = [np.zeros((2816, 16, 3), dtype=np.uint8)]
    with pytest.raises(ValueError):
        M.mpeg1_encode(tall, slice_per_row=True)  # 176 rows > 0xAF slices


def test_stale_custom_matrix_does_not_leak_across_sequences():
    """A later sequence header WITHOUT a matrix load re-establishes the
    default matrix (§2.4.3.2) — concatenated sequences must not decode
    with the previous sequence's custom weights (round-8 review)."""
    flat32 = np.full((8, 8), 32, dtype=np.int64)
    y, x = np.mgrid[0:16, 0:16]
    frame = np.stack([(y * 16) % 256] * 3, axis=-1).astype(np.uint8)
    custom = M.mpeg1_encode([frame], gop=1, qscale=4, intra_q=flat32)
    default = M.mpeg1_encode([frame], gop=1, qscale=4)
    _, dd = M.mpeg1_decode_iframes(default)
    _, dc = M.mpeg1_decode_iframes(custom + default)  # concatenated
    assert [t for t, _ in dc][-1] == 0
    assert np.array_equal(dc[-1][1], dd[0][1])  # second sequence = default


# ---------------------------------------------------------------------------
# P-pictures / motion compensation (round 9)
# ---------------------------------------------------------------------------


def _mosaic_frames(m: int, n: int = 4, mbw: int = 4, mbh: int = 3) -> list:
    """The q_multimodal_mpeg_pframes fixture: per-MB constant grayscale,
    row 0 shifting right one MB per frame (+5), row 1 static with a +3
    delta on the last MB, row 2 shifting with no delta — exercising
    skip, MC+coded, MC-not-coded, no-MC-coded, and intra-in-P paths,
    all bit-exact through the codec (DC-only blocks + odd deltas at
    qscale 8 survive dequantization exactly)."""
    d7 = (m % 256) * 7

    def v(t, i, j):
        if i == 0:
            if j >= t:
                return (d7 + 31 * (j - t)) % 200 + 5 * t
            return (d7 + 90 + 23 * (t - j)) % 200 + 5 * j
        if i == 1:
            if j <= 2:
                return (d7 + 31 * (4 + j)) % 200
            return (d7 + 31 * 7) % 200 + 3 * t
        if j >= t:
            return (d7 + 31 * (8 + j - t)) % 200
        return (d7 + 160 + 47 * (t - j)) % 200

    frames = []
    for t in range(n):
        f = np.zeros((mbh * 16, mbw * 16, 3), dtype=np.uint8)
        for i in range(mbh):
            for j in range(mbw):
                f[16 * i : 16 * i + 16, 16 * j : 16 * j + 16, :] = v(t, i, j)
        frames.append(f)
    return frames


def test_p_vlc_tables_prefix_free():
    tables = {
        "motion": list(M._MOTION_VLC.values()),
        "cbp": list(M._CBP_VLC.values()),
        "mb_type_p": list(M._MB_TYPE_P.values()),
    }
    for name, codes in tables.items():
        assert len(codes) == len(set(codes)), f"{name}: duplicate codes"
        assert not _prefix_free(codes), f"{name}: prefix violations"


def test_cbp_table_covers_1_to_63():
    # every cbp a P encoder can emit (at least one coded block): 1..63
    assert set(M._CBP_VLC) == set(range(1, 64))


def test_motion_diff_roundtrip_all_fcodes():
    for f_code in (1, 2, 3):
        f = 1 << (f_code - 1)
        for diff in range(-16 * f, 16 * f):
            bs = M._Bits()
            M._motion_diff_bits(bs, diff, f_code)
            bs.align()
            r = M._Reader(bytes(bs.buf), 0)
            assert M._read_motion_diff(r, f_code) == diff, (f_code, diff)


def test_mv_wrap():
    assert M._wrap_mv(32, 2) == -32
    assert M._wrap_mv(-33, 2) == 31
    assert M._wrap_mv(31, 2) == 31
    assert M._wrap_mv(-32, 2) == -32


def test_temporal_mosaic_bit_exact():
    for m in (0, 55, 123, 255):
        frames = _mosaic_frames(m)
        n_pics, out = M.mpeg1_decode_frames(M.mpeg1_encode_temporal(frames))
        assert n_pics == 4
        assert [(t, p) for t, p, _ in out] == [
            (0, "I"), (1, "P"), (2, "P"), (3, "P"),
        ]
        for t, (_, _, rgb) in enumerate(out):
            assert np.array_equal(rgb, frames[t]), f"m={m} frame {t}"


def test_temporal_static_video_all_skipped():
    """A static video of intra-exact content (per-MB constants): the
    reconstruction equals the source, so every P macroblock except the
    slice ends is SKIPPED — the stream shrinks to near the I-frame size
    and decodes to identical frames. (With lossy content the encoder
    would instead keep refining the residual toward the source, which is
    correct closed-loop behavior but not an exact repeat.)"""
    base = _mosaic_frames(42, n=1)[0]
    frames = [base.copy() for _ in range(4)]
    bits = M.mpeg1_encode_temporal(frames, candidates=((0, 0),))
    n_pics, out = M.mpeg1_decode_frames(bits)
    assert n_pics == 4 and len(out) == 4
    first = out[0][2]
    for _, ptype, rgb in out[1:]:
        assert ptype == "P"
        assert np.array_equal(rgb, first)  # exact repeat of the recon
    # each P picture costs only headers + the two unskippable slice-end
    # MBs — a few dozen bytes regardless of frame content
    i_only = M.mpeg1_encode_temporal([base])
    assert (len(bits) - len(i_only)) / 3 < 30


def test_temporal_halfpel_prediction_exact():
    """frame0 is intra-EXACT (per-8x8-block constants), frame1 is its
    half-pel interpolation computed with the spec's round-away-from-zero
    averaging (edge macroblocks repeat frame0 so the (0,0) fallback
    stays exact there): MC at (dy, dx) = (1, 1) predicts the interior
    bit-exactly, so the whole P frame decodes with zero residual."""
    rng = np.random.default_rng(9)
    vals = rng.integers(10, 246, (6, 6), dtype=np.int64)
    y0 = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 48x48, 8x8-flat
    interp = np.empty_like(y0)
    interp[:-1, :-1] = (
        y0[:-1, :-1] + y0[1:, :-1] + y0[:-1, 1:] + y0[1:, 1:] + 2
    ) >> 2
    y1 = y0.copy()
    y1[:32, :32] = interp[:32, :32]  # interior MBs; last MB row/col repeat
    f0 = np.repeat(y0[:, :, None], 3, axis=2).astype(np.uint8)
    f1 = np.repeat(y1[:, :, None], 3, axis=2).astype(np.uint8)
    bits = M.mpeg1_encode_temporal(
        [f0, f1], candidates=((1, 1), (0, 0)), intra_threshold=255.0
    )
    _, out = M.mpeg1_decode_frames(bits)
    assert np.array_equal(out[0][2], f0)  # intra-exact reference
    assert np.array_equal(out[1][2], f1)  # half-pel MC bit-exact


def test_temporal_lossy_general_content_psnr():
    """Natural-ish moving content through the full lossy path: decode
    must track the source within normal codec error."""
    rng = np.random.default_rng(4)
    lowres = rng.integers(40, 216, (6, 8, 3))
    base = np.repeat(np.repeat(lowres, 8, axis=0), 8, axis=1)  # smooth-ish
    base = base.astype(np.uint8)
    frames = [base]
    for t in range(3):
        nxt = np.roll(frames[-1], 16, axis=1)  # global 16-px shift right
        nxt[:, :16] = (60 + 40 * t)
        frames.append(nxt)
    bits = M.mpeg1_encode_temporal(frames, candidates=((0, 0), (0, -32)))
    n_pics, out = M.mpeg1_decode_frames(bits)
    assert n_pics == 4 and len(out) == 4
    for t, (_, _, rgb) in enumerate(out):
        err = rgb.astype(np.float64) - frames[t].astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
        assert psnr > 28.0, f"frame {t}: psnr {psnr:.1f}"


def test_iframe_decoder_skips_p_payloads_of_temporal_stream():
    """The round-8 keyframe sampler on a round-9 motion stream: all 4
    pictures counted, only the I frame decoded."""
    frames = _mosaic_frames(7)
    bits = M.mpeg1_encode_temporal(frames)
    n_pics, iframes = M.mpeg1_decode_iframes(bits)
    assert n_pics == 4
    assert len(iframes) == 1 and iframes[0][0] == 0
    assert np.array_equal(iframes[0][1], frames[0])


def test_nonintra_dequant_properties():
    """§2.4.4.2: truncation toward zero, oddification, sign symmetry."""
    for q in (1, 8, 16, 31):
        for w in (16, 24):
            for level in range(-40, 41):
                v = M._dequant_nonintra(level, q, w)
                if level == 0:
                    assert v == 0
                elif abs(v) < 2047:  # below the asymmetric 12-bit clamp
                    assert v == -M._dequant_nonintra(-level, q, w)
                    assert v % 2 != 0  # odd after mismatch control


# ---------------------------------------------------------------------------
# B-pictures / bidirectional prediction (round 9)
# ---------------------------------------------------------------------------


def _bidi_frames(m: int, mbw: int = 4, mbh: int = 3) -> list:
    """The q_multimodal_mpeg_bframes fixture: display order [I, B, P]
    where P = I + 9 everywhere (no-MC coded, odd delta exact at qscale
    8); the B frame's row 0 forward-copies the I anchor, row 1
    backward-copies the P anchor, row 2 is the interpolated average
    ((v + v+9 + 1) >> 1 = v+5) — every prediction direction bit-exact."""
    d7 = (m % 256) * 7

    def mosaic(vals):
        f = np.zeros((mbh * 16, mbw * 16, 3), dtype=np.uint8)
        for i in range(mbh):
            for j in range(mbw):
                f[16 * i : 16 * i + 16, 16 * j : 16 * j + 16, :] = vals[i][j]
        return f

    v0 = [[(d7 + 29 * (4 * i + j)) % 200 for j in range(4)] for i in range(3)]
    v2 = [[v0[i][j] + 9 for j in range(4)] for i in range(3)]
    v1 = [
        [v0[0][j] for j in range(4)],
        [v2[1][j] for j in range(4)],
        [v0[2][j] + 5 for j in range(4)],
    ]
    return [mosaic(v0), mosaic(v1), mosaic(v2)]


def test_b_vlc_table_prefix_free():
    codes = list(M._MB_TYPE_B.values())
    assert len(codes) == len(set(codes))
    assert not _prefix_free(codes)


def test_bidi_mosaic_bit_exact():
    for m in (0, 55, 123, 255):
        frames = _bidi_frames(m)
        n, out = M.mpeg1_decode_frames(M.mpeg1_encode_bidi(frames))
        assert n == 3
        got = {t: (p, rgb) for t, p, rgb in out}
        assert [got[t][0] for t in (0, 1, 2)] == ["I", "B", "P"]
        for t in (0, 1, 2):
            assert np.array_equal(got[t][1], frames[t]), f"m={m} t={t}"


def test_b_skip_repeats_previous_prediction():
    """Mid-row macroblocks repeating the previous mode/vectors with zero
    residual are SKIPPED — the B stream stays near header-sized and the
    skip reconstruction (repeat mode, not zero-motion-forward) is what
    makes the backward row decode correctly."""
    frames = _bidi_frames(7)
    bits = M.mpeg1_encode_bidi(frames)
    # size budget: the B picture carries ~1 explicit MB per mode change
    # plus slice-edge MBs — if the skip emission regressed (every MB
    # coded explicitly), the B payload balloons past the I payload
    pics = []
    pos = 0
    while True:
        c, nxt = M._next_start(bits, pos)
        if c < 0:
            break
        if c == M.PIC_START:
            pics.append(nxt - 4)
        elif c == M.SEQ_END:
            pics.append(nxt - 4)
        pos = nxt
    assert len(pics) == 4  # I, P, B, sequence end
    b_size = pics[3] - pics[2]
    # measured: ~19 bytes with skips (headers + one explicit MB per
    # mode change + slice edges); without skips every MB is explicit
    # (~12 x 2.5 bytes + headers > 40) — 30 discriminates cleanly
    assert b_size < 30, b_size
    n, out = M.mpeg1_decode_frames(bits)
    assert [p for _, p, _ in sorted(out)] == ["I", "B", "P"]
    # decoding via the keyframe sampler must skip BOTH predicted kinds
    n2, iframes = M.mpeg1_decode_iframes(bits)
    assert n2 == 3 and len(iframes) == 1 and iframes[0][0] == 0


def test_b_without_anchors_skipped_gracefully():
    """Round-9 review: a B-picture arriving before both anchors (open
    -GOP entry, truncated stream head) is SKIPPED unparsed — the round-8
    boundary — never an abort losing the decodable I/P frames."""
    frames = _bidi_frames(3)
    bits = M.mpeg1_encode_bidi(frames)
    b_at = bits.find(b"\x00\x00\x01\x00", 20)          # first picture (I)
    p2 = bits.find(b"\x00\x00\x01\x00", b_at + 4)      # second picture (P)
    b3 = bits.find(b"\x00\x00\x01\x00", p2 + 4)        # third picture (B)
    spliced = bits[:b_at] + bits[b3:]  # stream starts at the B picture
    n, out = M.mpeg1_decode_frames(spliced)
    assert n == 1 and out == []  # B skipped; nothing decodable remains
    # and a stream entered at the P picture: P aborts (no reference),
    # which the caller-level degrade handles — but I+B alone keeps the I
    spliced2 = bits[:p2] + bits[b3:]  # I then B (P removed): B needs 2
    n2, out2 = M.mpeg1_decode_frames(spliced2)
    assert n2 == 2 and [p for _, p, _ in out2] == ["I"]


# ---------------------------------------------------------------------------
# round 15: the per-coefficient quantize loops were vectorized and the
# closed-loop reconstruction stopped re-reading the bitstream. Pin the
# vectorized forms to the scalar reference semantics.
# ---------------------------------------------------------------------------


def test_vectorized_quant_mb_residual_matches_scalar_form():
    """_quant_mb_residual (one batched DCT over all 6 blocks) must emit
    exactly the per-block _quant_nonintra entries, in cbp order."""
    rng = np.random.default_rng(1501)
    for qscale in (1, 8, 31):
        y = rng.uniform(-256, 256, size=(16, 16))
        cb = rng.uniform(-256, 256, size=(8, 8))
        cr = rng.uniform(-256, 256, size=(8, 8))
        nqmat = M.DEFAULT_NONINTRA_Q
        got = M._quant_mb_residual([y, cb, cr], qscale, nqmat)
        want = [
            M._quant_nonintra(y[0:8, 0:8], qscale, nqmat),
            M._quant_nonintra(y[0:8, 8:16], qscale, nqmat),
            M._quant_nonintra(y[8:16, 0:8], qscale, nqmat),
            M._quant_nonintra(y[8:16, 8:16], qscale, nqmat),
            M._quant_nonintra(cb, qscale, nqmat),
            M._quant_nonintra(cr, qscale, nqmat),
        ]
        assert got == want


def test_intra_recon_matches_bitstream_redecode():
    """_encode_intra_block_recon dequantizes the EMITTED levels directly;
    that must equal decoding the bits it just wrote (the pre-round-15
    implementation), including DC prediction and the ±2048 clamp."""
    from rpa_etl_spark.sources.mpeg1 import (
        _Bits,
        _Reader,
        _decode_intra_block,
        _encode_intra_block_recon,
    )

    rng = np.random.default_rng(1502)
    qmat = M.DEFAULT_INTRA_Q
    for qscale in (1, 8, 31):
        pred = 128
        bs = _Bits()
        marks = []
        blocks = [rng.uniform(0, 256, size=(8, 8)) for _ in range(8)]
        recons = []
        for blk in blocks:
            marks.append(len(bs.buf) * 8 + bs.n)
            pred, recon = _encode_intra_block_recon(
                bs, blk, pred, qscale, True, qmat
            )
            recons.append(recon)
        bs.align()
        data = bs.bytes()
        r = _Reader(data, marks[0])
        pred2 = 128
        for blk_recon in recons:
            dec, pred2 = _decode_intra_block(r, pred2, qscale, True, qmat)
            assert np.array_equal(dec, blk_recon)
