"""Pure-numpy WAV/PCM16 codec: format pinned by a hand-built byte fixture
(so an encode/decode bug can't cancel itself out via round-trip), chunk
walking pinned by a fixture with an interleaved LIST chunk, and the Spark
decode stage by the q_multimodal_audio oracle (tests/test_oracle_parity.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rpa_etl_spark.sources.multimodal import (
    synth_wav_audio,
    wav_decode,
    wav_encode,
)

# Hand-built 4-sample 8 kHz mono PCM16 WAV (spec-derived, not produced by
# our encoder): samples 100, -100, 32767, -32768 little-endian.
_FIXTURE_SAMPLES = np.array([100, -100, 32767, -32768], dtype=np.int16)
_FIXTURE_BYTES = (
    struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 8, b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
        b"data", 8,
    )
    + bytes([100, 0, 156, 255, 255, 127, 0, 128])
)


def test_decode_matches_spec_fixture():
    rate, s = wav_decode(_FIXTURE_BYTES)
    assert rate == 8000
    np.testing.assert_array_equal(s, _FIXTURE_SAMPLES)


def test_encode_matches_spec_fixture():
    assert wav_encode(_FIXTURE_SAMPLES, 8000) == _FIXTURE_BYTES


def test_roundtrip_random_pcm():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=555, dtype=np.int16)
    rate, back = wav_decode(wav_encode(s, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(back, s)


def test_decoder_walks_extra_chunks():
    """A real WAV may carry LIST/fact chunks before data — the decoder
    must walk the chunk list, including odd-size 2-byte alignment."""
    fmt = struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
    fmt += struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd, padded
    pcm = _FIXTURE_SAMPLES.astype("<i2").tobytes()
    fmt += struct.pack("<4sI", b"data", len(pcm)) + pcm
    rate, s = wav_decode(fmt)
    assert rate == 8000
    np.testing.assert_array_equal(s, _FIXTURE_SAMPLES)


@pytest.mark.parametrize(
    "corrupt",
    [
        b"RIFX" + _FIXTURE_BYTES[4:],                      # bad magic
        _FIXTURE_BYTES[:8] + b"AVI " + _FIXTURE_BYTES[12:],  # not WAVE
    ],
)
def test_decode_rejects_non_wav(corrupt):
    with pytest.raises(ValueError):
        wav_decode(bytes(corrupt))


def test_decode_rejects_stereo():
    stereo = bytearray(_FIXTURE_BYTES)
    struct.pack_into("<H", stereo, 22, 2)  # n_channels = 2
    with pytest.raises(ValueError):
        wav_decode(bytes(stereo))


def test_synth_is_deterministic_and_valid():
    a, b = synth_wav_audio(42), synth_wav_audio(42)
    assert a == b
    rate, s = wav_decode(a)
    assert rate == 8000 and len(s) == 256
    # closed form: ((42*31 + 17*i) % 4096) - 2048
    i = np.arange(256, dtype=np.int64)
    np.testing.assert_array_equal(s, (((42 * 31 + 17 * i) % 4096) - 2048).astype(np.int16))


# ---- G.711 companded audio (round 8) ---------------------------------------


def test_g711_perfect_code_reconstruction():
    """compress(expand(c)) == c for every code byte — the strong inverse
    property. Exception: μ-law 0x7F is NEGATIVE ZERO, which decodes to 0
    and canonically re-encodes as 0xFF (G.711 has two zero codes)."""
    import numpy as np

    from rpa_etl_spark.sources import multimodal as MM

    codes = np.arange(256, dtype=np.uint8)
    a_rt = MM.alaw_compress(MM.alaw_expand(codes))
    assert np.array_equal(a_rt, codes)
    mu_rt = MM.mulaw_compress(MM.mulaw_expand(codes))
    assert np.array_equal(mu_rt[codes != 0x7F], codes[codes != 0x7F])
    assert MM.mulaw_expand(np.array([0x7F], np.uint8))[0] == 0
    assert mu_rt[0x7F] == 0xFF


def test_g711_expansion_error_bounded_and_monotone():
    """Over the full int16 range the compand→expand error stays within
    the largest segment's step (truncating quantizer), and expansion is
    monotone in the companded magnitude."""
    import numpy as np

    from rpa_etl_spark.sources import multimodal as MM

    x = np.arange(-32768, 32768, dtype=np.int64)
    for comp, exp in ((MM.mulaw_compress, MM.mulaw_expand),
                      (MM.alaw_compress, MM.alaw_expand)):
        got = exp(comp(x.astype(np.int16))).astype(np.int64)
        assert np.abs(got - x).max() <= 1024  # 8<<7, the top-segment step
        dec = np.sort(exp(np.arange(256, dtype=np.uint8)))
        assert np.all(np.diff(dec) >= 0)


def test_g711_wav_fmt_dispatch():
    """fmt 6/7 containers expand through the right law; fmt tag is
    readable; PCM16 stays on the fmt-1 path."""
    import numpy as np

    from rpa_etl_spark.sources import multimodal as MM

    codes = ((np.arange(64) * 13 + 5) % 256).astype(np.uint8)
    for law, fmt, expand in (("mu", 7, MM.mulaw_expand), ("a", 6, MM.alaw_expand)):
        wav = MM.wav_encode_g711(codes, rate=8000, law=law)
        assert MM.wav_format_tag(wav) == fmt
        rate, s = MM.wav_decode(wav)
        assert rate == 8000 and np.array_equal(s, expand(codes))
    pcm = MM.wav_encode(np.arange(-8, 8, dtype=np.int16))
    assert MM.wav_format_tag(pcm) == 1
