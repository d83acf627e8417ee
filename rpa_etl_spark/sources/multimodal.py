"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal training data: payloads stay as parquet
``binary`` columns (never strings), typed metadata travels alongside in a
struct, and every decode / feature-extract / resize / frame-sample step is
an Arrow-batched ``mapInPandas`` stage so bytes cross the JVM↔Python
boundary once per batch, not per row.

Decode kernels are REAL, dependency-free codecs (numpy + stdlib zlib):
BMP, PNG (DEFLATE + all five filter types), baseline JPEG (DCT +
length-limited Huffman; lossy, bounded-error-gated), WAV/PCM16,
uncompressed AVI, and — round 6 — MJPEG-in-AVI (JPEG-compressed video
frames) — each pinned by spec-fixture unit tests and by oracle-checked
declared queries (q_multimodal_decode/png/audio/frames/mjpeg)
that recompute the expected pixels/samples from the generating formula,
so container-layout bugs cannot round-trip past the comparison. Only the
generic compressed-image fallback (arbitrary formats beyond these five)
stays behind an optional PIL import with a NotImplementedError gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_s", DoubleType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("feature_hash", LongType()),
        StructField("decoder", StringType()),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text corpus: payload = utf-8 bytes of the
    text (deterministic stand-in for real image bytes), metadata derived
    from id. Exercises the binary-column path end to end."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.col(id_col) % 1920 + 1).cast("int").alias("meta_width"),
        (F.col(id_col) % 1080 + 1).cast("int").alias("meta_height"),
        ((F.col(id_col) % 300) / 10.0).alias("meta_duration_s"),
    )


def _decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' kernel. A real deployment would open the
    payload with PIL/ffmpeg here; absent those libs this computes
    deterministic byte-level features (and marks decoder='stub')."""
    try:
        import PIL.Image  # noqa: F401 — not in this container

        decoder = "pil"
    except ImportError:
        decoder = "stub"

    if decoder != "stub":  # pragma: no cover — real decoder not available
        raise NotImplementedError("real image decode requires PIL; container has none")

    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": [len(p) for p in payloads],
                "mean_byte": [
                    (sum(p) / len(p)) if len(p) else 0.0 for p in payloads
                ],
                "feature_hash": [
                    int.from_bytes(p[:8].ljust(8, b"\0"), "big") % (1 << 62)
                    for p in payloads
                ],
                "decoder": decoder,
            }
        )


def extract_image_features(media: DataFrame) -> DataFrame:
    """decode/feature stage: binary in → typed features out, one Arrow batch
    at a time. Filter by mime BEFORE the Python stage so only image bytes
    cross the boundary."""
    return (
        media.where(F.col("mime").startswith("image/"))
        .select("media_id", "payload")
        .mapInPandas(_decode_image_batch, schema=IMAGE_FEATURES_SCHEMA)
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_payload", BinaryType()),
        StructField("method", StringType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """resize stage (1 row → 1 row, payload-transforming): binary in,
    binary out, target dims recorded. REAL for every format this repo
    carries a codec for — the payload's magic bytes pick the codec
    (BMP 'BM', PNG \\x89PNG, JPEG \\xff\\xd8), the pixels go through the
    numpy nearest-neighbor kernel (resize_nearest), and the result is
    re-encoded in the SAME container. Formats without a codec (the
    PIL-class long tail) keep the deterministic byte-slice stand-in,
    tagged method='stub' so a consumer can tell which path ran.
    mapInPandas keeps this one narrow Arrow-batched stage — no shuffle at
    any scale, CPU cost is per-executor."""
    n_out = max(1, width * height // 64)

    def _stub(p: bytes) -> tuple[bytes, str]:
        return ((p or b"\0") * (n_out // max(len(p), 1) + 1))[:n_out], "stub"

    def _resize_one(p: bytes) -> tuple[bytes, str]:
        # magic bytes pick the codec, but a magic match does not guarantee
        # the variant is supported (RGBA/palette/interlaced PNG, 32bpp
        # BMP, progressive JPEG, truncated payloads) — those must DEGRADE
        # to the stub like any codec-less format, not abort the stage
        try:
            if p[:2] == b"BM":
                return (
                    bmp_encode(resize_nearest(bmp_decode(p), width, height)),
                    "numpy-nearest-bmp",
                )
            if p[:8] == b"\x89PNG\r\n\x1a\n":
                return (
                    png_encode(resize_nearest(png_decode(p), width, height)),
                    "numpy-nearest-png",
                )
            if p[:2] == b"\xff\xd8":
                from rpa_etl_spark.sources.jpeg import jpeg_decode, jpeg_encode

                return (
                    jpeg_encode(resize_nearest(jpeg_decode(p), width, height)),
                    "numpy-nearest-jpeg",
                )
        except Exception:
            return _stub(p)
        return _stub(p)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [_resize_one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "resized_payload": [o[0] for o in outs],
                    "method": [o[1] for o in outs],
                }
            )

    return (
        media.where(F.col("mime").startswith("image/"))
        .select("media_id", "payload")
        .mapInPandas(kernel, schema=RESIZED_SCHEMA)
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_s", DoubleType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, fps: float = 0.5) -> DataFrame:
    """frame-sample stage (1 video row → N frame rows): emits one frame per
    1/fps seconds — the mapInPandas batch fans OUT, so the output row count
    differs from the input (the shape a real ffmpeg frame sampler has).
    REAL for uncompressed AVI and MJPEG-in-AVI (magic-byte sniff → RIFF
    walk → DIB or per-frame JPEG decode, sampled against the container's
    true frame rate, each emitted as a BMP payload); other video
    containers keep the deterministic byte-rotation stand-in sized by
    metadata duration."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["meta_duration_s"], pdf["payload"]
            ):
                p = bytes(payload)
                if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                    # the magic check only proves the container; codecs
                    # beyond BI_RGB/MJPG or malformed AVIs (or fps 0 from a
                    # degenerate strh) must degrade to the stub, not abort
                    try:
                        avi_fps, avi_frames = avi_decode(p)
                        if avi_fps <= 0:
                            raise ValueError("degenerate AVI frame rate")
                        step = max(1, round(avi_fps / fps))
                        decoded = [
                            (fidx / avi_fps, bmp_encode(avi_frames[fidx]))
                            for fidx in range(0, len(avi_frames), step)
                        ]
                    except Exception:
                        decoded = None
                    if decoded is not None:
                        for j, (ts_s, frame) in enumerate(decoded):
                            ids.append(mid)
                            idxs.append(j)
                            tss.append(ts_s)
                            frames.append(frame)
                        continue
                n_frames = max(1, int(float(dur) * fps))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i / fps)
                    off = (i * 97) % max(len(p), 1)
                    frames.append(p[off:] + p[:off])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_s": tss,
                    "frame_payload": frames,
                }
            )

    return (
        media.where(F.col("mime").startswith("video/"))
        .select("media_id", "meta_duration_s", "payload")
        .mapInPandas(kernel, schema=FRAMES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Real decode path: uncompressed 24-bit BMP in pure numpy (no image libs).
#
# The stub fallbacks above remain only for formats with no codec in this
# repo (compressed video → ffmpeg-class); BMP/PNG/JPEG/WAV/AVI are real:
# BMP v3 BI_RGB is simple enough to implement from the public spec:
# format pinned by a hand-built byte fixture in tests, correctness pinned by
# the q_multimodal_decode oracle (DuckDB recomputes the layout-sensitive
# pixel checksum from the closed-form pattern, so a row-order/padding bug
# in either codec half cannot round-trip its way past the check).
# ---------------------------------------------------------------------------

import struct

import numpy as np

BMP_HEADER_SIZE = 54


def bmp_encode(arr: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 RGB → BMP v3 (BI_RGB, bottom-up, BGR, 4-byte row
    padding)."""
    h, w, _ = arr.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    img_size = (row_raw + pad) * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", BMP_HEADER_SIZE + img_size, 0, 0, BMP_HEADER_SIZE,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if pad:
        rows = np.zeros((h, row_raw + pad), dtype=np.uint8)
        rows[:, :row_raw] = bgr.reshape(h, row_raw)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def bmp_decode(data: bytes) -> "np.ndarray":
    """BMP v3 (24-bit BI_RGB) → (H, W, 3) uint8 RGB. Raises ValueError on
    anything else — compressed formats go through the PIL-gated path."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flipped else rgb


def resize_nearest(arr: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resample via index striding — the exact kernel a
    real image pipeline uses for cheap thumbnailing; pure numpy."""
    h, w, _ = arr.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def synth_bmp_image(media_id: int, width: int = 16, height: int = 16) -> bytes:
    """Deterministic RGB gradient keyed by id: channel c of pixel (r, x) =
    (media_id + 7*r + 11*x + 83*c) % 256 — the closed form the DuckDB
    oracle recomputes."""
    r = np.arange(height).reshape(-1, 1, 1)
    x = np.arange(width).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    arr = ((media_id + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
    return bmp_encode(arr)


def attach_bmp_media(df: DataFrame, id_col: str = "doc_id",
                     width: int = 16, height: int = 16) -> DataFrame:
    """Media table with REAL image payloads: one synthetic BMP per row."""
    return _attach_media(
        df, lambda m: synth_bmp_image(m, width, height), id_col
    )


BMP_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_rgb", DoubleType()),
        StructField("weighted_checksum", LongType()),
        StructField("decoder", StringType()),
    ]
)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """REAL decode stage: parse the BMP container, return dimensions, mean
    intensity, and a position-weighted checksum
    Σ value(r,x,c) · (r·W·3 + x·3 + c + 1) — sensitive to row order,
    channel order, and padding, so any layout bug in the codec shows up as
    an oracle mismatch, not just a round-trip identity."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, means, cks = [], [], [], []
            for payload in pdf["payload"]:
                arr = bmp_decode(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                flat = arr.reshape(-1)
                ws.append(w)
                hs.append(h)
                # exact integer sum ÷ exact integer size: one IEEE division,
                # bit-identical across engines (no rounding-mode dependence)
                means.append(int(flat.sum()) / flat.size)
                cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "mean_rgb": means,
                    "weighted_checksum": cks,
                    "decoder": "numpy-bmp",
                }
            )

    return media.mapInPandas(kernel, schema=BMP_FEATURES_SCHEMA)


def resize_bmp(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL resize stage: decode → nearest-neighbor resample → re-encode.
    Output payloads are valid BMPs of the target size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_payload": [
                        bmp_encode(
                            resize_nearest(bmp_decode(bytes(p)), out_w, out_h)
                        )
                        for p in pdf["payload"]
                    ],
                    "method": "nearest",
                }
            )

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio codec: WAV / PCM16 (RIFF is a pure container format — encoder
# and decoder below are complete, dependency-free implementations, the
# audio analog of the numpy BMP codec above)
# ---------------------------------------------------------------------------

WAV_HEADER_SIZE = 44


def wav_encode(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """int16 mono PCM → canonical 44-byte RIFF/WAVE container."""
    pcm = samples.astype("<i2").tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return header + pcm


def wav_decode(data: bytes) -> tuple[int, "np.ndarray"]:
    """RIFF/WAVE mono → (sample_rate, int16 samples). PCM16 (fmt 1),
    A-law (fmt 6), and μ-law (fmt 7, both G.711-expanded to int16 —
    round 8). Walks the chunk list (a real WAV may carry LIST/fact
    chunks before data); raises ValueError on other encodings or
    multi-channel payloads."""
    _, rate, samples = wav_decode_full(data)
    return rate, samples


def wav_decode_full(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """Like :func:`wav_decode` but also returns the fmt tag — one chunk
    walk for callers that need both (round-8 review)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_channels, bps, fmt_tag = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, n_channels, rate = struct.unpack_from("<HHI", data, body)
            bps = struct.unpack_from("<H", data, body + 14)[0]
            if fmt_tag not in (1, 6, 7):
                raise ValueError(f"unsupported WAV encoding (fmt={fmt_tag})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            want_bps = 16 if fmt_tag == 1 else 8
            if n_channels != 1 or bps != want_bps:
                raise ValueError(
                    f"unsupported layout (channels={n_channels}, bps={bps})"
                )
            if fmt_tag == 1:
                samples = np.frombuffer(
                    data, dtype="<i2", count=size // 2, offset=body
                )
            else:
                codes = np.frombuffer(data, dtype=np.uint8, count=size, offset=body)
                samples = (
                    alaw_expand(codes) if fmt_tag == 6 else mulaw_expand(codes)
                )
            return fmt_tag, rate, samples
        pos = body + size + (size & 1)  # RIFF chunks are 2-byte aligned
    raise ValueError("no data chunk")


def synth_wav_audio(media_id: int, n_samples: int = 256, rate: int = 8000) -> bytes:
    """Deterministic PCM ramp keyed by id: sample i =
    ((media_id*31 + i*17) % 4096) − 2048 — the closed form the DuckDB
    oracle recomputes."""
    i = np.arange(n_samples, dtype=np.int64)
    samples = ((media_id * 31 + i * 17) % 4096) - 2048
    return wav_encode(samples.astype(np.int16), rate)


def attach_wav_media(df: DataFrame, id_col: str = "doc_id",
                     n_samples: int = 256, rate: int = 8000) -> DataFrame:
    """Media table with REAL audio payloads: one synthetic WAV per row."""
    return _attach_media(
        df, lambda m: synth_wav_audio(m, n_samples, rate), id_col
    )


WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_us", LongType()),
        StructField("energy", LongType()),
        StructField("weighted_checksum", LongType()),
        StructField("decoder", StringType()),
    ]
)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """REAL audio decode stage: parse the RIFF container, return sample
    rate, length, exact duration in µs, signal energy Σ s_i², and the
    position-weighted checksum Σ s_i·(i+1) — sensitive to byte order,
    chunk offsets, and sign handling, so a codec layout bug becomes an
    oracle mismatch. All-integer features: engine-neutral by
    construction."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, ns, durs, energies, cks = [], [], [], [], []
            for payload in pdf["payload"]:
                rate, s = wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                rates.append(rate)
                ns.append(len(s))
                durs.append(len(s) * 1_000_000 // rate)
                energies.append(int((s64 * s64).sum()))
                cks.append(int((s64 * (np.arange(len(s64)) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_samples": ns,
                    "duration_us": durs,
                    "energy": energies,
                    "weighted_checksum": cks,
                    "decoder": "numpy-wav",
                }
            )

    return media.mapInPandas(kernel, schema=WAV_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video codec: uncompressed AVI (RIFF container, DIB '00db' frames) —
# the video analog of the BMP/WAV codecs. Minimal but spec-conformant:
# hdrl (avih + strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) + movi.
# ---------------------------------------------------------------------------


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return struct.pack("<4sI4s", b"LIST", 4 + len(body), list_type) + body


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def avi_encode(frames: list, fps: int = 10) -> bytes:
    """List of (H, W, 3) uint8 RGB frames → uncompressed AVI. Frames are
    stored as bottom-up BGR DIBs ('00db' chunks), the same pixel layout as
    BMP minus the file header."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) // 4 * 4
    frame_size = stride * h

    def dib(arr: "np.ndarray") -> bytes:
        bgr = arr[::-1, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    avih = struct.pack(
        "<4sI14I",
        b"avih", 56,
        1_000_000 // fps, frame_size * fps, 0, 0x10, len(frames), 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIII4H",
        b"strh", 56, b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_size, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf", 40, 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0,
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def avi_decode(data: bytes) -> tuple[int, list]:
    """AVI → (fps, [(H, W, 3) uint8 RGB frames]). Walks the RIFF tree:
    strf gives dimensions/bpp/compression, movi's 00db/00dc chunks carry
    either bottom-up BGR DIBs (BI_RGB) or — round 6 — whole baseline JPEG
    images (MJPG fourcc, decoded with the repo's pure-numpy JPEG codec,
    sources/jpeg.py). Raises ValueError on other compressions."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    fps = 0
    mjpeg = False
    frames: list = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps, mjpeg
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", data, pos)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"strh":
                scale, rate = struct.unpack_from("<II", data, body + 20)
                fps = rate // max(scale, 1)
            elif cid == b"strf":
                bi_w, bi_h = struct.unpack_from("<ii", data, body + 4)
                bpp = struct.unpack_from("<H", data, body + 14)[0]
                comp = struct.unpack_from("<I", data, body + 16)[0]
                if comp == _MJPG_FOURCC:
                    mjpeg = True
                elif bpp != 24 or comp != 0:
                    raise ValueError(f"unsupported AVI stream (bpp={bpp}, comp={comp})")
                w, h = bi_w, abs(bi_h)
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                if mjpeg:
                    from rpa_etl_spark.sources.jpeg import jpeg_decode

                    frames.append(jpeg_decode(data[body : body + size]))
                else:
                    stride = (w * 3 + 3) // 4 * 4
                    rows = np.frombuffer(
                        data, dtype=np.uint8, count=stride * h, offset=body
                    )
                    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    frames.append(bgr[:, :, ::-1][::-1])
            pos = body + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    return fps, frames


def mjpeg_avi_encode(frames: list, fps: int = 10) -> bytes:
    """List of (H, W, 3) uint8 RGB frames → MJPEG-in-AVI: same RIFF layout
    as ``avi_encode`` but biCompression='MJPG' and each 00dc chunk is a
    complete baseline JPEG (sources/jpeg.py::jpeg_encode)."""
    from rpa_etl_spark.sources.jpeg import jpeg_encode

    h, w, _ = frames[0].shape
    payloads = [jpeg_encode(f) for f in frames]
    max_size = max(len(p) for p in payloads)
    avih = struct.pack(
        "<4sI14I",
        b"avih", 56,
        1_000_000 // fps, max_size * fps, 0, 0x10, len(frames), 0, 1,
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIII4H",
        b"strh", 56, b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max_size, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf", 40, 40, w, h, 1, 24, _MJPG_FOURCC, max_size, 2835, 2835, 0, 0,
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def synth_avi_video(media_id: int, n_frames: int = 6, width: int = 8,
                    height: int = 8, fps: int = 10) -> bytes:
    """Deterministic video keyed by id: frame f, pixel (r, x), channel c =
    (media_id + 5*f + 7*r + 11*x + 83*c) % 256 — the closed form the
    DuckDB oracle recomputes."""
    r = np.arange(height).reshape(-1, 1, 1)
    x = np.arange(width).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    frames = [
        ((media_id + 5 * f + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]
    return avi_encode(frames, fps)


def attach_avi_media(df: DataFrame, id_col: str = "doc_id",
                     n_frames: int = 6, width: int = 8, height: int = 8) -> DataFrame:
    """Media table with REAL video payloads: one synthetic AVI per row."""
    return _attach_media(
        df, lambda m: synth_avi_video(m, n_frames, width, height), id_col
    )


def synth_mjpeg_video(media_id: int, n_frames: int = 6, width: int = 8,
                      height: int = 8, fps: int = 10) -> bytes:
    """Deterministic MJPEG-in-AVI keyed by id: frame f is SOLID GRAY with
    value (media_id + 37*f) % 256 — chosen because every solid gray
    round-trips the baseline JPEG codec EXACTLY (constant block → DC-only
    DCT, verified for all 256 values in tests), so the closed-form oracle
    survives the lossy codec."""
    frames = []
    for f in range(n_frames):
        v = (media_id + 37 * f) % 256
        frames.append(np.full((height, width, 3), v, dtype=np.uint8))
    return mjpeg_avi_encode(frames, fps)


def attach_mjpeg_media(df: DataFrame, id_col: str = "doc_id",
                       n_frames: int = 6, width: int = 8, height: int = 8) -> DataFrame:
    """Media table with REAL compressed-video payloads: one synthetic
    MJPEG-AVI per row (JPEG encode is CPU-bound → spread first)."""
    return _attach_media(
        df, lambda m: synth_mjpeg_video(m, n_frames, width, height), id_col
    )


AVI_FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_rgb", DoubleType()),
        StructField("weighted_checksum", LongType()),
        StructField("decoder", StringType()),
    ]
)


def sample_avi_frames(media: DataFrame, every: int = 2,
                      decoder: str = "numpy-avi") -> DataFrame:
    """REAL frame sampling (1 video row → N frame rows): parse the AVI
    container, keep every ``every``-th frame, and emit per-frame features
    (the same mean/position-weighted checksum as the BMP path, so layout
    bugs surface as oracle mismatches). The fan-out happens inside one
    Arrow batch — no shuffle; at 100 TB sampling runs at scan speed and
    downstream sees only the kept frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ws, hs, means, cks = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, frames = avi_decode(bytes(payload))
                for f in range(0, len(frames), every):
                    arr = frames[f].astype(np.int64)
                    h, w, _ = arr.shape
                    flat = arr.reshape(-1)
                    ids.append(mid)
                    fids.append(f)
                    ws.append(w)
                    hs.append(h)
                    means.append(int(flat.sum()) / flat.size)
                    cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_id": fids,
                    "width": ws,
                    "height": hs,
                    "mean_rgb": means,
                    "weighted_checksum": cks,
                    "decoder": decoder,
                }
            )

    return media.mapInPandas(kernel, schema=AVI_FRAME_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL compressed-image codec: PNG (8-bit RGB). DEFLATE comes from the
# Python standard library's zlib, so unlike JPEG this needs no third-party
# dependency — the decoder implements the actual PNG spec: chunk walk with
# CRC verification, IDAT inflate, and all five scanline filters.
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(arr: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 RGB → PNG (color type 2, bit depth 8, filter 0
    scanlines, one zlib-compressed IDAT)."""
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: "np.ndarray", h: int, w: int) -> "np.ndarray":
    """Reverse PNG scanline filtering (types 0-4) for 8-bit RGB."""
    bpp = 3
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ftype = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-to-right recurrence
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:  # Sub
                    recon[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    recon[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    recon[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = recon.astype(np.uint8)
    return out.reshape(h, w, bpp)


def png_decode(data: bytes) -> "np.ndarray":
    """PNG (8-bit RGB, non-interlaced) → (H, W, 3) uint8. Verifies chunk
    CRCs, concatenates IDATs, inflates, reverses all five filter types.
    Raises ValueError on other color types / bit depths / interlacing."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(data):
        size, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", data, pos + 8 + size)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, ctype_v, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype_v != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype_v}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _png_unfilter(raw, h, w)


def synth_png_image(media_id: int, width: int = 16, height: int = 16) -> bytes:
    """Same closed-form gradient as synth_bmp_image, PNG-encoded — so the
    compressed-format decode query reuses the identical oracle formula."""
    r = np.arange(height).reshape(-1, 1, 1)
    x = np.arange(width).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    arr = ((media_id + 7 * r + 11 * x + 83 * c) % 256).astype(np.uint8)
    return png_encode(arr)


def attach_png_media(df: DataFrame, id_col: str = "doc_id",
                     width: int = 16, height: int = 16) -> DataFrame:
    """Media table with REAL compressed-image payloads (PNG per row)."""
    return _attach_media(
        df, lambda m: synth_png_image(m, width, height), id_col
    )


def decode_png_features(media: DataFrame) -> DataFrame:
    """REAL compressed decode stage: inflate + unfilter the PNG, emit the
    same feature schema as the BMP path (decoder tag 'numpy-png')."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, means, cks = [], [], [], []
            for payload in pdf["payload"]:
                arr = png_decode(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                flat = arr.reshape(-1)
                ws.append(w)
                hs.append(h)
                means.append(int(flat.sum()) / flat.size)
                cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "mean_rgb": means,
                    "weighted_checksum": cks,
                    "decoder": "numpy-png",
                }
            )

    return media.mapInPandas(kernel, schema=BMP_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL temporal codec: MPEG-1 video (intra path) — sources/mpeg1.py. The
# keyframe-sampling use case the "temporal codec" boundary used to stub:
# a genuine I/P elementary stream per row, I-frames decoded through the
# full intra toolchain (Table B.5 VLCs, dequant + mismatch control, IDCT,
# 4:2:0, YCbCr), P payloads skipped by start-code scan — never parsed.
# Motion compensation stays out of scope (README capability table).
# ---------------------------------------------------------------------------


def synth_mpeg1_video(media_id: int, n_frames: int = 6, width: int = 16,
                      height: int = 16) -> bytes:
    """Deterministic MPEG-1 stream keyed by id: frame f is SOLID GRAY with
    value (media_id + 37*f) % 256 — the same closed form as the MJPEG
    fixture, chosen because a constant block is DC-only through the DCT so
    the intra path reproduces it EXACTLY (pinned for all 256 values in
    tests) and the analytic oracle survives the lossy codec. Even frames
    are I-pictures; odd frames are zero-motion P-pictures."""
    from rpa_etl_spark.sources.mpeg1 import mpeg1_encode

    frames = [
        np.full((height, width, 3), (media_id + 37 * f) % 256, dtype=np.uint8)
        for f in range(n_frames)
    ]
    return mpeg1_encode(frames, gop=2)


def attach_mpeg1_media(df: DataFrame, id_col: str = "doc_id",
                       n_frames: int = 6, width: int = 16,
                       height: int = 16) -> DataFrame:
    """Media table with REAL MPEG-1 payloads: one synthetic elementary
    stream per row (DCT encode is CPU-bound → spread first)."""
    return _attach_media(
        df, lambda m: synth_mpeg1_video(m, n_frames, width, height), id_col
    )


def sample_mpeg1_iframes(media: DataFrame,
                         decoder: str = "numpy-mpeg1") -> DataFrame:
    """I-FRAME extraction (1 stream row → one row per keyframe): walk the
    elementary stream's start codes, decode INTRA pictures only (P/B
    payloads are skipped unparsed — the point of keyframe sampling), and
    emit the same per-frame features as the other video paths. frame_id is
    the picture's temporal_reference. Fan-out happens inside one Arrow
    batch — no shuffle; at 100 TB this runs at scan speed and downstream
    sees only the keyframes."""
    from rpa_etl_spark.sources.mpeg1 import mpeg1_decode_iframes

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ws, hs, means, cks = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, frames = mpeg1_decode_iframes(bytes(payload))
                for tref, arr in frames:
                    arr = arr.astype(np.int64)
                    h, w, _ = arr.shape
                    flat = arr.reshape(-1)
                    ids.append(mid)
                    fids.append(tref)
                    ws.append(w)
                    hs.append(h)
                    means.append(int(flat.sum()) / flat.size)
                    cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_id": fids,
                    "width": ws,
                    "height": hs,
                    "mean_rgb": means,
                    "weighted_checksum": cks,
                    "decoder": decoder,
                }
            )

    return media.mapInPandas(kernel, schema=AVI_FRAME_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T): μ-law (WAVE fmt 7) and A-law (fmt 6) —
# the telephony formats call-center/voice corpora actually arrive in.
# Expansion (decode) is the ground-truth integer formula; compression
# (encode) is its segment-wise inverse. Both are table-free closed forms,
# so the DuckDB oracle recomputes the EXPANSION in SQL bit-for-bit and a
# sign/segment/complement bug cannot round-trip past the comparison.
# Perfect-code-reconstruction (encode(decode(c)) == c for all 256 codes)
# and bounded expansion error over the full int16 range are test-pinned.
# ---------------------------------------------------------------------------


def mulaw_expand(codes: "np.ndarray") -> "np.ndarray":
    """μ-law code bytes (uint8) → int16 samples (ITU-T G.711 §A.1):
    u = ~c; magnitude = ((man·8 + 0x84) << exp) − 0x84; sign bit 0x80."""
    u = (~codes.astype(np.int64)) & 0xFF
    exp = (u >> 4) & 7
    man = u & 15
    mag = (((man << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_expand(codes: "np.ndarray") -> "np.ndarray":
    """A-law code bytes (uint8) → int16 samples (G.711 §A.2): a = c ^ 0x55;
    segment 0 is linear (man·16 + 8), segments 1-7 add the 0x108 offset;
    sign bit 0x80 SET means positive (A-law convention)."""
    a = codes.astype(np.int64) ^ 0x55
    t = a & 0x7F
    exp = t >> 4
    man = t & 15
    mag = np.where(exp == 0, (man << 4) + 8, ((man << 4) + 0x108) << (exp - 1))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def mulaw_compress(samples: "np.ndarray") -> "np.ndarray":
    """int16 → μ-law code bytes: bias 0x84, clip 32635, complemented."""
    x = samples.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int64)) - 7
    man = (mag >> (exp + 3)) & 15
    return ((~(sign | (exp << 4) | man)) & 0xFF).astype(np.uint8)


def alaw_compress(samples: "np.ndarray") -> "np.ndarray":
    """int16 → A-law code bytes: segment-wise inverse of alaw_expand."""
    x = samples.astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exp = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 7, 0)
    man = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 15)
    return (((sign | (exp << 4) | man)) ^ 0x55).astype(np.uint8)


def wav_encode_g711(codes: "np.ndarray", rate: int = 8000, law: str = "mu") -> bytes:
    """G.711 code bytes → RIFF/WAVE container (fmt 7 = μ-law, 6 = A-law,
    8 bits/sample, mono)."""
    fmt_tag = 7 if law == "mu" else 6
    body = codes.astype(np.uint8).tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, fmt_tag, 1, rate, rate, 1, 8,
        b"data", len(body),
    )
    return header + body


def synth_g711_audio(media_id: int, n_samples: int = 256, rate: int = 8000) -> bytes:
    """Deterministic G.711 WAV keyed by id: code byte i =
    (media_id*7 + i*13) % 256, μ-law on even ids, A-law on odd — the
    closed form the DuckDB oracle expands arithmetically."""
    i = np.arange(n_samples, dtype=np.int64)
    codes = ((media_id * 7 + i * 13) % 256).astype(np.uint8)
    return wav_encode_g711(codes, rate, law="mu" if media_id % 2 == 0 else "a")


def attach_g711_media(df: DataFrame, id_col: str = "doc_id",
                      n_samples: int = 256) -> DataFrame:
    """Media table with REAL telephony-audio payloads (G.711-in-WAV)."""
    return _attach_media(
        df, lambda m: synth_g711_audio(m, n_samples), id_col
    )


def wav_format_tag(data: bytes) -> int:
    """The RIFF fmt chunk's wFormatTag (1 PCM, 6 A-law, 7 μ-law)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            return struct.unpack_from("<H", data, pos + 8)[0]
        pos = pos + 8 + size + (size & 1)
    raise ValueError("no fmt chunk")


def decode_g711_features(media: DataFrame) -> DataFrame:
    """G.711 decode stage: parse the container, EXPAND the companded
    codes to int16 (mulaw_expand/alaw_expand via wav_decode), and emit
    the same integer features as the PCM path plus the law actually
    declared by the container's fmt tag — so a companding-formula or
    fmt-dispatch bug becomes an oracle mismatch."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("law", StringType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("duration_us", LongType()),
            StructField("energy", LongType()),
            StructField("weighted_checksum", LongType()),
            StructField("decoder", StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            laws, rates, ns, durs, energies, cks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                fmt, rate, s = wav_decode_full(raw)
                s64 = s.astype(np.int64)
                laws.append("mu" if fmt == 7 else "a")
                rates.append(rate)
                ns.append(len(s))
                durs.append(len(s) * 1_000_000 // rate)
                energies.append(int((s64 * s64).sum()))
                cks.append(int((s64 * (np.arange(len(s64)) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "law": laws,
                    "sample_rate": rates,
                    "n_samples": ns,
                    "duration_us": durs,
                    "energy": energies,
                    "weighted_checksum": cks,
                    "decoder": "numpy-g711",
                }
            )

    return media.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# REAL legacy-web image codec: GIF87a/89a (round 8) — the remaining
# entropy-coded image format web-scrape corpora actually carry. The LZW
# here is the GIF dialect (LSB-first bit packing, variable 3..12-bit
# codes, CLEAR/EOI, 255-byte sub-blocks) — a different wire format from
# the PDF LZWDecode filter in sources/minipdf.py (MSB-first, early-change).
# Decoder handles global/local color tables, 89a extension blocks, and
# 4-pass interlacing; encoder emits spec-conformant streams (optionally
# interlaced) so round-trips exercise the real parse path.
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-dialect LZW over a flat index sequence."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return {(i,): i for i in range(1 << min_code_size)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    w: tuple = ()
    for px in indices.reshape(-1).tolist():
        wc = w + (px,)
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        w = (px,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "np.ndarray":
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = nbits = 0
    width = min_code_size + 1
    table: list[tuple] = [(i,) for i in range(1 << min_code_size)] + [(), ()]
    out: list = []
    prev: tuple | None = None

    def read() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: stop cleanly
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while len(out) < n_pixels:
        code = read()
        if code == clear:
            table = [(i,) for i in range(1 << min_code_size)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    arr = np.asarray(out[:n_pixels], dtype=np.uint8)
    if len(arr) < n_pixels:  # truncated: pad with 0 (degrade, don't raise)
        arr = np.pad(arr, (0, n_pixels - len(arr)))
    return arr


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list:
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def gif_encode(indices: "np.ndarray", palette: "np.ndarray",
               version: bytes = b"89a", interlace: bool = False) -> bytes:
    """(H, W) uint8 index raster + (N, 3) palette → GIF87a/89a bytes.
    89a additionally writes a Graphic Control Extension (so the
    extension-skip path is exercised by fixtures)."""
    h, w = indices.shape
    n = len(palette)
    depth = max(1, (int(n) - 1).bit_length())
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += gct.tobytes()
    if version == b"89a":
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: no transparency
        out += b"\x21\xfe\x07minipdf\x00"  # comment extension
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    rows = indices[_gif_interlace_order(h)] if interlace else indices
    mcs = max(2, depth)
    out.append(mcs)
    lzw = _gif_lzw_encode(rows, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_decode(data: bytes) -> "np.ndarray":
    """GIF87a/89a → (H, W, 3) uint8 RGB (first image block; extensions
    skipped; local color table and interlacing honored)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 1 << ((flags & 7) + 1)
        gct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-block chain
            pos += 2
            # bounds-checked like the image-data walk below: a file
            # truncated mid-extension must degrade (clean ValueError the
            # caller already tolerates), not IndexError the Arrow batch
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("gif: truncated extension block")
            pos += 1
        elif b == 0x2C:
            # bounds-checked like the extension walk: truncation at or
            # inside the image descriptor must degrade with a clean
            # ValueError, not struct.error/IndexError (round-9 review)
            if pos + 10 > len(data):
                raise ValueError("gif: truncated image descriptor")
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                size = 1 << ((iflags & 7) + 1)
                if pos + size * 3 > len(data):
                    raise ValueError("gif: truncated local color table")
                pal = np.frombuffer(data, np.uint8, size * 3, pos).reshape(-1, 3)
                pos += size * 3
            if pal is None:
                raise ValueError("gif: no color table")
            if pos >= len(data):
                raise ValueError("gif: truncated before LZW code size")
            mcs = data[pos]
            pos += 1
            # bounds-checked sub-block walk: a transfer-truncated file
            # runs off the end mid-chain — decode what arrived and let
            # the LZW layer zero-pad the tail (degrade, don't fail the
            # task; round-8 review)
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = _gif_lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
            if iflags & 0x40:  # de-interlace
                order = _gif_interlace_order(h)
                out = np.zeros_like(idx)
                out[order] = idx
                idx = out
            return pal[np.minimum(idx, len(pal) - 1)]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    raise ValueError("gif: no image block")


def synth_gif_image(media_id: int, width: int = 16, height: int = 16) -> bytes:
    """Deterministic GIF keyed by id: index(r, x) = (id + 5r + 3x) % 256,
    palette[i] = (3i % 256, 7i % 256, 11i % 256) — closed forms the
    DuckDB oracle recomputes. Odd ids are INTERLACED (4-pass row order),
    even ids carry 89a extension blocks — both decode paths rotate."""
    r = np.arange(height).reshape(-1, 1)
    x = np.arange(width).reshape(1, -1)
    idx = ((media_id + 5 * r + 3 * x) % 256).astype(np.uint8)
    i = np.arange(256)
    pal = np.stack([(3 * i) % 256, (7 * i) % 256, (11 * i) % 256], axis=1).astype(np.uint8)
    return gif_encode(
        idx, pal,
        version=b"89a" if media_id % 2 == 0 else b"87a",
        interlace=media_id % 2 == 1,
    )


def attach_gif_media(df: DataFrame, id_col: str = "doc_id",
                     width: int = 16, height: int = 16) -> DataFrame:
    """Media table with REAL GIF payloads (LZW encode is CPU-bound →
    spread first)."""
    return _attach_media(
        df, lambda m: synth_gif_image(m, width, height), id_col
    )


def decode_gif_features(media: DataFrame) -> DataFrame:
    """GIF decode stage: LZW-expand the index raster, map through the
    color table, emit the same pixel features as the other image paths."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, means, cks = [], [], [], []
            for payload in pdf["payload"]:
                arr = gif_decode(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                flat = arr.reshape(-1)
                ws.append(w)
                hs.append(h)
                means.append(int(flat.sum()) / flat.size)
                cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_id": 0,
                    "width": ws,
                    "height": hs,
                    "mean_rgb": means,
                    "weighted_checksum": cks,
                    "decoder": "numpy-gif",
                }
            )

    return media.mapInPandas(kernel, schema=AVI_FRAME_FEATURES_SCHEMA)


def synth_mpeg1_motion_video(media_id: int) -> bytes:
    """Deterministic MOTION MPEG-1 stream keyed by id (round 9): 4
    pictures (I P P P) of a 64x48 grayscale macroblock mosaic whose
    evolution exercises every P-picture path bit-exactly — row 0 shifts
    right one MB per frame with a +5 delta (MC + coded, f_code=2 vector
    -32 half-pels), row 1 is static with a +3 delta on the slice's last
    MB (skip runs + no-MC coded), row 2 shifts with no delta (MC not
    coded), and the column entering the frame is fresh (intra-in-P).
    Per-MB constants are DC-only through the DCT and the odd deltas
    survive non-intra dequantization at qscale 8, so the decode is
    EXACT and the DuckDB oracle can state every macroblock's value in
    closed form."""
    from rpa_etl_spark.sources.mpeg1 import mpeg1_encode_temporal

    d7 = (media_id % 256) * 7

    def v(t: int, i: int, j: int) -> int:
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
    for t in range(4):
        f = np.zeros((48, 64, 3), dtype=np.uint8)
        for i in range(3):
            for j in range(4):
                f[16 * i : 16 * i + 16, 16 * j : 16 * j + 16, :] = v(t, i, j)
        frames.append(f)
    return mpeg1_encode_temporal(frames)


def _attach_media(df: DataFrame, synth_fn, id_col: str = "doc_id") -> DataFrame:
    """Shared media-table builder: one synthetic payload per row via
    ``synth_fn(media_id)`` (encode is CPU-bound → spread first). Every
    attach_*_media wrapper in this module delegates here (round-9
    review dedup — previously nine copies of this scaffold)."""
    id_field = F.col(id_col).alias("media_id")
    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [synth_fn(int(m)) for m in pdf["media_id"]],
                }
            )

    from rpa_etl_spark.tables import spread

    return spread(df.select(id_field)).mapInPandas(kernel, schema=schema)


def attach_mpeg1_motion_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table with motion MPEG-1 payloads (one 4-picture I+P
    stream per row)."""
    return _attach_media(df, synth_mpeg1_motion_video, id_col)


MPEG_MOTION_MB_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("picture_type", StringType()),
        StructField("mb_row", IntegerType()),
        StructField("mb_col", IntegerType()),
        StructField("mb_value", IntegerType()),
    ]
)


def decode_mpeg1_motion_mbs(media: DataFrame) -> DataFrame:
    """FULL temporal decode (1 stream row → one row per frame per
    macroblock): I AND P pictures through motion compensation, then each
    16x16 region's value — the decoded constant when the region is
    uniform, −1 otherwise (so ANY motion/residual/skip bug surfaces as a
    -1 or a wrong constant under the hash compare). Fan-out inside one
    Arrow batch — no shuffle; at corpus scale this runs at scan speed."""
    from rpa_etl_spark.sources.mpeg1 import mpeg1_decode_frames

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, pts, rows, cols, vals = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, frames = mpeg1_decode_frames(bytes(payload))
                for tref, ptype, rgb in frames:
                    h, w, _ = rgb.shape
                    for i in range(h // 16):
                        for j in range(w // 16):
                            region = rgb[16 * i : 16 * i + 16,
                                         16 * j : 16 * j + 16, :]
                            first = int(region[0, 0, 0])
                            uniform = bool((region == first).all())
                            ids.append(mid)
                            fids.append(tref)
                            pts.append(ptype)
                            rows.append(i)
                            cols.append(j)
                            vals.append(first if uniform else -1)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_id": fids,
                    "picture_type": pts,
                    "mb_row": rows,
                    "mb_col": cols,
                    "mb_value": vals,
                }
            )

    return media.mapInPandas(kernel, schema=MPEG_MOTION_MB_SCHEMA)


def synth_mpeg1_bidi_video(media_id: int) -> bytes:
    """Deterministic BIDIRECTIONAL MPEG-1 stream keyed by id (round 9):
    display order [I, B, P] coded as I(0) P(2) B(1). P = I + 9
    everywhere (no-MC coded; odd delta exact at qscale 8). The B frame
    exercises every prediction direction bit-exactly: row 0 forward
    -copies the I anchor, row 1 backward-copies the P anchor, row 2 is
    the interpolated average ((v + v+9 + 1) >> 1 = v + 5) — with B-skip
    runs inside each row (repeat-mode semantics) and closed forms the
    DuckDB oracle restates per macroblock."""
    from rpa_etl_spark.sources.mpeg1 import mpeg1_encode_bidi

    d7 = (media_id % 256) * 7

    def mosaic(vals):
        f = np.zeros((48, 64, 3), dtype=np.uint8)
        for i in range(3):
            for j in range(4):
                f[16 * i : 16 * i + 16, 16 * j : 16 * j + 16, :] = vals[i][j]
        return f

    v0 = [[(d7 + 29 * (4 * i + j)) % 200 for j in range(4)] for i in range(3)]
    v2 = [[v0[i][j] + 9 for j in range(4)] for i in range(3)]
    v1 = [
        [v0[0][j] for j in range(4)],
        [v2[1][j] for j in range(4)],
        [v0[2][j] + 5 for j in range(4)],
    ]
    return mpeg1_encode_bidi([mosaic(v0), mosaic(v1), mosaic(v2)])


def attach_mpeg1_bidi_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table with bidirectional MPEG-1 payloads ([I, B, P] per
    row)."""
    return _attach_media(df, synth_mpeg1_bidi_video, id_col)
