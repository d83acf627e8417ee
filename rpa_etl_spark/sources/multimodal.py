"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal training data: payloads stay as parquet
``binary`` columns (never strings), typed metadata travels alongside in a
struct, and every decode / feature-extract / resize / frame-sample step is
an Arrow-batched ``mapInPandas`` stage so bytes cross the JVM↔Python
boundary once per batch, not per row.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBBED: real implementations raise NotImplementedError paths
replaced by deterministic fakes (byte-derived), while the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested.
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
    binary out, target dims recorded. STUB decode: the 'resized' payload is
    a deterministic byte slice sized width*height/64 standing in for the
    re-encoded image; a real deployment swaps the kernel body for
    PIL.Image.resize and re-encode — schema, batch shape and mime
    filtering stay exactly as tested."""
    n_out = max(1, width * height // 64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "resized_payload": [
                        ((p or b"\0") * (n_out // max(len(p), 1) + 1))[:n_out]
                        for p in payloads
                    ],
                    "method": "stub-bilinear",
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
    1/fps seconds of metadata duration — the mapInPandas batch fans OUT, so
    the output row count differs from the input (the shape a real ffmpeg
    frame sampler has). STUB decode: frame payload is a deterministic
    byte-rotation of the source payload per frame index."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["meta_duration_s"], pdf["payload"]
            ):
                p = bytes(payload)
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
