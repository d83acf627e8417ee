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
