"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The Spark-side plumbing is real and tested — schema contracts, batch
iteration shape, partition behavior.  The *decoders* are STUBS: this
container ships no image/audio libraries, so ``decode_image_meta`` derives
deterministic fake metadata from the raw bytes, and ``decode_image_pixels``
raises ``NotImplementedError`` with the integration point documented.  On a
real cluster you swap ``_fake_decode`` for PIL/ffmpeg calls without touching
any Spark code — the operator shape (mapInPandas over binary + metadata
columns) is exactly what runs at 100 TB, where the decode CPU dominates and
Arrow batching amortizes the Python boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Contract for a multimodal asset row (binary payload + typed metadata).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic pseudo-metadata from the byte content.
    Replace with e.g. ``PIL.Image.open(io.BytesIO(payload)).size`` in a
    real deployment."""
    n = len(payload)
    h = 0
    for b in payload[:16]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1024, 64 + (h // 1024) % 1024, 1 + n % 4)


def decode_image_meta(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Extract image metadata via Arrow-batched ``mapInPandas``.

    The iterator-of-DataFrames shape means constant memory per task
    regardless of partition size — the decode loop sees pandas batches of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                }
            )

    return assets.mapInPandas(decode, IMAGE_META_SCHEMA)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Full pixel decode — NOT IMPLEMENTED in this container (no imaging
    libraries).  Integration point: identical ``mapInPandas`` shape as
    ``decode_image_meta`` with an ``array<array<int>>`` (or flattened
    binary tensor) output column."""
    raise NotImplementedError(
        "pixel decode requires an imaging library (PIL/opencv); "
        "use decode_image_meta for the tested plumbing shape"
    )
