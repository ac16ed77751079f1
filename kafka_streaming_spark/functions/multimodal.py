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


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: mapInPandas over (binary, metadata) with the target
    shape pinned in the output schema.  The transform is a STUB —
    deterministic byte down/up-sampling standing in for a real resampler
    (swap the body for PIL ``Image.resize`` on a real cluster; the Spark
    contract — Arrow batches in, fixed schema out — is unchanged)."""
    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                if len(p) >= target:
                    step = len(p) // target
                    out_payloads.append(bytes(p[i * step] for i in range(target)))
                else:
                    reps = target // max(len(p), 1) + 1
                    out_payloads.append((p * reps)[:target])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                }
            )

    return assets.mapInPandas(do_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing for video-like payloads: fan each asset out
    to every ``every_n``-th fixed-size frame (1→N rows inside
    ``mapInPandas`` — no explode of materialized frame arrays through a
    shuffle).  Frame extraction is a STUB byte-slicer standing in for an
    ffmpeg keyframe reader; row fan-out shape and schema are the real
    contract."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for asset_id, p in zip(pdf["asset_id"], pdf["payload"]):
                p = p if p is not None else b""
                n_frames = max(len(p) // frame_bytes, 1)
                for f in range(0, n_frames, every_n):
                    ids.append(asset_id)
                    idxs.append(f)
                    frames.append(p[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(do_sample, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("energy", LongType(), True),
        StructField("zero_crossings", IntegerType(), True),
    ]
)


def extract_audio_features(assets: DataFrame, window_bytes: int = 512) -> DataFrame:
    """Audio feature-extraction plumbing: per fixed-size window of the raw
    payload, emit (energy, zero-crossing-count) — the STUB stand-ins for
    MFCC/spectrogram features (swap the numpy body for librosa on a real
    cluster).  Same 1→N fan-out shape as ``sample_frames``; features are
    computed vectorized in numpy per Arrow batch."""
    import numpy as np

    def do_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies, zcs = [], [], [], []
            for asset_id, p in zip(pdf["asset_id"], pdf["payload"]):
                buf = np.frombuffer(p if p is not None else b"", dtype=np.uint8)
                n_win = max(len(buf) // window_bytes, 1)
                for w in range(n_win):
                    win = buf[w * window_bytes : (w + 1) * window_bytes].astype(np.int64)
                    centered = win - 128
                    ids.append(asset_id)
                    idxs.append(w)
                    energies.append(int((centered * centered).sum()))
                    zcs.append(int((np.signbit(centered[1:]) != np.signbit(centered[:-1])).sum()))
            yield pd.DataFrame(
                {"asset_id": ids, "window_idx": idxs, "energy": energies, "zero_crossings": zcs}
            )

    return assets.mapInPandas(do_extract, AUDIO_FEATURE_SCHEMA)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Full pixel decode — NOT IMPLEMENTED in this container (no imaging
    libraries).  Integration point: identical ``mapInPandas`` shape as
    ``decode_image_meta`` with an ``array<array<int>>`` (or flattened
    binary tensor) output column."""
    raise NotImplementedError(
        "pixel decode requires an imaging library (PIL/opencv); "
        "use decode_image_meta for the tested plumbing shape"
    )
