"""Multimodal plumbing contracts: schema, row fan-out shape, determinism,
and constant-memory batch iteration for the binary-column operators.  The
decoders are documented stubs; what these tests pin is the Spark-side
contract that survives a swap to PIL/ffmpeg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.functions.multimodal import (
    decode_image_meta,
    decode_image_pixels,
    resize_images,
    sample_frames,
)
from kafka_streaming_spark.schemas import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def assets(spark):
    d = load_table(spark, SF_SMALL, "documents").limit(50)
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/synthetic").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def test_decode_meta_schema_and_determinism(spark, assets):
    a = decode_image_meta(assets).orderBy("asset_id").collect()
    b = decode_image_meta(assets).orderBy("asset_id").collect()
    assert a == b
    assert all(r["n_bytes"] > 0 and r["width"] >= 64 and r["channels"] in (1, 2, 3, 4) for r in a)


def test_resize_emits_fixed_shape(spark, assets):
    out = resize_images(assets, width=32, height=16).collect()
    assert len(out) == 50
    for r in out:
        assert r["width"] == 32 and r["height"] == 16
        assert len(r["payload"]) == 32 * 16


def test_sample_frames_fan_out(spark, assets):
    frames = sample_frames(assets, frame_bytes=100, every_n=2)
    rows = frames.collect()
    assert len(rows) > 50  # fan-out happened
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    n_bytes = {r["asset_id"]: r["n_bytes"] for r in decode_image_meta(assets).collect()}
    for aid, idxs in per_asset.items():
        expected = list(range(0, max(n_bytes[aid] // 100, 1), 2))
        assert sorted(idxs) == expected, aid
    # all sampled frames except possibly the last are full-size
    for r in rows:
        assert len(r["frame"]) <= 100


def test_audio_features_windows(spark, assets):
    from kafka_streaming_spark.functions.multimodal import extract_audio_features

    feats = extract_audio_features(assets, window_bytes=64).collect()
    n_bytes = {r["asset_id"]: r["n_bytes"] for r in decode_image_meta(assets).collect()}
    per_asset: dict = {}
    for r in feats:
        per_asset.setdefault(r["asset_id"], []).append(r)
        assert r["energy"] >= 0 and 0 <= r["zero_crossings"] < 64
    for aid, rows in per_asset.items():
        assert len(rows) == max(n_bytes[aid] // 64, 1)


def test_pixel_decode_raises_documented_stub(spark, assets):
    with pytest.raises(NotImplementedError):
        decode_image_pixels(assets)
