"""Multimodal contracts: real stdlib PNG/WAV codecs (round-trip across all
five PNG filters, CRC validation), plus the Spark-side plumbing — schema,
row fan-out shape, determinism, constant-memory batch iteration — that
survives a swap to PIL/ffmpeg for formats stdlib can't express."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.functions.multimodal import (
    decode_image_meta,
    decode_image_pixels,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
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


def test_png_roundtrip_all_filters_and_crc():
    rng = np.random.default_rng(7)
    for h, w, ch in [(1, 1, 1), (7, 5, 1), (16, 16, 3), (13, 9, 4), (32, 17, 2)]:
        px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        data = encode_png(px)
        w2, h2, ch2, out = decode_png(data)
        assert (w2, h2, ch2) == (w, h, ch)
        assert np.array_equal(out, px)
    # corrupting a payload byte must trip the CRC check
    bad = bytearray(encode_png(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_wav_roundtrip():
    s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    rate, back = decode_wav(encode_wav(s, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(back, s)


def test_pixel_decode_real_png(spark):
    """Real end-to-end: encode deterministic PNGs, decode through the
    mapInPandas operator, compare pixel bytes exactly."""
    imgs = {
        aid: ((np.arange(12 * 10 * 3).reshape(12, 10, 3) * (aid + 1)) % 256).astype(np.uint8)
        for aid in range(6)
    }
    rows = [(aid, "image/png", bytearray(encode_png(px))) for aid, px in imgs.items()]
    assets = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    out = {r["asset_id"]: r for r in decode_image_pixels(assets).collect()}
    for aid, px in imgs.items():
        r = out[aid]
        assert (r["width"], r["height"], r["channels"]) == (10, 12, 3)
        assert bytes(r["pixels"]) == px.tobytes()


def test_meta_parses_real_png_header(spark):
    px = np.zeros((9, 31, 4), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(px)))],
        "asset_id long, media_type string, payload binary",
    )
    r = decode_image_meta(assets).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (31, 9, 4)


def test_resize_real_png_path(spark):
    px = np.repeat(np.repeat(np.arange(4, dtype=np.uint8).reshape(2, 2) * 60, 8, 0), 8, 1)
    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(px)))],
        "asset_id long, media_type string, payload binary",
    )
    r = resize_images(assets, width=2, height=2).collect()[0]
    w, h, ch, out = decode_png(bytes(r["payload"]))
    assert (w, h, ch) == (2, 2, 1)
    # nearest-neighbor of a 2x-upsampled constant-block image recovers blocks
    assert np.array_equal(out[:, :, 0], px[::8, ::8])


def test_audio_features_real_wav(spark):
    from kafka_streaming_spark.functions.multimodal import extract_audio_features

    s = np.tile(np.array([1000, -1000], dtype=np.int16), 64)  # 128 samples
    assets = spark.createDataFrame(
        [(1, "audio/wav", bytearray(encode_wav(s)))],
        "asset_id long, media_type string, payload binary",
    )
    rows = extract_audio_features(assets, window_bytes=128).collect()  # 64-sample windows
    assert len(rows) == 2
    for r in rows:
        assert r["energy"] == 64 * 1000 * 1000
        assert r["zero_crossings"] == 63


def test_avi_roundtrip():
    """Raw-frame AVI container: encode (n,h,w,3) frames, decode back to the
    exact pixels and fps — including a width whose 3-byte rows need DIB
    4-byte padding (w=5 -> 15-byte rows, 1 pad byte)."""
    from kafka_streaming_spark.functions.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(6, 4, 5, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=10)
    fps, back = decode_avi(data)
    assert fps == 10
    assert back.shape == frames.shape
    assert np.array_equal(back, frames)


def test_sample_frames_decodes_real_avi(spark):
    """sample_frames on a real AVI payload must emit every_n-th DECODED
    frame as a standalone PNG whose pixels equal the original frame."""
    from kafka_streaming_spark.functions.multimodal import (
        ASSET_SCHEMA,
        decode_png,
        encode_avi,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(9, 6, 6, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(1, "video/avi", bytearray(encode_avi(frames, fps=25)))], ASSET_SCHEMA
    )
    rows = {r["frame_idx"]: bytes(r["frame"]) for r in sample_frames(assets, every_n=4).collect()}
    assert sorted(rows) == [0, 4, 8]
    for idx, png in rows.items():
        w, h, ch, pix = decode_png(png)
        assert (w, h, ch) == (6, 6, 3)
        assert np.array_equal(pix, frames[idx])


def test_average_hash_closed_forms(spark):
    """aHash invariants on crafted images: a constant image saturates to
    all-64-ones (ties count as >= mean); a half-bright image sets exactly
    the bright half's bits; small perturbations below the mean margin do
    NOT change the hash (the perceptual-robustness property the dedup
    relies on); decode failures yield NULL hashes."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from kafka_streaming_spark.functions.multimodal import (
        average_hash,
        decode_image_pixels,
        encode_png,
    )

    def png_of(px):
        return encode_png(px.astype(np.uint8))

    const = np.full((16, 16, 3), 100)
    half = np.zeros((16, 16, 3))
    half[:, 8:, :] = 200  # right half bright
    # Robustness requires CONTRAST: on the half image the mean sits ~100,
    # so a +3 bump on a dark pixel stays far below it and no bit flips.
    # (On a zero-contrast image ANY bump drags the mean above the
    # background and flips everything — correct aHash behavior, which is
    # why the dedup recipe pairs it with real photographic content.)
    jitter = half.copy()
    jitter[0, 0, :] += 3
    rows = [
        (1, bytearray(png_of(const))),
        (2, bytearray(png_of(half))),
        (3, bytearray(png_of(jitter))),
        (4, bytearray(b"not a png")),
    ]
    schema = StructType(
        [StructField("asset_id", LongType(), False), StructField("payload", BinaryType())]
    )
    decoded = decode_image_pixels(spark.createDataFrame(rows, schema))
    got = {
        r["asset_id"]: (r["hash_hi"], r["hash_lo"])
        for r in average_hash(decoded).collect()
    }

    all_ones = (0xFFFFFFFF, 0xFFFFFFFF)
    assert got[1] == all_ones
    # right half bright: in each 8-cell row, columns 4..7 are >= mean
    row_bits = 0b11110000
    expected_half = sum(row_bits << (8 * r) for r in range(8))
    assert got[2] == (expected_half >> 32 & 0xFFFFFFFF, expected_half & 0xFFFFFFFF)
    assert got[3] == got[2]  # jitter collapses to the half image's hash
    assert got[4] == (None, None)
