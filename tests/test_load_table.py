"""load_table normalization: the driver regenerates /root/testdata between
rounds and has already shipped three different parquet timestamp encodings
(TIMESTAMP(NANOS) → long-nanos via the legacy conf; TIMESTAMP(MICROS)
without the UTC flag → TIMESTAMP_NTZ; and plain UTC-adjusted TIMESTAMP).
Every variant — plus a hypothetical DATE regression — must come out of
load_table as plain TimestampType with identical UTC epoch values, or all
24 unix_millis call sites break at once."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kafka_streaming_spark.schemas import load_table

_WALL = datetime.datetime(2024, 3, 1, 12, 30, 45)  # naive wall-clock
_EPOCH_MS = 1_709_296_245_000  # that wall-clock read as UTC


def _roundtrip(spark, tmp_path, arrow_type, value):
    table = pa.table(
        {"event_id": pa.array([1], pa.int64()), "ts": pa.array([value], arrow_type)}
    )
    d = tmp_path / "events.parquet"
    pq.write_table(table, str(d))
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    return df.select(F.unix_millis("ts").alias("ms")).collect()[0]["ms"]


def test_ntz_micros_normalized(spark, tmp_path):
    assert _roundtrip(spark, tmp_path, pa.timestamp("us"), _WALL) == _EPOCH_MS


def test_utc_micros_passthrough(spark, tmp_path):
    utc = _WALL.replace(tzinfo=datetime.timezone.utc)
    assert _roundtrip(spark, tmp_path, pa.timestamp("us", tz="UTC"), utc) == _EPOCH_MS


def test_nanos_legacy_path(spark, tmp_path):
    assert _roundtrip(spark, tmp_path, pa.timestamp("ns"), _WALL) == _EPOCH_MS


def test_date_normalized(spark, tmp_path):
    got = _roundtrip(spark, tmp_path, pa.date32(), _WALL.date())
    assert got == 1_709_251_200_000  # 2024-03-01T00:00:00Z
