"""Kafka parse layer (SURVEY.md P1-P3, VERDICT r01 item 7): feed
``parse_kafka_events`` synthetic BINARY key/value rows shaped like the
Kafka source's wire schema — no broker needed.  The real ``kafka_stream``
option bundle stays behind an env-gated integration test
(``test_kafka_stream_plan``, plan-only)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streaming_spark.ops.projections import derive_event_columns, parse_kafka_events

# The exact column set a spark-sql-kafka source produces (S1).
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

BASE_MS = 1_700_000_000_000


def _wire_row(key: str, payload, offset: int):
    value = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    return (key.encode(), value, "reviews", 0, offset, None, 0)


@pytest.fixture(scope="module")
def wire_df(spark):
    rows = [
        _wire_row(
            "g1",
            {"id": "a", "group_id": "g1", "score": 0.25, "event_timestamp": BASE_MS},
            0,
        ),
        _wire_row(
            "g1",
            {"id": "b", "group_id": "g1", "score": 0.5, "event_timestamp": BASE_MS + 1000},
            1,
        ),
        _wire_row("g2", b"{not valid json!", 2),
        _wire_row(
            "g2",
            {"id": "c", "group_id": "g2", "score": 0.75, "event_timestamp": BASE_MS + 2000},
            3,
        ),
        # valid JSON, wrong shape: missing fields come back NULL-typed
        _wire_row("g2", {"unexpected": 1}, 4),
    ]
    return spark.createDataFrame(rows, schema=KAFKA_WIRE_SCHEMA)


def test_parse_kafka_events_typed_output(spark, wire_df):
    out = parse_kafka_events(wire_df)
    assert [f.name for f in out.schema.fields] == [
        "id", "group_id", "score", "event_timestamp",
    ]
    by_id = {r["id"]: r for r in out.collect() if r["id"] is not None}
    assert set(by_id) == {"a", "b", "c"}
    assert by_id["a"]["score"] == 0.25
    assert by_id["c"]["event_timestamp"] == BASE_MS + 2000


def test_parse_kafka_events_malformed_rows_become_null(spark, wire_df):
    """from_json is PERMISSIVE (silver.py:57 semantics): malformed JSON and
    shape-mismatched documents yield NULL fields instead of killing the
    stream — count them, filter them, never crash."""
    out = parse_kafka_events(wire_df)
    assert out.count() == 5
    assert out.filter(F.col("id").isNull()).count() == 2
    good = out.filter(F.col("id").isNotNull())
    assert good.count() == 3


def test_parsed_rows_flow_through_derivations(spark, wire_df):
    """P1-P7 chained: wire rows → parse → silver derivations (the full
    bronze-side column pipeline of silver.py:54-62)."""
    parsed = parse_kafka_events(wire_df).filter(F.col("id").isNotNull())
    derived = derive_event_columns(parsed)
    rows = {r["id"]: r for r in derived.collect()}
    assert rows["a"]["minute_timestamp"] == BASE_MS // 1000 // 180
    assert rows["a"]["timestamp"] is not None  # event-time TimestampType
    assert all(r["ingest_timestamp"] is not None for r in rows.values())


def test_kafka_stream_plan(spark):
    """S1 option bundle: building the Kafka scan must produce a streaming
    plan with the wire schema WITHOUT contacting a broker (load() is lazy);
    actually running it needs the spark-sql-kafka package + a broker, which
    this container does not have."""
    from kafka_streaming_spark.io.sources import kafka_stream

    try:
        df = kafka_stream(spark, "localhost:9092", "reviews", max_offsets_per_trigger=123)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"kafka source unavailable in this build: {exc}")
    assert df.isStreaming
    assert {f.name for f in df.schema.fields} >= {"key", "value", "topic", "offset"}
