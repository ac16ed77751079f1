"""Projection / column-expression operators (SURVEY.md §2.3, P1-P9).

Reference sites: ``stream-processor/processing/silver.py:54-62`` (cast
binary→string, from_json, struct flatten, ingest stamp, 180 s bucket,
epoch→timestamp cast).  All pure Column expressions — fully visible to
Catalyst, so predicate pushdown / column pruning through these projections
is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streaming_spark.schemas import BUCKET_SECONDS, EVENT_SCHEMA


def parse_kafka_events(df: DataFrame) -> DataFrame:
    """Kafka wire rows (binary key/value) → typed event rows.

    P1 (cast binary→string, silver.py:54-56) + P2 (from_json with explicit
    schema, silver.py:57) + P3 (struct flatten, silver.py:58).
    """
    return (
        df.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
        .select(F.from_json(F.col("value"), EVENT_SCHEMA).alias("json"))
        .select("json.*")
    )


def bucket_col(event_ts_millis: Column, seconds: int = BUCKET_SECONDS) -> Column:
    """P5: arithmetic time bucketing — ``(millis/1000/seconds) cast long``
    (silver.py:61).  Floor semantics match integer truncation for post-epoch
    data; we use floor explicitly so pre-1970 timestamps stay correct."""
    return F.floor(event_ts_millis / 1000 / seconds).cast("long")


def derive_event_columns(df: DataFrame, bucket_seconds: int = BUCKET_SECONDS) -> DataFrame:
    """P4-P7: stamp processing time, derive bucket + event-time timestamp.

    Matches silver.py:59-62: ``ingest_timestamp`` (epoch seconds, processing
    time), ``minute_timestamp`` (180 s bucket of event time), ``timestamp``
    (event time as TimestampType, for watermarking).
    """
    return (
        df.withColumn("ingest_timestamp", F.unix_timestamp(F.current_timestamp()))
        .withColumn("minute_timestamp", bucket_col(F.col("event_timestamp"), bucket_seconds))
        .withColumn("timestamp", F.timestamp_millis(F.col("event_timestamp")))
    )


def normalize_events(events: DataFrame) -> DataFrame:
    """Map driver testdata ``events`` (FIXTURES.md F1 mapping) onto the
    reference event shape: ``id→event_id, group_id→user_id, score→value,
    event_timestamp→unix_millis(ts)``.  Keeps ``event_type``/``props`` for
    the filter / JSON-function surface.
    """
    return events.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("user_id").cast("string").alias("group_id"),
        F.col("value").alias("score"),
        F.unix_millis(F.col("ts")).alias("event_timestamp"),
        F.col("event_type"),
        F.col("props"),
    )


def drop_cdf_columns(df: DataFrame) -> DataFrame:
    """P8: strip change-feed metadata (gold.py:58, tomongo.py:27)."""
    return df.drop("_change_type", "_commit_version", "_commit_timestamp")
