"""Batch operator layer (SURVEY.md §2.3-§2.8) — Catalyst-native, UDF-free."""

from kafka_streaming_spark.ops.projections import (
    derive_event_columns,
    normalize_events,
    parse_kafka_events,
)
from kafka_streaming_spark.ops.dedup import (
    first_seen,
    latest_per_key,
    merge_insert_if_absent,
)
from kafka_streaming_spark.ops.aggregates import group_agg, incremental_fold
from kafka_streaming_spark.ops.windows import paginate, top_k_per_group
from kafka_streaming_spark.ops.timeops import minute_bucket, tumbling_agg
from kafka_streaming_spark.ops.joins import anti_join, asof_join, band_join, semi_join
from kafka_streaming_spark.ops.sessionize import (
    session_stats,
    session_window_agg,
    sessionize,
)

__all__ = [
    "anti_join",
    "asof_join",
    "band_join",
    "semi_join",
    "session_stats",
    "session_window_agg",
    "sessionize",
    "derive_event_columns",
    "normalize_events",
    "parse_kafka_events",
    "first_seen",
    "latest_per_key",
    "merge_insert_if_absent",
    "group_agg",
    "incremental_fold",
    "paginate",
    "top_k_per_group",
    "minute_bucket",
    "tumbling_agg",
]
