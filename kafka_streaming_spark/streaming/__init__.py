"""Streaming layer (SURVEY.md §2.10 + §7 step 4): the reference's three
concurrent queries re-expressed as configurable pipeline stages."""

from kafka_streaming_spark.streaming.pipeline import (
    MedallionPipeline,
    watermark_dedup,
)

__all__ = ["MedallionPipeline", "watermark_dedup"]
