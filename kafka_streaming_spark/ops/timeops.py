"""Time bucketing operators (SURVEY.md §2.3 P5, §2.10 note).

The reference buckets manually — ``(event_timestamp/1000/180) cast long``
(silver.py:61).  The engine provides both that arithmetic form (it is the
clustering/prune key shape) and the idiomatic ``F.window`` tumbling window
the survey recommends.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streaming_spark.schemas import BUCKET_SECONDS


def minute_bucket(event_ts_millis: Column, seconds: int = BUCKET_SECONDS) -> Column:
    """P5 arithmetic form: epoch-millis → ``seconds``-wide bucket ordinal."""
    return F.floor(event_ts_millis / 1000 / seconds).cast("long")


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Idiomatic tumbling-window aggregate: ``F.window(ts, duration)``.

    Emits ``window_start_ms``/``window_end_ms`` as epoch millis (stable to
    hash across engines, unlike raw timestamps).  Works on batch and
    streaming DataFrames alike; in streaming combine with a watermark.
    """
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("window"), *extra_keys).agg(*aggs)
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        F.unix_millis(F.col("window.end")).alias("window_end_ms"),
        *extra_keys,
        *[c for c in out.columns if c != "window" and c not in extra_keys],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Sliding (hopping) window aggregate: ``F.window(ts, duration, slide)``
    — each row lands in ``duration/slide`` overlapping windows (the window
    assignment is an internal explode; no self-join)."""
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win.alias("window"), *extra_keys).agg(*aggs)
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        F.unix_millis(F.col("window.end")).alias("window_end_ms"),
        *extra_keys,
        *[c for c in out.columns if c != "window" and c not in extra_keys],
    )
