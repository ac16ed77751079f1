"""Stream-stream joins (capability beyond the reference, SURVEY.md §2.10
"not present" list): watermarked interval joins between two unbounded
streams.

Spark buffers both sides in the state store and the watermark + interval
bound lets it evict: a right row can be dropped once the left watermark
passes ``right_ts + lookback`` — without the time bound the state would
grow forever, so the bound is mandatory here, not an optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "30 seconds",
    lookback: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows of the same key whose event time
    falls in ``[left_ts - lookback, left_ts]``.

    Works identically on batch DataFrames (watermarks are no-ops there),
    which is how the tests pin batch/stream equivalence.  Column names must
    be disjoint across the two sides (rename before calling)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, how)
