"""Sessionization: split each key's event sequence into sessions separated
by inactivity gaps.

Two equivalent implementations (tested against each other):

- ``sessionize``: the window-function idiom — ``lag`` to detect gaps,
  running sum of gap flags as the session ordinal.  One shuffle+sort per
  key; works identically in any SQL engine (oracle-checkable).
- ``session_window_agg``: Spark's native ``F.session_window`` grouping —
  the idiomatic form, and the only one that also works on streams with
  watermarked state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Add a per-key session ordinal (0-based): a new session starts when
    the gap to the previous event exceeds ``gap``."""
    gap_expr = F.expr(f"INTERVAL {gap}")
    order = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(order)
    new_session = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, (F.sum(new_session).over(running) - 1).cast("long"))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-(key, session): start/end epoch millis + event count."""
    s = sessionize(df, key_cols, ts_col, gap)
    return s.groupBy(*key_cols, "session_id").agg(
        F.unix_millis(F.min(ts_col)).alias("session_start_ms"),
        F.unix_millis(F.max(ts_col)).alias("session_last_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


def session_window_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Native session windows: ``groupBy(session_window(ts, gap), keys)``.
    Session start = first event; end = last event + gap (Spark semantics).
    Works on batch and (with a watermark) on streaming input."""
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("sw"), *key_cols).agg(
        F.count(F.lit(1)).alias("n_events"), *aggs
    )
    return out.select(
        *key_cols,
        F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
        F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
        *[c for c in out.columns if c not in ("sw", *key_cols)],
    )
