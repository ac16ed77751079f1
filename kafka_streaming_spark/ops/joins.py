"""Join operators beyond plain equi-joins (SURVEY.md §2.5 note: the engine
must expose the generic join surface; these are the custom compositions
Spark lacks as single built-ins).

``asof_join`` is the classic time-series join (each left row picks the
latest right row at-or-before its timestamp, per key).  Implemented as the
*union-sort* algorithm, not a range self-join:

    tag left/right → union → single shuffle+sort on (key, ts, side) →
    ``last(right_value, ignoreNulls)`` over an unbounded-preceding window →
    keep left rows.

One shuffle, no fan-out, no skew amplification — O(n log n) per key and
robust at 100 TB where a naive ``a.ts >= b.ts`` theta-join would explode
quadratically.

``band_join`` is the bounded-range join (value BETWEEN lo AND hi against a
small bands table): broadcast + range predicate — a map-side operation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (DuckDB/kdb ASOF
    semantics; ties on equal ts match).

    Right rows must be unique per (key, ts) — pre-aggregate otherwise.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).select(*[c for c in l.columns])  # align column order for union
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        F.col("__side"),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def band_join(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (band) join: attach the band row whose
    ``lo <= value < hi``.  ``bands`` must be small (broadcast) and
    non-overlapping — the join is a broadcast nested-loop with a range
    predicate, i.e. a map-side pass over the big side."""
    return df.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )


def semi_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    return left.join(right, cond, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    return left.join(right, cond, "left_anti")
