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


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    salt_col: str = "__salt",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side into ``buckets``
    sub-keys and replicate the dim side across every bucket, so a hot join
    key's rows land on ``buckets`` reducers instead of one.  Result is
    row-identical to ``big.join(dim, on)``.

    Use when BOTH sides are large enough that AQE's skew-join splitting
    can't fix it alone (AQE splits the skewed side's partitions but still
    reads the matching dim partition once per split) or when the skew is
    known up front.  Cost: the dim side is written ``buckets``× into the
    shuffle — keep ``buckets`` ≲ 16 and the dim side the smaller one.

    The salt is a deterministic hash of the big side's full row (see
    :func:`kafka_streaming_spark.ops.partitioning.salt` for why
    non-deterministic salts are a stage-retry correctness hazard)."""
    from kafka_streaming_spark.ops.partitioning import salt

    big_s = salt(big, list(on), buckets, salt_col=salt_col)
    dim_r = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(dim_r, [*on, salt_col]).drop(salt_col)


def semi_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    return left.join(right, cond, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    return left.join(right, cond, "left_anti")
