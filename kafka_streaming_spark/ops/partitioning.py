"""Partitioning utilities — the knobs that decide whether a plan that works
at sf0.1 still works at 100 TB.

``spread`` fixes the *small-file* end (a 1-file table otherwise pins heavy
per-row compute to one core); ``salt``/``unsalt_agg`` fix the *skew* end
(one hot key otherwise pins a shuffle to one reducer).  AQE's skew-join
splitting handles join-side skew automatically; salting is for aggregations
and for joins whose skew AQE can't see (e.g. both sides skewed on the same
key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    input partitions before CPU-heavy per-row work.

    Only repartitions when the input has *fewer* partitions than the
    target — on a real 100 TB table the scan already yields thousands of
    splits and this is a no-op; on a single-file local table it unlocks all
    cores.  A round-robin shuffle of the input bytes is the price; pay it
    only ahead of work that costs much more than the shuffle (shingling,
    hashing, vector math)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salt(df: DataFrame, key_cols: Sequence[str], buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Add a salt column splitting each hot key into ``buckets`` sub-keys.
    Aggregate on ``key_cols + [salt_col]`` first (partial), then
    ``unsalt_agg`` combines partials per real key — two small shuffles
    instead of one skewed one.

    The salt is derived from a hash of the FULL row content (all columns),
    never from ``monotonically_increasing_id``/``rand``: non-deterministic
    expressions feeding a shuffle are the classic stage-retry correctness
    hazard — a retried task would re-deal rows into different sub-keys than
    the partials already shuffled downstream.  Content hashing is
    deterministic under retries; its one caveat is that byte-identical
    duplicate rows share a bucket, which only matters if a hot key's rows
    are all literally identical (then there is nothing to spread that a
    map-side partial aggregate hasn't already collapsed).

    ``pmod`` (not ``abs(hash) % n``): ``hash()`` can return Int.MinValue,
    which survives ``abs()`` negative — ``abs % n`` then yields a negative
    salt for any ``n`` that doesn't divide 2^31, a silent ~2^-32/row loss
    in :func:`kafka_streaming_spark.ops.joins.salted_join` (the dim side
    is only replicated for salts 0..n-1).  ``pmod`` is always in [0, n)."""
    h = F.hash(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(buckets)).cast("int"))


def unsalt_agg(
    salted_agg: DataFrame,
    key_cols: Sequence[str],
    combine: Sequence[Column],
    salt_col: str = "__salt",
) -> DataFrame:
    """Second-stage combine of a salted partial aggregate: group the
    partials by the real keys and apply re-combinable expressions (sum of
    sums, sum of counts, min of mins, ...)."""
    return salted_agg.drop(salt_col).groupBy(*key_cols).agg(*combine)
