"""Measured skew-join study (round 8): turn SCALE.md's "AQE skew-join
splitting is on for join-side skew; salting when both sides are large"
from an assertion into numbers.

Setup: a deliberately skewed fact⋈dim shuffle join —

- fact: 48M rows, 24M of them on ONE hot key (50% skew), the rest uniform
  over 200k keys, with a ~40-byte payload so partition bytes are
  realistic;
- dim: 200,001 rows (every key matched — join selectivity 1, output 48M).

Broadcast is DISABLED for the study (autoBroadcastJoinThreshold=-1): a
200k-row dim would broadcast in production — that is the engine's first
line against join skew and makes the problem vanish; this bench isolates
the SHUFFLE-join regime a 100 TB dim forces.

Three configurations, identical result (count pinned):

1. ``plain``  — AQE skew handling off: the hot key's 24M rows land on one
   reducer; the join runs at the speed of that straggler task.
2. ``aqe``    — AQE skew-join on with thresholds lowered to match this
   dataset's scale (defaults trigger at 256MB partitions — right for a
   cluster, above this synthetic bench's per-partition bytes; at 100 TB
   the DEFAULTS fire on exactly this shape).  AQE splits the hot partition into
   advisory-size chunks; the dim partition is re-read once per chunk.
3. ``salted`` — ops/joins.py::salted_join with 16 buckets, AQE skew off:
   the hot key is pre-split map-side; the dim is replicated 16x into the
   shuffle.  The up-front fix for when BOTH sides are too big for AQE's
   split-one-side trick.

Prints one line per configuration; results recorded in SCALE.md.

Usage: python tools/bench_skew_r8.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streaming_spark.ops.joins import salted_join  # noqa: E402
from kafka_streaming_spark.session import build_session  # noqa: E402

N_FACT = 48_000_000
N_KEYS = 200_000
HOT_FRACTION = 2  # 1/2 of fact rows on the hot key (24M rows, ~1.4 GB)


def main() -> None:
    spark = build_session("bench-skew-r8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # Deterministic skewed fact: even ids -> hot key 0, odd ids -> uniform.
    fact = (
        spark.range(0, N_FACT, 1, 32)
        .select(
            F.when(F.col("id") % HOT_FRACTION == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)) + 1)
            .alias("k"),
            F.concat(F.lit("payload-"), F.lpad(F.col("id").cast("string"), 32, "0")).alias(
                "payload"
            ),
        )
    )
    dim = spark.range(0, N_KEYS + 1, 1, 8).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim-"), F.col("id").cast("string")).alias("attr"),
    )
    # Materialize inputs once so each configuration times the JOIN, not
    # the generators.
    fact = fact.cache()
    dim = dim.cache()
    n_expected = fact.count()
    dim.count()

    def timed(tag: str, df) -> None:
        best = float("inf")
        n = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        assert n == n_expected, (tag, n, n_expected)
        print(f"{tag}: {best:.2f}s ({n} join rows)", flush=True)

    skew_confs = {
        "spark.sql.adaptive.skewJoin.enabled": None,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": None,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": None,
        "spark.sql.adaptive.coalescePartitions.enabled": None,
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    try:
        # 1. plain: no skew mitigation (AQE itself stays on — it is the
        # session default the engine ships — but its skew split is off).
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("plain  (skew split off)", fact.join(dim, "k"))

        # 2. AQE skew split, thresholds scaled to the bench (defaults are
        # cluster-sized: 256MB partition / factor 5).
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        timed("aqe    (skew split on) ", fact.join(dim, "k"))

        # 3. salted join, AQE skew split off again.
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("salted (16 buckets)    ", salted_join(fact, dim, on=["k"], buckets=16))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()
