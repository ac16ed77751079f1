"""Round-8 scale self-bench for the four registrations that landed when
the freeze lifted (VERDICT r7 asks #2/#5): the two Arrow-native kernels,
the deterministic rate-micro-batch soak witness, and the stateful TTL
witness.  Results go to SCALE.md by hand.

Scale points:
- ``x_arrow_grouped_stats`` / ``x_arrow_token_stats`` /
  ``t_stream_ttl_counter``: sf0.1 vs the 10x varied-documents replica
  (``.tmp/sf10r8`` — lineitem 6M rows, events 1M, documents 50k of
  GROWN content, not copies).
- ``t_stream_rate_soak``: the registered form is fixed at R=512
  rows/batch (its determinism contract); the scale question is how the
  SAME shape behaves with 10x/100x bigger batches, so the tool re-runs
  the witness's exact pipeline (rate-micro-batch → memory sink → stop
  after K=6 batches) at R = 512 / 5,120 / 51,200 and reports wall and
  rows/s — the per-batch fixed-cost amortization curve, the small-scale
  mirror of the SCALE.md soak table.

Usage: python tools/bench_r8_registrations.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streaming_spark.session import build_session  # noqa: E402
from kafka_streaming_spark.queries import REGISTRY, _tiny_stream_conf  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
REPLICA = os.path.join(REPO, ".tmp", "sf10r8")

REGISTRY_SCALED = ["x_arrow_grouped_stats", "x_arrow_token_stats", "t_stream_ttl_counter"]


def bench_registry_scaled(spark, names) -> None:
    import shutil

    for name in names:
        fn, _sql = REGISTRY[name]
        for label, d in (("1x", BASE), ("10x", REPLICA)):
            if name == "t_stream_ttl_counter":
                # the witness caches its staged source per sf-dir; clear it
                # so each measurement includes one full build + stream
                import re

                slug = re.sub(r"[^A-Za-z0-9]+", "_", d).strip("_")
                shutil.rmtree(
                    os.path.join(REPO, ".tmp", f"t_stream_ttl_counter_{slug}"),
                    ignore_errors=True,
                )
            best = float("inf")
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(f"{name} {label}: {best:.2f}s rows={rows}", flush=True)


def bench_rate_soak_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from kafka_streaming_spark.io.sources import rate_micro_batch_stream

    K = 6
    for label, R in (("1x", 512), ("10x", 5_120), ("100x", 51_200)):
        stream = rate_micro_batch_stream(
            spark, R, num_partitions=4, start_timestamp_ms=1_700_000_000_000
        )
        sink = f"rate_soak_bench_{label}"
        with _tiny_stream_conf(spark):
            t0 = time.perf_counter()
            q = (
                stream.select("value")
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            )
            try:
                while (
                    spark.table(sink).filter(F.col("value") >= R * K).limit(1).count()
                    == 0
                ):
                    time.sleep(0.1)
            finally:
                q.stop()
                q.awaitTermination()
            wall = time.perf_counter() - t0
        rows = K * R
        print(
            f"t_stream_rate_soak {label} (R={R}): {wall:.2f}s for {K} batches"
            f" ({rows} rows, {rows / wall:,.0f} rows/s)",
            flush=True,
        )
        spark.catalog.dropTempView(sink)


def main() -> None:
    names = sys.argv[1:] or REGISTRY_SCALED + ["t_stream_rate_soak"]
    spark = build_session("bench-r8-registrations", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bench_registry_scaled(spark, [n for n in names if n in set(REGISTRY_SCALED)])
    if "t_stream_rate_soak" in names:
        bench_rate_soak_scaled(spark)
    spark.stop()


if __name__ == "__main__":
    main()
