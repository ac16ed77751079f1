"""Round-10 TWS-family 10x scale self-bench (VERDICT r9 ask #5): the
r9 SCALE.md addenda cover statestore/pydatasource/UDTF, but the
transformWithState OPERATORS (`topk_scores_tws`, `type_counts_tws`,
`session_finalize_tws`) only had the fixed-cost note.  This measures, at
1x (sf0.01: 10k events / 150 keys) and 10x (sf0.1: 100k events / 1500
keys — events AND keys both scale 10x):

- drain wall-clock (availableNow over a staged file source), and
- the STATE the checkpoint actually holds afterwards, read back offline
  via the State Data Source (`read_state`, stateVarName-pinned):
  total state rows, rows/key, and the per-key maximum — the numbers
  that prove state is proportional to KEYS (not events) and that the
  ListState top-k bound (rows/key <= k) holds under 10x the traffic.

Results go to SCALE.md by hand (addendum 5).

Usage: python tools/bench_r10_tws_scale.py [name ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streaming_spark.queries._core import _tws_stream_conf  # noqa: E402
from kafka_streaming_spark.io.sources import file_stream  # noqa: E402
from kafka_streaming_spark.schemas import load_table  # noqa: E402
from kafka_streaming_spark.session import build_session  # noqa: E402
from kafka_streaming_spark.streaming import stateful  # noqa: E402
from kafka_streaming_spark.streaming.state_reader import read_state  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [("1x", "/root/testdata/sf0.01"), ("10x", "/root/testdata/sf0.1")]

# name -> (input column spec, operator builder, state variable, key col)
OPS = {
    "topk_scores_tws": (
        lambda ev: ev.select(
            F.col("user_id").cast("string").alias("group_id"),
            F.col("value").cast("double").alias("score"),
        ),
        lambda df: stateful.topk_scores_tws(df, k=3),
        "scores",
    ),
    "type_counts_tws": (
        lambda ev: ev.select(
            F.col("user_id").cast("string").alias("group_id"),
            F.col("event_type").cast("string").alias("event_type"),
        ),
        lambda df: stateful.type_counts_tws(df),
        "counts",
    ),
    "session_finalize_tws": (
        lambda ev: ev.select(
            F.col("user_id").cast("string").alias("group_id"),
            F.col("ts").alias("ts"),
            F.col("value").cast("double").alias("score"),
        ),
        # 24h gap over the 30-day span: sessions per key stay O(few)
        # at BOTH points (per-key event density is identical), so open
        # state must track keys, not events.
        lambda df: stateful.session_finalize_tws(df, gap_ms=86_400_000),
        "sessions",
    ),
}


def one_point(spark, name: str, sf_dir: str) -> dict:
    prep, build, state_var = OPS[name]
    events = prep(load_table(spark, sf_dir, "events"))
    n_events = events.count()
    n_keys = events.select("group_id").distinct().count()
    root = os.path.join(REPO, ".tmp", f"tws_scale_{name}_{uuid.uuid4().hex[:6]}")
    src, ckpt = f"{root}/src", f"{root}/ckpt"
    events.coalesce(2).write.mode("overwrite").parquet(src)
    with _tws_stream_conf(spark):
        stream = file_stream(spark, src, events.schema)
        t0 = time.monotonic()
        (
            build(stream)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        wall = time.monotonic() - t0
        state = read_state(spark, ckpt, state_var=state_var)
        per_key = state.groupBy("key").count()
        n_rows = state.count()
        max_per_key = (
            per_key.agg(F.max("count")).collect()[0][0] if n_rows else 0
        )
    shutil.rmtree(root, ignore_errors=True)
    return {
        "events": n_events,
        "keys": n_keys,
        "wall": round(wall, 2),
        "state_rows": n_rows,
        "rows_per_key": round(n_rows / max(n_keys, 1), 2),
        "max_per_key": max_per_key,
    }


def main(names: list[str]) -> None:
    spark = build_session(app_name="bench-r10-tws-scale")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print(
            "| operator | point | events | keys | wall s | state rows "
            "| rows/key | max/key |"
        )
        print("|---|---|---|---|---|---|---|---|")
        for name in names:
            for label, d in POINTS:
                r = one_point(spark, name, d)
                print(
                    f"| {name} | {label} | {r['events']} | {r['keys']} "
                    f"| {r['wall']} | {r['state_rows']} "
                    f"| {r['rows_per_key']} | {r['max_per_key']} |",
                    flush=True,
                )
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or list(OPS))
