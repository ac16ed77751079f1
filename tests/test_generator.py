"""Seeded-generator parity (SURVEY.md §5 item 4): the Python port of the
reference daemon's distribution must be deterministic and must drive the
medallion pipeline to the same invariants as the parquet replay tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.io.generator import EventGenerator
from kafka_streaming_spark.streaming.pipeline import MedallionPipeline


def test_generator_is_deterministic():
    a = EventGenerator(seed=42, workers=3).rows(50)
    b = EventGenerator(seed=42, workers=3).rows(50)
    assert a == b
    c = EventGenerator(seed=43, workers=3).rows(50)
    assert a != c


def test_generator_distribution():
    gen = EventGenerator(seed=42, workers=4, period_ms=50)
    rows = gen.rows(100)
    assert len(rows) == 400
    groups = {r[1] for r in rows}
    assert len(groups) == 4  # group_id fixed per worker (publish_daemon.rs:86-89)
    assert len({r[0] for r in rows}) == 400  # ids unique without injection
    assert all(0.0 <= r[2] < 1.0 for r in rows)  # uniform [0,1) (rs:111-112)
    # per-worker event time is monotone (rs:117 wall clock)
    by_group: dict[str, list[int]] = {}
    for r in rows:
        by_group.setdefault(r[1], []).append(r[3])
    for ts in by_group.values():
        assert ts == sorted(ts)


def test_generator_duplicate_injection():
    gen = EventGenerator(seed=7, workers=2, duplicate_every=10, late_every=25)
    rows = gen.rows(100)
    ids = [r[0] for r in rows]
    assert len(rows) == 200 + 20 + 8
    assert len(set(ids)) == 200  # every injected row reuses an existing id


def test_generator_late_rows_arrive_late():
    """Late replays must occupy a stream position AFTER rows whose event
    time exceeds theirs (true arrival skew) — not sit next to their
    originals, which would never exercise the beyond-watermark path."""
    gen = EventGenerator(seed=7, workers=2, late_every=25, late_by_ms=120_000)
    rows = gen.rows(100)
    # late_by_ms (120 s) exceeds the on-time stream span (100 * 50 ms), so
    # every replay's arrival key lands beyond the last on-time arrival: the
    # 8 replays must be exactly the stream's final 8 rows.
    on_time, replays = rows[:-8], rows[-8:]
    assert len({r[0] for r in on_time}) == len(on_time)  # no dups up front
    on_time_ids = {r[0] for r in on_time}
    assert all(r[0] in on_time_ids for r in replays)
    # and each replay keeps its ORIGINAL event_timestamp (no re-stamping)
    first_ts = {r[0]: r[3] for r in on_time}
    assert all(r[3] == first_ts[r[0]] for r in replays)


def test_generated_stream_through_pipeline(spark, tmp_path_factory):
    """End-to-end: adversarial generated stream (dups within watermark, late
    replays beyond it) → medallion; silver holds exactly the distinct ids
    and gold re-aggregates them."""
    root = str(tmp_path_factory.mktemp("genpipe"))
    gen = EventGenerator(
        seed=42, workers=4, duplicate_every=7, late_every=13, late_by_ms=120_000
    )
    events = gen.dataframe(spark, 100)
    src = f"{root}/source"
    # two arrival-ordered files → two micro-batches
    events.repartitionByRange(2, "event_timestamp").sortWithinPartitions(
        "event_timestamp"
    ).write.mode("overwrite").parquet(src)

    from kafka_streaming_spark.io.sources import file_stream

    pipe = MedallionPipeline(spark, f"{root}/tables", watermark_delay="300 seconds")
    stream = file_stream(spark, src, events.schema, max_files_per_trigger=1)
    pipe.start_bronze_to_silver(stream, available_now=True).awaitTermination()
    pipe.start_silver_to_gold(available_now=True).awaitTermination()

    n_distinct = events.select("id").distinct().count()
    assert n_distinct == 400
    silver = pipe.silver.read()
    assert silver.count() == n_distinct
    gold = pipe.gold.read()
    assert gold.agg(F.sum("event_count")).collect()[0][0] == n_distinct
    per_group = {r["group_id"]: r["event_count"] for r in gold.collect()}
    expected = {
        r["group_id"]: r["n"]
        for r in events.dropDuplicates(["id"]).groupBy("group_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert per_group == expected
