"""Property test: session_finalize_tws ≡ batch session semantics.

The r9 late-in-gap-below-start bug (commit 6dbbf2f) was found by
inspection; its pattern — watermark-admitted event ORDERING vs state
endpoints — has siblings everywhere a streaming fold claims batch
equivalence.  This sweep pins the claim mechanically:

1. ``test_session_merge_property``: ≥150 seeded random event streams,
   shuffled into random micro-batch partitions, driven through the
   operator's pure per-key algebra (``merge_sessions`` /
   ``split_finalized``) under the exact watermark protocol Spark runs
   (late-filter watermark lags one batch; watermark advances to
   ``max event time − delay`` after each batch; timers fire when the
   watermark passes them).  Invariants, per seed:
   emitted ∪ still-open == an INDEPENDENT reference sessionization of
   the admitted events (consecutive-diff grouping, visibly correct);
   nothing emits twice; every emitted session was watermark-final.

2. ``test_session_tws_streaming_matches_batch_session_window``: one
   seeded random stream through the REAL transformWithState operator,
   compared row-for-row against ``F.session_window`` batch aggregation
   over the same events — tying the pure model to the executing
   operator (schema, timers, state round-trip included).

3. ``test_session_tws_survives_checkpoint_restart``: the ListState of
   open sessions round-trips a query stop/restart — a late event in the
   second run merges into a session opened in the first, exactly once.
"""

from __future__ import annotations

import random

import pytest

from kafka_streaming_spark.streaming.stateful import (
    merge_sessions,
    split_finalized,
)


def ref_sessions(points: list[tuple[int, float]], gap_ms: int) -> list:
    """Independent batch-session reference: sort events by time, group
    where the gap to the PREVIOUS event is strictly under ``gap_ms``
    (Spark's half-open ``[ts, ts + gap)`` window) — no interval algebra,
    no mid-stream merging, so a bug in ``merge_sessions`` can't hide
    here by construction symmetry."""
    pts = sorted(points)
    groups: list[list[tuple[int, float]]] = []
    for ts, sc in pts:
        if groups and ts - groups[-1][-1][0] < gap_ms:
            groups[-1].append((ts, sc))
        else:
            groups.append([(ts, sc)])
    return [
        (g[0][0], g[-1][0], len(g), float(sum(s for _, s in g)))
        for g in groups
    ]


def drive_protocol(
    batches: list[list[tuple[int, float]]], gap_ms: int, delay_ms: int
) -> tuple[list, list, list]:
    """Simulate the per-key micro-batch protocol exactly as Spark runs
    it for ``session_finalize_tws``: returns (emitted, open, admitted).

    Watermark rules mirrored from Structured Streaming: the late-filter
    watermark a batch sees is the PREVIOUS batch's watermark; events
    below it are dropped before the operator; after the batch the
    watermark advances to ``max(all event times) − delay`` (dropped rows
    still advance it — the collector sits above the stateful operator);
    timers fire at the start of the NEXT batch when the watermark passed
    them, and a final no-data batch flushes what the last advance
    unlocked."""
    wm = 0
    open_: list = []
    emitted: list = []
    admitted: list = []
    for batch in batches:
        # timer pass for the watermark set by the previous batch
        done, open_ = split_finalized(open_, wm, gap_ms)
        emitted += done
        batch_admitted = [(ts, sc) for ts, sc in batch if ts >= wm]
        admitted += batch_admitted
        merged = merge_sessions(open_, batch_admitted, gap_ms)
        done, open_ = split_finalized(merged, wm, gap_ms)
        emitted += done
        if batch:
            wm = max(wm, max(ts for ts, _ in batch) - delay_ms)
    done, open_ = split_finalized(open_, wm, gap_ms)  # final flush
    emitted += done
    return emitted, open_, admitted


@pytest.mark.parametrize("seed_block", range(5))
def test_session_merge_property(seed_block):
    """150 seeded orderings (30 per parametrized block): the protocol's
    emitted ∪ open sessions must equal the independent reference over
    the admitted events, with exact-once emission."""
    for seed in range(seed_block * 30, seed_block * 30 + 30):
        rng = random.Random(seed)
        gap_ms = rng.randrange(1_000, 10_000)
        delay_ms = rng.choice([0, rng.randrange(0, 30_000)])
        n_events = rng.randrange(5, 40)
        # integer scores: float addition stays exact in any order
        events = [
            (rng.randrange(0, 100_000), float(rng.randrange(1, 100)))
            for _ in range(n_events)
        ]
        order = events[:]
        rng.shuffle(order)
        n_batches = rng.randrange(1, 9)
        cuts = sorted(
            rng.sample(range(1, n_events), min(n_batches - 1, n_events - 1))
        )
        batches = [
            order[a:b] for a, b in zip([0] + cuts, cuts + [n_events])
        ]

        emitted, open_, admitted = drive_protocol(batches, gap_ms, delay_ms)

        ctx = f"seed={seed} gap={gap_ms} delay={delay_ms}"
        assert sorted(emitted + open_) == ref_sessions(admitted, gap_ms), ctx
        assert len(emitted) == len(set(emitted)), f"double emission: {ctx}"
        # emitted sessions are pairwise gap-separated (true sessions)
        em = sorted(emitted)
        for a, b in zip(em, em[1:]):
            assert b[0] >= a[1] + gap_ms, f"overlapping emits: {ctx}"


def test_session_merge_order_independence():
    """merge_sessions is a fold-independent set operation: any split of
    any permutation yields the same session list (the exact property the
    r9 bug violated — 60 seeded checks, no watermark involved)."""
    for seed in range(60):
        rng = random.Random(1_000 + seed)
        gap_ms = rng.randrange(500, 8_000)
        events = [
            (rng.randrange(0, 50_000), float(rng.randrange(1, 50)))
            for _ in range(rng.randrange(2, 25))
        ]
        expected = ref_sessions(events, gap_ms)
        order = events[:]
        rng.shuffle(order)
        cut = rng.randrange(0, len(order))
        step1 = merge_sessions([], order[:cut], gap_ms)
        step2 = merge_sessions(step1, order[cut:], gap_ms)
        assert step2 == expected, f"seed={seed} gap={gap_ms}"


def test_session_tws_streaming_matches_batch_session_window(
    spark, tmp_path_factory
):
    """The executing operator agrees with F.session_window: a seeded
    random stream (shuffled arrival, generous watermark so everything is
    admitted, far-future flush events to push the watermark past every
    finalize point) must emit exactly the batch session aggregation."""
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_protobuf,
    )

    if ensure_protobuf() is None:
        pytest.skip("no google.protobuf runtime available")
    import time as _time
    from datetime import datetime, timezone

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from kafka_streaming_spark.io.sources import file_stream
    from kafka_streaming_spark.streaming.stateful import session_finalize_tws

    gap_ms = 5_000
    rng = random.Random(42)
    events = [
        (
            rng.choice(["a", "b"]),
            rng.randrange(0, 60_000),
            float(rng.randrange(1, 20)),
        )
        for _ in range(30)
    ]

    def at(ms):
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    order = events[:]
    rng.shuffle(order)
    batches = [order[:10], order[10:20], order[20:]]
    # flush: push the watermark (delay 120s) past every finalize point
    # (max ts 60s + gap 5s), then once more so the last batch PROCESSES
    # at that watermark (input-driven finalize, no trailing-batch bet)
    batches.append([("a", 300_000, 1.0)])
    batches.append([("b", 310_000, 1.0)])

    root = str(tmp_path_factory.mktemp("tws_prop"))
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("score", DoubleType()),
        ]
    )
    src = f"{root}/source"
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(g, at(ms), sc) for g, ms, sc in rows], schema
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(src)
        _time.sleep(1.1)

    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    finalized: list[tuple] = []

    def capture(batch_df, _batch_id):
        for r in batch_df.collect():
            finalized.append(
                (
                    r["group_id"],
                    r["session_start_ms"],
                    r["session_end_ms"],
                    r["n_events"],
                    r["total_score"],
                )
            )

    (
        session_finalize_tws(
            stream, gap_ms=gap_ms, watermark_delay="120 seconds"
        )
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    batch_df = spark.createDataFrame(
        [(g, at(ms), sc) for g, ms, sc in events], schema
    )
    expected = sorted(
        (
            r["group_id"],
            r["w"]["start"].timestamp() * 1000,
            # session_window end = last + gap; ours reports last
            r["w"]["end"].timestamp() * 1000 - gap_ms,
            r["n"],
            r["s"],
        )
        for r in batch_df.groupBy(
            "group_id",
            F.session_window("ts", f"{gap_ms} milliseconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("score").alias("s"))
        .collect()
    )
    got = sorted(
        (g, float(s0), float(s1), n, t) for g, s0, s1, n, t in finalized
    )
    expected = [(g, s0, s1, n, t) for g, s0, s1, n, t in expected]
    # every original-event session must have finalized (flush events'
    # own sessions may stay open in state; drop them from the compare)
    got_core = [r for r in got if r[1] < 200_000]
    exp_core = [r for r in expected if r[1] < 200_000]
    assert got_core == exp_core, (got_core, exp_core)


def test_session_tws_survives_checkpoint_restart(spark, tmp_path_factory):
    """The multi-session ListState round-trips a checkpoint restart: two
    batches drain in run 1 (leaving open sessions in state), the query
    STOPS, and a SECOND run over the same checkpoint delivers the
    remaining batches — a late in-gap event in run 2 must merge into a
    session OPENED IN RUN 1 (state recovered, not rebuilt), and the
    final emissions must equal F.session_window over all events."""
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_protobuf,
    )

    if ensure_protobuf() is None:
        pytest.skip("no google.protobuf runtime available")
    import time as _time
    from datetime import datetime, timezone

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from kafka_streaming_spark.io.sources import file_stream
    from kafka_streaming_spark.streaming.stateful import session_finalize_tws

    gap_ms = 5_000

    def at(ms):
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    # run-1 batches open two sessions for key a: [10s..12s] and [40s]
    run1 = [
        [("a", 10_000, 1.0), ("a", 12_000, 2.0)],
        [("a", 40_000, 3.0)],
    ]
    # run-2: a late event at 8s (admitted: generous delay) merges into
    # the RESTORED [10s..12s] session extending it down to 8s; then two
    # watermark pushes finalize everything below the flush horizon
    run2 = [
        [("a", 8_000, 4.0)],
        [("a", 500_000, 9.0)],
        [("a", 510_000, 9.0)],
    ]

    root = str(tmp_path_factory.mktemp("tws_restart"))
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("score", DoubleType()),
        ]
    )
    src = f"{root}/source"
    finalized: list[tuple] = []

    def capture(batch_df, _batch_id):
        for r in batch_df.collect():
            finalized.append(
                (
                    r["group_id"],
                    r["session_start_ms"],
                    r["session_end_ms"],
                    r["n_events"],
                    r["total_score"],
                )
            )

    def write_batches(batches, first):
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(g, at(ms), sc) for g, ms, sc in rows], schema
            ).coalesce(1).write.mode(
                "overwrite" if first and i == 0 else "append"
            ).parquet(src)
            _time.sleep(1.1)

    def drain():
        stream = file_stream(spark, src, schema, max_files_per_trigger=1)
        (
            session_finalize_tws(
                stream, gap_ms=gap_ms, watermark_delay="300 seconds"
            )
            .writeStream.outputMode("update")
            .foreachBatch(capture)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    write_batches(run1, first=True)
    drain()  # run 1: sessions stay OPEN in state (watermark far behind)
    assert finalized == []  # nothing can have finalized yet
    write_batches(run2, first=False)
    drain()  # run 2: fresh query instance, same checkpoint

    # the restored session must have absorbed the late 8s event
    assert ("a", 8_000, 12_000, 3, 7.0) in finalized
    assert ("a", 40_000, 40_000, 1, 3.0) in finalized
    # and emissions are exactly once
    assert len(finalized) == len(set(finalized))


def test_session_protocol_edge_cases():
    """Explicit protocol edges the random sweep may not hit head-on:
    empty micro-batches between data batches (timer passes still run,
    nothing double-emits), and all events at ONE timestamp (a single
    session whatever the batching)."""
    # empty batches interleaved
    emitted, open_, admitted = drive_protocol(
        [[(1000, 1.0)], [], [(2000, 2.0)], [], [(60_000, 3.0)], []],
        gap_ms=5_000,
        delay_ms=0,
    )
    assert sorted(emitted + open_) == ref_sessions(admitted, 5_000)
    assert (1000, 2000, 2, 3.0) in emitted  # finalized by the 60s jump
    assert len(emitted) == len(set(emitted))

    # all events at one timestamp, sliced across batches
    emitted, open_, admitted = drive_protocol(
        [[(7_000, 1.0)], [(7_000, 2.0)], [(7_000, 4.0)]],
        gap_ms=2_000,
        delay_ms=10_000,
    )
    assert sorted(emitted + open_) == [(7_000, 7_000, 3, 7.0)]
