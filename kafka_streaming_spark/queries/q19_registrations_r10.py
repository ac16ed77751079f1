"""round-10 registrations (triage bar per VERDICT r8 ask #6:
gap-justified only).  Two genuine gaps close this round:

- the state CHANGE FEED scan — ``f_statestore_scan`` covers
  point-in-time state forensics, but the "when did this key's fold
  CHANGE" question (state growth onset, TTL eviction verification,
  which batch dropped a key) needs the per-batch evolution surface
  (``readChangeFeed`` over a checkpoint), pytest-pinned in r9
  (``test_state_reader_change_feed``) but with no driver row until now;
- the event-time-timer TWS witness — the last transformWithState
  semantics family without a driver-checked row, and the capstone for
  this round's batch-exact ``session_finalize_tws`` rewrite.
"""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries._core import (  # noqa: F401
    _tiny_stream_conf,
    _tws_stream_conf,
)


@register(
    "f_state_changes",
    """
    WITH e AS (
      SELECT CAST(user_id % 8 AS VARCHAR) AS group_id,
             CAST(event_id % 1000 AS DOUBLE) AS score,
             user_id % 8 AS g8
      FROM events
    ),
    a AS (SELECT group_id, COUNT(*) AS n, SUM(score) AS s
          FROM e GROUP BY 1),
    b AS (SELECT group_id, COUNT(*) AS n, SUM(score) AS s
          FROM e WHERE g8 < 4 GROUP BY 1)
    SELECT CAST(0 AS BIGINT) AS batch_id,
           'update' AS change_type,
           a.group_id,
           CAST(a.n AS BIGINT) AS count,
           CAST(a.s AS DOUBLE) AS total
    FROM a
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           'update',
           b.group_id,
           CAST(a.n + b.n AS BIGINT),
           CAST(a.s + b.s AS DOUBLE)
    FROM b JOIN a ON a.group_id = b.group_id
    """,
)
def f_state_changes(spark: SparkSession, sf: str) -> DataFrame:
    """STATE CHANGE FEED scan (``statestore`` + ``readChangeFeed``) —
    the per-batch EVOLUTION of streaming state, one row per state
    mutation per micro-batch, wrapped by
    ``streaming/state_reader.py::read_state_changes``.  This is the
    100 TB forensics surface ``f_statestore_scan`` (point-in-time) can't
    answer: when did key X's fold start ballooning, which batch dropped
    it, did the TTL actually evict.

    Witness: stage the events fold (group_id = user_id % 8, score =
    event_id % 1000) as TWO parquet files — f0 = ALL events, f1 = only
    groups 0-3 — with explicitly ordered mtimes, drained through
    ``running_counter`` (applyInPandasWithState) under
    ``maxFilesPerTrigger=1`` into a checkpoint built exactly once
    (rename-dance idempotent, same as ``f_statestore_scan``).  The
    change feed must then show batch 0 writing every group's full-table
    fold and batch 1 updating ONLY groups 0-3 to (full + subset) —
    asymmetric on purpose, pinning that untouched keys produce NO
    change row.  DuckDB recomputes both batches analytically from the
    raw events.  Determinism: controlled mtimes order the two batches;
    scores are integral doubles (exact at any accumulation order).
    Scale shape: the change feed is a partition-parallel batch scan
    over the checkpoint's delta files with batch-range pinning; no
    exchange in the returned plan."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_streaming_spark.io.sources import file_stream
    from kafka_streaming_spark.streaming.stateful import running_counter
    from kafka_streaming_spark.streaming.state_reader import (
        read_state_changes,
    )

    ev = load_table(spark, sf, "events").select(
        (F.col("user_id") % 8).cast("string").alias("group_id"),
        (F.col("event_id") % 1000).cast("double").alias("score"),
        (F.col("user_id") % 8).alias("g8"),
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/f_state_changes_{slug}"
    ckpt = f"{base}/ckpt"
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    if not os.path.isdir(ckpt):  # deterministic content → build once
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        for i, part in enumerate(
            [ev.select("group_id", "score"),
             ev.filter(F.col("g8") < 4).select("group_id", "score")]
        ):
            part.coalesce(1).write.parquet(f"{build}/p{i}")
            dst = f"{build}/src/f{i}.parquet"
            shutil.copy(glob.glob(f"{build}/p{i}/*.parquet")[0], dst)
            # explicit, well-separated mtimes: FileStreamSource takes
            # the oldest file first under maxFilesPerTrigger=1, so f0
            # (full table) is batch 0 and f1 (groups 0-3) is batch 1
            os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
            shutil.rmtree(f"{build}/p{i}")
        with _tiny_stream_conf(spark):
            stream = file_stream(
                spark, f"{build}/src", schema, max_files_per_trigger=1
            )
            (
                running_counter(stream)
                .writeStream.format("noop")
                .outputMode("update")
                .option("checkpointLocation", f"{build}/ckpt")
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/ckpt", ckpt)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    # Returned LAZY so the statestore change-feed relation stays visible
    # in the plan; explicit casts pin the driver-facing shape.
    return read_state_changes(spark, ckpt).select(
        F.col("batch_id").cast(LongType()).alias("batch_id"),
        F.col("change_type").cast(StringType()).alias("change_type"),
        F.col("key.group_id").cast(StringType()).alias("group_id"),
        F.col("value.groupState.count").cast(LongType()).alias("count"),
        F.col("value.groupState.total").cast(DoubleType()).alias("total"),
    )


@register(
    "t_stream_session_tws",
    """
    WITH f AS (
      SELECT 'g' || CAST(event_id % 4 AS VARCHAR) AS group_id,
             1700000000000
               + ((event_id * 2654435761) % 4294967296) % 300 * 2000
               AS ts_ms,
             CAST(event_id % 7 + 1 AS DOUBLE) AS score
      FROM events WHERE event_id % 397 = 0
    ),
    s AS (
      SELECT group_id, ts_ms, score,
             CASE WHEN LAG(ts_ms) OVER w IS NULL
                    OR ts_ms - LAG(ts_ms) OVER w >= 5000
                  THEN 1 ELSE 0 END AS brk
      FROM f WINDOW w AS (PARTITION BY group_id ORDER BY ts_ms)
    ),
    g AS (
      SELECT group_id, ts_ms, score,
             SUM(brk) OVER (PARTITION BY group_id ORDER BY ts_ms
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT group_id,
           MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) AS session_end_ms,
           COUNT(*) AS n_events,
           CAST(SUM(score) AS DOUBLE) AS total_score
    FROM g GROUP BY group_id, sid
    """,
)
def t_stream_session_tws(spark: SparkSession, sf: str) -> DataFrame:
    """EVENT-TIME-TIMER transformWithState sessionization witnessed
    live — the one TWS semantics family (watermark-driven timers) the
    registry didn't driver-check (`t_stream_tws_counter` covers
    ValueState, `t_stream_ttl_counter` processing-time TTL), and the
    driver capstone for the r10 batch-exact rewrite of
    ``streaming/stateful.py::session_finalize_tws`` (multi-session
    ListState, pure merge algebra, finalize only when the watermark
    passes ``last + gap`` — property-swept in
    ``tests/test_session_property.py``).

    Witness: a closed-form fixture from the events table (every 397th
    event id; group = id % 4; ts = Knuth-hash slot in [0, 300) x 2 s;
    integral scores) staged as file 1, then two per-group FLUSH files
    far in the future with ordered mtimes.  Under
    ``maxFilesPerTrigger=1`` the watermark (delay 0) rises past every
    fixture session's ``last + 5 s`` by the second flush batch, so ALL
    fixture sessions finalize deterministically input-driven; flush
    rows' own sessions (whose finalization would depend on a trailing
    no-data batch) are excluded by the ``session_end_ms`` bound.
    DuckDB reconstructs the sessions analytically (LAG gap-break +
    running SUM session ids — the standard batch sessionization).
    Scale shape: state is O(open sessions)/key with one timer per key;
    emitted rows are collected bounded (= session count) like every
    live witness."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from kafka_streaming_spark.streaming.stateful import session_finalize_tws

    base_ms = 1_700_000_000_000
    flush1 = base_ms + 1_000_000_000
    flush2 = base_ms + 2_000_000_000
    ev = load_table(spark, sf, "events").select(
        F.col("event_id").cast("long").alias("event_id")
    )
    fixture = ev.filter(F.col("event_id") % 397 == 0).select(
        F.concat(F.lit("g"), (F.col("event_id") % 4).cast("string")).alias(
            "group_id"
        ),
        F.timestamp_millis(
            F.lit(base_ms)
            + ((F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296))
            % 300
            * 2000
        ).alias("ts"),
        ((F.col("event_id") % 7) + 1).cast("double").alias("score"),
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_session_tws_{slug}"
    src = f"{base}/src"
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("score", DoubleType()),
        ]
    )
    if not os.path.isdir(src):  # deterministic content → build once
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        parts = [fixture]
        for fms in (flush1, flush2):
            parts.append(
                spark.range(4).select(
                    F.concat(F.lit("g"), F.col("id").cast("string")).alias(
                        "group_id"
                    ),
                    F.timestamp_millis(F.lit(fms)).alias("ts"),
                    F.lit(0.0).alias("score"),
                )
            )
        for i, part in enumerate(parts):
            part.coalesce(1).write.parquet(f"{build}/p{i}")
            dst = f"{build}/src/f{i}.parquet"
            shutil.copy(glob.glob(f"{build}/p{i}/*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
            shutil.rmtree(f"{build}/p{i}")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = f"t_stream_session_tws_{uuid.uuid4().hex[:8]}"
    # r12 (guide §1/§4 — cut fixed streaming overhead, not semantics):
    # ONE state partition (the fixture has 4 keys and O(bytes) state; at 4
    # partitions every micro-batch paid 4 RocksDB opens + 4 Python
    # state-server handshakes) and NO trailing no-data batch (its only
    # emissions are flush-row sessions the session_end_ms bound filters
    # out).  Interleaved A/B at sf0.1: 6.53s → 4.34s best-of-2; emitted
    # fixture rows identical.
    with _tws_stream_conf(spark, partitions=1, no_data_batches=False):
        q = (
            session_finalize_tws(stream, gap_ms=5_000)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = (
        spark.table(sink)
        .filter(F.col("session_end_ms") < flush1)  # fixture sessions only
        .collect()  # bounded: <= one session per occupied slot run
    )
    spark.catalog.dropTempView(sink)
    out_schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("session_start_ms", LongType()),
            StructField("session_end_ms", LongType()),
            StructField("n_events", LongType()),
            StructField("total_score", DoubleType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in rows], out_schema)
