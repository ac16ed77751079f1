"""round-10 registrations.

One genuine-gap addition this round (triage bar per VERDICT r8 ask #6:
gap-justified only): the state CHANGE FEED scan — ``f_statestore_scan``
covers point-in-time state forensics, but the "when did this key's fold
CHANGE" question (state growth onset, TTL eviction verification, which
batch dropped a key) needs the per-batch evolution surface
(``readChangeFeed`` over a checkpoint), pytest-pinned in r9
(``test_state_reader_change_feed``) but with no driver row until now.
"""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries._core import (  # noqa: F401
    _tiny_stream_conf,
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
