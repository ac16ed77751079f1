"""SURVEY.md §7 watch-list item 2: the parquet-backed fallback
(``io.sinks.ParquetUpsertTable``) and the real Delta path
(``delta_utils.merge_*``) must produce identical table states for the same
batch sequence.

delta-spark is NOT installable in this container (no pip/network — see
README), so the dual-backend tests auto-skip with that reason and activate
unchanged the moment a delta-spark wheel + jars are present.  The fallback
side of the invariant (parquet behavior itself) is covered unconditionally
by tests/test_streaming_pipeline.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.delta_utils import DeltaUnavailableError, _delta
from kafka_streaming_spark.io.sinks import ParquetUpsertTable
from kafka_streaming_spark.ops.aggregates import combine_states, group_agg
from kafka_streaming_spark.ops.projections import derive_event_columns
from kafka_streaming_spark.schemas import EVENT_SCHEMA, SILVER_SCHEMA


def _delta_available() -> bool:
    try:
        _delta()
        return True
    except DeltaUnavailableError:
        return False


delta_required = pytest.mark.skipif(
    not _delta_available(),
    reason=(
        "delta-spark not installed and not installable in this container "
        "(no pip/network); test activates unchanged once it is"
    ),
)

BASE_MS = 1_700_000_000_000


def _batches(spark):
    """Two deterministic micro-batches with an overlapping key (dup across
    batches) — exercises both the not-matched insert and the prune path."""
    b1 = spark.createDataFrame(
        [
            ("a", "g1", 1.0, BASE_MS),
            ("b", "g1", 2.0, BASE_MS + 1_000),
            ("c", "g2", 3.0, BASE_MS + 200_000),
        ],
        schema=EVENT_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            ("b", "g1", 2.0, BASE_MS + 1_000),  # exact dup of batch-1 row
            ("d", "g2", 4.0, BASE_MS + 400_000),
        ],
        schema=EVENT_SCHEMA,
    )
    cols = [f.name for f in SILVER_SCHEMA.fields]
    return [derive_event_columns(b).select(*cols) for b in (b1, b2)]


def _silver_state(df):
    return sorted(tuple(r) for r in df.select("id", "group_id", "score").collect())


@delta_required
def test_insert_if_absent_backends_agree(spark, tmp_path_factory):
    from kafka_streaming_spark import delta_utils

    root = str(tmp_path_factory.mktemp("deltapar"))
    batches = _batches(spark)

    pq = ParquetUpsertTable(
        spark, f"{root}/pq", SILVER_SCHEMA, keys=("minute_timestamp", "id")
    )
    for i, b in enumerate(batches):
        pq.insert_if_absent(b, version=i, prune_col="minute_timestamp")

    delta_path = f"{root}/delta_silver"
    batches[0].limit(0).write.format("delta").save(delta_path)
    for b in batches:
        delta_utils.merge_insert_if_absent(
            spark, delta_path, b, keys=("minute_timestamp", "id"),
            prune_col="minute_timestamp",
        )
    delta_state = spark.read.format("delta").load(delta_path)
    assert _silver_state(pq.read()) == _silver_state(delta_state)


@delta_required
def test_upsert_aggregate_backends_agree(spark, tmp_path_factory):
    from kafka_streaming_spark import delta_utils
    from kafka_streaming_spark.schemas import GOLD_SCHEMA

    root = str(tmp_path_factory.mktemp("deltagold"))
    batches = _batches(spark)

    gold_pq = ParquetUpsertTable(spark, f"{root}/pq", GOLD_SCHEMA, keys=("group_id",))
    delta_path = f"{root}/delta_gold"
    first = True
    for i, b in enumerate(batches):
        agg = group_agg(b, keys=("group_id",), score_col="score", ts_col="event_timestamp")
        prior = gold_pq.read().drop("updated_at")
        state = combine_states(prior, agg, keys=("group_id",)).withColumn(
            "updated_at", F.lit(0).cast("long")
        )
        gold_pq.upsert_state(state, changed_keys=agg.select("group_id"), version=i)

        stamped = agg.withColumn("updated_at", F.lit(0).cast("long"))
        if first:
            stamped.limit(0).write.format("delta").save(delta_path)
            first = False
        delta_utils.merge_upsert_aggregate(spark, delta_path, stamped)

    cols = ["group_id", "cumulative_score", "event_count", "first_event_timestamp",
            "last_event_timestamp"]
    pq_state = sorted(tuple(r) for r in gold_pq.read().select(*cols).collect())
    d_state = sorted(
        tuple(r)
        for r in spark.read.format("delta").load(delta_path).select(*cols).collect()
    )
    assert pq_state == d_state
