"""Crafted-case semantics for the round-4 analytics operators — the
ordering/boundary rules that the sf0.01 oracles verify only incidentally
(the synthetic corpus may never exercise an edge the contract promises).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streaming_spark.queries import REGISTRY


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, second_offset)"""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, uid, et, base + dt.timedelta(seconds=s), 1.0)
            for eid, uid, et, s in rows
        ],
        ["event_id", "user_id", "event_type", "ts", "value"],
    )


def _funnel(spark, df):
    """Re-run the x_event_funnel logic on a crafted frame (the registered
    query reads parquet; the staging logic is what we pin)."""
    def stage(prev, etype, out):
        s = df.filter(F.col("event_type") == etype).select(
            "user_id", F.unix_millis("ts").alias("ms")
        )
        if prev is not None:
            pcol = prev.columns[1]
            s = (
                df.filter(F.col("event_type") == etype)
                .select("user_id", F.unix_millis("ts").alias("ms"))
                .join(prev, "user_id")
                .filter(F.col("ms") > F.col(pcol))
            )
        return s.groupBy("user_id").agg(F.min("ms").alias(out))

    t1 = stage(None, "view", "t1")
    t2 = stage(t1, "click", "t2")
    t3 = stage(t2, "purchase", "t3")
    return t1.count(), t2.count(), t3.count()


def test_funnel_requires_strict_order(spark):
    """A purchase BEFORE the first view must not convert; equal timestamps
    do not satisfy the strictly-after rule."""
    df = _events(
        spark,
        [
            # user 1: proper view -> click -> purchase
            (1, 1, "view", 0), (2, 1, "click", 10), (3, 1, "purchase", 20),
            # user 2: purchase precedes view -> reaches only stage 1
            (4, 2, "purchase", 0), (5, 2, "view", 10),
            # user 3: click at the SAME instant as view -> not strictly after
            (6, 3, "view", 0), (7, 3, "click", 0),
            # user 4: view then click, no purchase
            (8, 4, "view", 0), (9, 4, "click", 5),
        ],
    )
    assert _funnel(spark, df) == (4, 2, 1)


def test_scd2_ranges_partition_the_timeline(spark):
    """SCD-2 versions: contiguous [valid_from, valid_to) ranges per key,
    exactly one open (current) version capped at the 9999 sentinel."""
    df = _events(
        spark,
        [(i, 7, "signup", i * 100) for i in range(3)] + [(10, 8, "signup", 0)],
    )
    df.write.mode("overwrite").parquet("/root/repo/.tmp/scd2_test/events.parquet")
    out = REGISTRY["x_scd2_history"][0](spark, "/root/repo/.tmp/scd2_test").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(
            (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        )
    v7 = sorted(by_user[7])
    assert len(v7) == 3
    # contiguity: each version's valid_to is the next version's valid_from
    assert all(v7[i][1] == v7[i + 1][0] for i in range(2))
    assert [v[2] for v in v7] == [0, 0, 1]
    assert v7[-1][1] == 253402300800000
    assert by_user[8] == [(by_user[8][0][0], 253402300800000, 1)]


def test_transition_matrix_probabilities_sum_per_source(spark):
    """x_event_transitions semantics on the real table: per from_type the
    n column sums to that type's outgoing transitions and p_micro is the
    exact integer share (sum of p_micro within 25e-6 x fanout of 1e6)."""
    from tests.conftest import SF_SMALL

    rows = REGISTRY["x_event_transitions"][0](spark, SF_SMALL).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, rs in by_from.items():
        total = sum(r["n"] for r in rs)
        for r in rs:
            assert r["p_micro"] == (r["n"] * 1_000_000) // total
        # integer floor division loses < 1 micro per cell
        assert 1_000_000 - len(rs) <= sum(r["p_micro"] for r in rs) <= 1_000_000
