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


def test_holt_linear_matches_hand_recurrence(spark):
    """x_holt_linear's fold (alpha=0.2, beta=0.1, integer DIV) on a tiny
    series must equal the hand-unrolled recurrence, including the
    truncating-division steps."""
    from pyspark.sql import functions as F

    arr = [("m1", 1000), ("m2", 1200), ("m3", 900), ("m4", 1500)]
    df = spark.createDataFrame(arr, ["mon", "x"]).withColumn(
        "x", F.col("x").cast("long")
    )
    folded = (
        df.groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("mon", "x"))).alias("arr"))
        .select(
            F.expr(
                """
                aggregate(
                  slice(arr, 2, greatest(size(arr) - 1, 0)),
                  array(named_struct('mon', arr[0].mon, 'x', arr[0].x,
                                     'l', arr[0].x, 'b', CAST(0 AS BIGINT))),
                  (acc, e) -> array_append(acc, named_struct(
                    'mon', e.mon, 'x', e.x,
                    'l', (2*e.x + 8*(element_at(acc,-1).l
                                     + element_at(acc,-1).b)) DIV 10,
                    'b', (((2*e.x + 8*(element_at(acc,-1).l
                                       + element_at(acc,-1).b)) DIV 10)
                          - element_at(acc,-1).l
                          + 9*element_at(acc,-1).b) DIV 10))
                ) AS h
                """
            )
        )
        .select(F.explode("h").alias("s"))
        .select("s.mon", "s.l", "s.b")
        .collect()
    )
    # hand recurrence with Python // (truncates toward zero for positives)
    l, b = 1000, 0
    expect = [("m1", 1000, 0)]
    for mon, x in arr[1:]:
        l_new = (2 * x + 8 * (l + b)) // 10
        b = ((l_new - l) + 9 * b) // 10
        l = l_new
        expect.append((mon, l, b))
    assert [(r["mon"], r["l"], r["b"]) for r in folded] == expect


def test_kaplan_meier_known_example(spark):
    """Ŝ(t) on the textbook tiny cohort: durations 1(event), 2(censored),
    3(event), 4(event) of 4 subjects -> S(1)=3/4, S(3)=3/4*1/2,
    S(4)=3/8*0."""
    # at-risk: t=1 n=4 d=1 -> 0.75; t=3 n=2 d=1 -> 0.375; t=4 n=1 d=1 -> 0
    vals = [(1, 1, 4), (3, 1, 2), (4, 1, 1)]
    df = spark.createDataFrame(vals, ["t", "d", "n"]).selectExpr(
        "CAST(t AS BIGINT) t", "CAST(d AS BIGINT) d", "CAST(n AS BIGINT) n"
    )
    from pyspark.sql import functions as F

    folded = (
        df.groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias("arr"))
        .select(
            F.expr(
                """
                aggregate(
                  slice(arr, 2, greatest(size(arr) - 1, 0)),
                  array(named_struct('t', arr[0].t, 'd', arr[0].d,
                        'n', arr[0].n,
                        's', CAST(arr[0].n - arr[0].d AS DOUBLE)
                             / CAST(arr[0].n AS DOUBLE))),
                  (acc, e) -> array_append(acc, named_struct(
                    't', e.t, 'd', e.d, 'n', e.n,
                    's', element_at(acc,-1).s
                         * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE))))
                ) AS km
                """
            )
        )
        .select(F.explode("km").alias("s"))
        .select("s.t", "s.s")
        .collect()
    )
    got = {r["t"]: r["s"] for r in folded}
    assert got[1] == 0.75
    assert got[3] == 0.375
    assert got[4] == 0.0


def test_fifo_allocation_conserves_quantities(spark):
    """Every returned unit must be allocated to exactly one supply month:
    per (bucket, return_mon), the allocations sum to that month's
    returned quantity (and per supply month, never exceed the supplied
    quantity)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    alloc = REGISTRY["x_fifo_allocation"][0](spark, SF_SMALL)
    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .groupBy(
            (F.col("l_partkey") % 50).alias("bucket"),
            F.date_format("l_shipdate", "yyyy-MM").alias("return_mon"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"),
                ).otherwise(0)
            ).alias("returned")
        )
        .filter(F.col("returned") > 0)
    )
    got = alloc.groupBy("bucket", "return_mon").agg(
        F.sum("qty_allocated").alias("allocated")
    )
    # full-cover check only holds while cumulative supply >= cumulative
    # returns (true here: returns are a subset of supplied lines)
    mismatches = (
        got.join(li, ["bucket", "return_mon"])
        .filter(F.col("allocated") != F.col("returned"))
        .count()
    )
    assert mismatches == 0
