"""Z-order layout (ops.layout): Morton-code correctness and the actual
file-skipping payoff — the D2 OPTIMIZE/ZORDER capability on the parquet
backend (reference utils.py:111-124)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.ops.layout import (
    morton_code,
    optimize_parquet,
    skipped_fraction,
    write_bucketed,
    zorder,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_morton_code_interleaves(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"]
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_code([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    # bit i of x -> position 2i, bit i of y -> position 2i+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    # x=3 (0b11) -> 0b0101; y=5 (0b101) -> 0b100010; z = 0b100111 = 39
    assert out[(3, 5)] == 39


def test_zorder_preserves_rows(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("a"), (F.col("id") % 53).alias("b"), "id"
    )
    out = zorder(df, ["a", "b"], n_files=4)
    assert out.count() == 1000
    assert sorted(out.columns) == ["a", "b", "id"]
    assert {r["id"] for r in out.collect()} == set(range(1000))


def test_zorder_layout_skips_files(spark):
    """After Z-ordering on (group_id, bucket), a point scan on EITHER
    column can skip most files on min/max stats alone; the unclustered
    layout skips ~none.  This is the property OPTIMIZE ZORDER exists for."""
    n_files = 16
    df = (
        spark.range(0, 40_000)
        .select(
            (F.col("id") % 50).alias("group_id"),
            ((F.col("id") * 7919) % 200).alias("bucket"),
            F.col("id").alias("payload"),
        )
        # shuffle rows so the unclustered baseline has no accidental order
        .orderBy(F.xxhash64("payload"))
    )
    plain_dir = f"{TMP}/layout_plain"
    z_dir = f"{TMP}/layout_z"
    df.repartition(n_files).write.mode("overwrite").parquet(plain_dir)
    zorder(df, ["group_id", "bucket"], n_files=n_files).write.mode(
        "overwrite"
    ).parquet(z_dir)

    plain_skip = skipped_fraction(spark, plain_dir, "group_id", 7)
    z_skip_g = skipped_fraction(spark, z_dir, "group_id", 7)
    z_skip_b = skipped_fraction(spark, z_dir, "bucket", 100)
    # round-robin layout: every file spans the whole domain -> no skipping
    assert plain_skip <= 0.1
    # z-ordered: a point predicate on either clustered column prunes files
    assert z_skip_g >= 0.5, z_skip_g
    assert z_skip_b >= 0.5, z_skip_b
    # rows survive the re-layout byte-for-byte
    assert spark.read.parquet(z_dir).count() == 40_000


def test_optimize_parquet_compacts_and_preserves(spark):
    src_dir = f"{TMP}/layout_opt"
    df = spark.range(0, 5_000).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("v")
    )
    # fragmented table: 40 small files
    df.repartition(40).write.mode("overwrite").parquet(src_dir)
    n_before = len([f for f in os.listdir(src_dir) if f.endswith(".parquet")])
    # single-column clustering: a point scan must hit ~1 of the 4 files
    # (the 2-d curve's pruning power is asserted in the 16-file test above;
    # at 4 files a 2-d curve only separates top bits and prunes little)
    n_after = optimize_parquet(spark, src_dir, zorder_by=["k"], target_files=4)
    assert n_before == 40 and n_after == 4
    back = spark.read.parquet(src_dir)
    assert back.count() == 5_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(5_000))
    assert skipped_fraction(spark, src_dir, "k", 3) >= 0.5


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """Two tables bucketed on the same key with the same bucket count must
    join with NO Exchange (and aggregate on the bucket key shuffle-free):
    the planner proves co-location from catalog metadata.  This is the
    pre-paid-shuffle contract write_bucketed exists for."""
    from kafka_streaming_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    base = str(tmp_path_factory.mktemp("bucketed"))
    e = load_table(spark, SF_SMALL, "events")
    write_bucketed(
        e.select("event_id", "user_id", "value"),
        "bt_events", 8, ["user_id"], path=f"{base}/a",
    )
    write_bucketed(
        e.groupBy("user_id").count(),
        "bt_counts", 8, ["user_id"], path=f"{base}/b",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_events").join(spark.table("bt_counts"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # rows survive the co-located join
        assert joined.count() == e.count()
        # aggregation on the bucket key is also exchange-free
        agg_plan = (
            spark.table("bt_events")
            .groupBy("user_id")
            .sum("value")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_events")
        spark.sql("DROP TABLE IF EXISTS bt_counts")
