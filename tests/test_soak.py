"""Sustained-load soak witness (VERDICT r6 ask #7 item 1): the live
three-stage medallion fed by the rate source must keep up with the offered
load AND keep the incremental gold fold consistent with the batch
re-aggregation of everything ingested.  The pytest run uses a small
rate/duration so CI stays fast; tools/soak.py runs the full 4,000 events/s
/ 60 s baseline-parity configuration (results in SCALE.md)."""

from __future__ import annotations

from kafka_streaming_spark.streaming.soak import rate_events, soak_medallion


def test_rate_events_schema(spark):
    df = rate_events(spark, rows_per_second=10)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "id",
        "group_id",
        "score",
        "event_timestamp",
    ]
    assert df.schema["event_timestamp"].dataType.simpleString() == "bigint"


def test_soak_medallion_sustains_and_folds(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("soak"))
    m = soak_medallion(
        spark,
        f"{root}/tables",
        rows_per_second=300,
        duration_sec=12.0,
        n_groups=8,
    )
    # End-to-end: rows committed to silver during the live window.  The
    # hard floor is deliberately lenient (pytest shares the box with the
    # suite); the baseline-parity number comes from tools/soak.py.
    assert m["silver_rows"] > 0
    assert m["silver_events_per_sec"] > 50, m
    # The fold invariant is NOT lenient: incremental gold must equal the
    # batch re-aggregation of silver exactly.
    assert m["gold_consistent"], m
    assert 0 < m["gold_groups"] <= 8
    # Every stage actually ran batches while live.
    assert m["stages"]["bronze_to_silver"]["input_rows"] > 0
    assert m["stages"]["bronze_to_silver"]["batches"] > 1
