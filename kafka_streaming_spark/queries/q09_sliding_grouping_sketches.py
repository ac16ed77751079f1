"""sliding windows, grouping sets, salted agg, sketches — split from the monolithic queries.py (round 9,
VERDICT r8 ask #7).  Mechanical move: query bodies are verbatim;
registration order is preserved by the import order in
``kafka_streaming_spark/queries/__init__.py``, so ``REGISTRY`` /
``DRIVER_PRIORITY`` iteration is unchanged."""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries._core import (  # noqa: F401
    _bucket_ms,
    _drain_live_sink,
    _fixed,
    _round_fixed,
    _tiny_stream_conf,
    _tws_stream_conf,
)

# ===========================================================================
# Sliding windows, grouping sets, skew-salted aggregation, approx sketches
# ===========================================================================


@register(
    "t_sliding_window",
    """
    WITH e AS (
      SELECT ts, value, time_bucket(INTERVAL '5 minutes', ts) AS b FROM events
    ), x AS (
      SELECT unnest([b, b - INTERVAL '5 minutes']) AS w_start, ts, value FROM e
    )
    SELECT epoch_ms(w_start) AS window_start_ms,
           epoch_ms(w_start + INTERVAL '10 minutes') AS window_end_ms,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0
             AS sum_value
    FROM x
    WHERE ts >= w_start AND ts < w_start + INTERVAL '10 minutes'
    GROUP BY w_start
    """,
)
def t_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding (hopping) window aggregate — 10 min windows every 5 min; each
    event feeds exactly two windows (Spark's internal window-explode; the
    oracle materializes the same two candidate starts per row)."""
    e = load_table(spark, sf, "events")
    return sliding_agg(
        e,
        "ts",
        "10 minutes",
        "5 minutes",
        [
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        ],
    )


@register(
    "a_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under ROLLUP/CUBE), through
    the SQL front-end."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
                 / 100.0 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "a_salted_agg",
    """
    SELECT event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0
             AS sum_value,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def a_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe two-phase aggregation: salt the 5-value hot key space into
    16 sub-keys, partial-aggregate on (key, salt), then combine per real
    key.  Result is EXACTLY the plain groupBy (the oracle) — decimal sums
    re-associate losslessly — while the wide shuffle carries ≤16 rows per
    hot key instead of one reducer-crushing partition at 100 TB."""
    e = load_table(spark, sf, "events").select("event_type", "value")
    salted = salt(e, ["event_type"], buckets=16)
    partial = salted.groupBy("event_type", "__salt").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return unsalt_agg(
        partial,
        ["event_type"],
        [
            dfix(F.sum("s"), "sum_value", 2),
            F.sum("n").alias("n_events"),
        ],
    )


@register(
    "a_approx_sketch",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.5) * 1000000.0) AS BIGINT) / 1000000.0 AS price_p50,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.95) * 1000000.0) AS BIGINT) / 1000000.0 AS price_p95,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS hll_ok,
           CAST(1 AS BIGINT) AS tdigest_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_approx_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-sketch aggregates — the 100 TB variants of exact distinct
    and percentile: HyperLogLog++ ``approx_count_distinct`` (constant
    memory per group) and t-digest ``approx_percentile``.  Sketch internals
    are engine-specific, so the CHECKED output is the exact values (both
    engines compute them) plus accuracy-bound flags: ``hll_ok`` = HLL
    estimate within 10% of exact (sketch at rsd 0.03 → >2× margin on
    every observed group), ``tdigest_ok`` = both approx percentiles within
    2% of exact.  Sketches hash deterministically for a given dataset, so
    the flags are stable 1s whenever the sketch meets its bound — which
    the oracle hard-codes, making the driver's value-hash a real
    sketch-accuracy check rather than a rows-only count.

    Plan shape: exact distinct runs as distinct→count (its own two-phase
    hash plan) and joins the sketch aggregate on the 3-row group key —
    deliberately NOT one multi-distinct aggregate, whose Expand would
    drag the t-digest/HLL buffers through every duplicated row (measured
    5-15× slower and codegen-heavy at rsd ≤ 0.01)."""
    li = load_table(spark, sf, "lineitem")
    exact_d = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("px"),
        F.approx_count_distinct("l_orderkey", 0.03).alias("approx_orders"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("apx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    within = lambda a, e, pct: (  # noqa: E731 — |a-e|*100 <= e*pct, exact arithmetic
        F.abs(a - e) * 100 <= e * pct
    )
    return exact_d.join(sketches, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        _round_fixed(F.col("px")[0], 6).alias("price_p50"),
        _round_fixed(F.col("px")[1], 6).alias("price_p95"),
        "n_rows",
        within(F.col("approx_orders"), F.col("exact_orders"), 10)
        .cast("long")
        .alias("hll_ok"),
        (
            within(F.col("apx")[0], F.col("px")[0], 2)
            & within(F.col("apx")[1], F.col("px")[1], 2)
        )
        .cast("long")
        .alias("tdigest_ok"),
    )


