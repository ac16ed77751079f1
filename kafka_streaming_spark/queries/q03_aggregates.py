"""§2.6 aggregations (the gold-table family) — split from the monolithic queries.py (round 9,
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
# §2.6 Aggregations (the gold-table family)
# ===========================================================================

_GOLD_ORACLE = """
    SELECT user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0
             AS cumulative_score,
           COUNT(*) AS event_count,
           CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
                      / 100.0 / COUNT(*) * 1000000.0) AS BIGINT) / 1000000.0 AS avg_score,
           MIN(epoch_ms(ts)) AS first_event_timestamp,
           MAX(epoch_ms(ts)) AS last_event_timestamp
    FROM events GROUP BY user_id
"""


def _gold_agg_decimal(df: DataFrame) -> DataFrame:
    cum = _fixed(F.sum(F.col("value").cast("decimal(18,2)")), 2)
    cnt = F.count(F.lit(1))
    return df.groupBy("user_id").agg(
        cum.alias("cumulative_score"),
        cnt.alias("event_count"),
        _round_fixed(cum / cnt, 6).alias("avg_score"),
        F.min(F.unix_millis("ts")).alias("first_event_timestamp"),
        F.max(F.unix_millis("ts")).alias("last_event_timestamp"),
    )


@register("a_group_agg", _GOLD_ORACLE)
def a_group_agg(spark: SparkSession, sf: str) -> DataFrame:
    """A1 + A5: the gold-table grouped multi-aggregate (gold.py:11-16) with
    the derived mean, in exact decimal arithmetic."""
    return _gold_agg_decimal(load_table(spark, sf, "events"))


@register("a_incremental_fold", _GOLD_ORACLE)
def a_incremental_fold(spark: SparkSession, sf: str) -> DataFrame:
    """A2/J2: running-total maintenance (gold.py:19-45) — four simulated
    micro-batches folded with MERGE-shaped combine arithmetic; must equal
    the single-pass aggregate (the fold ≡ agg∘union invariant)."""
    e = load_table(spark, sf, "events")
    state: DataFrame | None = None
    for i in range(4):
        batch = e.filter(F.col("event_id") % 4 == i)
        agg = batch.groupBy("user_id").agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("c"),
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_millis("ts")).alias("f"),
            F.max(F.unix_millis("ts")).alias("l"),
        )
        if state is None:
            state = agg
        else:
            t, s = state.alias("t"), agg.alias("s")
            state = t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full_outer").select(
                F.coalesce(F.col("t.user_id"), F.col("s.user_id")).alias("user_id"),
                (
                    F.coalesce(F.col("t.c"), F.lit(0).cast("decimal(38,2)"))
                    + F.coalesce(F.col("s.c"), F.lit(0).cast("decimal(38,2)"))
                )
                .cast("decimal(38,2)")
                .alias("c"),
                (F.coalesce(F.col("t.n"), F.lit(0)) + F.coalesce(F.col("s.n"), F.lit(0))).alias(
                    "n"
                ),
                F.least(F.col("t.f"), F.col("s.f")).alias("f"),
                F.greatest(F.col("t.l"), F.col("s.l")).alias("l"),
            )
    assert state is not None
    return state.select(
        "user_id",
        dfix(F.col("c"), "cumulative_score"),
        F.col("n").alias("event_count"),
        _round_fixed(_fixed(F.col("c"), 2) / F.col("n"), 6).alias("avg_score"),
        F.col("f").alias("first_event_timestamp"),
        F.col("l").alias("last_event_timestamp"),
    )


@register(
    "t_tumbling_window",
    """
    SELECT epoch_ms(time_bucket(INTERVAL '180 seconds', ts)) AS window_start_ms,
           epoch_ms(time_bucket(INTERVAL '180 seconds', ts) + INTERVAL '180 seconds')
             AS window_end_ms,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """P5 in idiomatic form: ``F.window(ts, '180 seconds')`` tumbling
    aggregate — the proper version of the reference's manual bucket key
    (silver.py:61; SURVEY §2.10 note)."""
    e = load_table(spark, sf, "events")
    return tumbling_agg(
        e,
        "ts",
        "180 seconds",
        [
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        ],
    )


@register(
    "g_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def g_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 extension: hierarchical (ROLLUP) aggregation — subtotal rows
    carry NULL keys identically in both engines."""
    o = load_table(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


