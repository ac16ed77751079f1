"""§2.7 analytic-window pack + aggregation breadth — split from the monolithic queries.py (round 9,
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
# §2.7 analytic-window pack + §2.6 aggregation breadth
# ===========================================================================


@register(
    "w_analytic_pack",
    """
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w2 AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w2 AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS running_spend
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate)
    """,
)
def w_analytic_pack(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 full analytic surface: ranking (row_number/rank/dense_rank/
    ntile), offsets (lag/lead), and a cumulative frame — one shuffle on the
    partition key serves all eight windows."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        dfix(F.sum(price_dec).over(run), "running_spend", 2),
    )


@register(
    "w_moving_avg",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY 1
    )
    SELECT epoch_ms(d) AS day_ms,
           CAST(CAST(rev_dec * 100 AS BIGINT) AS DOUBLE) / 100.0 AS rev,
           CAST(ROUND(CAST(CAST(SUM(rev_dec) OVER f * 100 AS BIGINT) AS DOUBLE) / 100.0
                      / COUNT(*) OVER f * 1000000.0) AS BIGINT) / 1000000.0 AS rev_ma7
    FROM daily
    WINDOW f AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def w_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Moving aggregate over an explicit row frame: 7-day trailing revenue
    mean.  The daily rollup shrinks the input to |days| rows before the
    (single-partition) ordered frame — the frame never sees raw facts."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    # The frame sums stay DECIMAL (exact under any accumulation strategy —
    # sliding-frame vs segment-tree); only the emitted columns go DOUBLE.
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    f = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.unix_millis("d").alias("day_ms"),
        dfix(F.col("rev_dec"), "rev", 2),
        _round_fixed(
            _fixed(F.sum("rev_dec").over(f), 2) / F.count(F.lit(1)).over(f), 6
        ).alias("rev_ma7"),
    )


@register(
    "a_percentiles",
    """
    SELECT o_orderpriority,
           CAST(ROUND(quantile_cont(o_totalprice, 0.25) * 1000000.0) AS BIGINT) / 1000000.0 AS p25,
           CAST(ROUND(quantile_cont(o_totalprice, 0.50) * 1000000.0) AS BIGINT) / 1000000.0 AS p50,
           CAST(ROUND(quantile_cont(o_totalprice, 0.75) * 1000000.0) AS BIGINT) / 1000000.0 AS p75,
           CAST(ROUND(quantile_cont(o_totalprice, 0.95) * 1000000.0) AS BIGINT) / 1000000.0 AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def a_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``).  At 100 TB swap for
    ``approx_percentile`` (t-digest, mergeable partial sketches) — exact
    percentile needs the full sorted group."""
    o = load_table(spark, sf, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))")
    agg = o.groupBy("o_orderpriority").agg(pct.alias("p"))
    return agg.select(
        "o_orderpriority",
        *[
            _round_fixed(F.col("p")[i], 6).alias(n)
            for i, n in enumerate(["p25", "p50", "p75", "p95"])
        ],
    )


@register(
    "a_distinct_count",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def a_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-distinct aggregation (expand+two-phase under the hood); the
    exact form of A4.  approx_count_distinct (HLL) is the 100 TB variant."""
    e = load_table(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "a_pivot",
    """
    SELECT user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click')
                     * 100 AS BIGINT) AS DOUBLE) / 100.0 AS click_sum,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view')
                     * 100 AS BIGINT) AS DOUBLE) / 100.0 AS view_sum,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase')
                     * 100 AS BIGINT) AS DOUBLE) / 100.0 AS purchase_sum,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup')
                     * 100 AS BIGINT) AS DOUBLE) / 100.0 AS signup_sum,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error')
                     * 100 AS BIGINT) AS DOUBLE) / 100.0 AS error_sum
    FROM events GROUP BY user_id
    """,
)
def a_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT (long→wide): per-user value sums by event type.  The value
    list is pinned so the plan is a single pass (no distinct-scan to
    discover columns)."""
    e = load_table(spark, sf, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(_fixed(F.sum(F.col("value").cast("decimal(18,2)")), 2))
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"{t}_sum") for t in _EVENT_TYPES]
    )


@register(
    "a_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def a_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE aggregation (all 2^k grouping sets in one pass)."""
    o = load_table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "s_set_union",
    """
    SELECT o_custkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey, 'done' AS bucket FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_set_union(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 set ops: UNION ALL — expressed through the engine's SQL
    front-end (``spark.sql`` over registered temp views) to pin that surface
    alongside the DataFrame DSL."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_custkey, 'open' AS bucket FROM orders_v WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_custkey, 'done' AS bucket FROM orders_v WHERE o_orderstatus = 'F'
        """
    )


