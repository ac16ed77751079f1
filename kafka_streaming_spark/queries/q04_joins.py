"""§2.5 generic join surface — split from the monolithic queries.py (round 9,
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
# §2.5 Joins (generic surface required by J1-J3 batch equivalents)
# ===========================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         * (1 + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS BIGINT)
                AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                           AS DOUBLE) / 100.0 / COUNT(*) * 1000000.0) AS BIGINT)
             / 1000000.0 AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape (scan → filter → hash aggregate): the canonical
    pushdown + partial-aggregation benchmark query."""
    li = load_table(spark, sf, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dfix(F.sum(qty), "sum_qty", 2),
            dfix(F.sum(price), "sum_base_price", 2),
            dfix(F.sum(price * (F.lit(1) - disc)), "sum_disc_price", 4),
            dfix(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), "sum_charge", 6),
            _round_fixed(_fixed(F.sum(qty), 2) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_revenue_by_segment",
    """
    SELECT c_mktsegment,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(DISTINCT o_orderkey) AS order_count
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_mktsegment
    """,
)
def q3_revenue_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join + broadcast dim.  ``customer`` is
    explicitly broadcast — at 100 TB the lineitem side never shuffles for
    this join; only the groupBy shuffles |segments| rows."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            dfix(F.sum(price * (F.lit(1) - disc)), "revenue", 4),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
    )


@register(
    "q5_region_rollup",
    """
    SELECT r_name, n_name, COUNT(*) AS customer_count,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q5_region_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join through two broadcast dimensions."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            dsum(F.col("c_acctbal"), "total_acctbal"),
        )
    )


@register(
    "j_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def j_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (the EXISTS shape; J1's sibling)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "j_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join — the core of J1 (insert-if-absent MERGE)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "s_set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 set ops: INTERSECT (distinct semantics)."""
    o = load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "s_set_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_set_except(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 set ops: EXCEPT (distinct semantics)."""
    o = load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


