"""lateral/explode, cross join, value windows, TPC-H — split from the monolithic queries.py (round 9,
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
# Lateral/explode, cross join, value windows, and three more TPC-H shapes
# ===========================================================================


@register(
    "p_explode_pack",
    """
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) / 1000000.0
             AS component
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    WHERE vec_id < 20
    """,
)
def p_explode_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Lateral array expansion (posexplode ≡ UNNEST WITH ORDINALITY): one
    row per vector component with its position."""
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 20)
    return emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "__x")
    ).select(
        "vec_id",
        "pos",
        r6(F.col("__x"), "component"),
    )


@register(
    "j_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def j_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cross join (tiny × tiny — the only cardinality class where
    a cross join is ever acceptable)."""
    r = load_table(spark, sf, "region").select("r_name")
    n = load_table(spark, sf, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "w_first_last_value",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w_first_last_value(spark: SparkSession, sf: str) -> DataFrame:
    """Value windows (first/last/nth) over an explicit full-partition frame
    — the default frame would silently truncate last_value at CURRENT ROW."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first(price).over(w).alias("first_price"),
        F.last(price).over(w).alias("last_price"),
        F.nth_value(price, 2).over(w).alias("second_price"),
    )


@register(
    "q6_revenue_change",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum — every predicate must reach
    the parquet reader (the plan-gate suite checks pushdown patterns)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dfix(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                "revenue",
                4,
            )
        )
    )


@register(
    "q14_promo_share",
    """
    SELECT CAST(ROUND(
             100.0
             * (CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                                   ELSE 0 END) * 10000 AS BIGINT) AS DOUBLE) / 10000.0)
             / (CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                     AS DOUBLE) / 10000.0)
             * 1000000.0) AS BIGINT) / 1000000.0 AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional (CASE) aggregate ratio over a broadcast
    dimension join."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    num = _fixed(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))), 4
    )
    den = _fixed(F.sum(rev), 4)
    return joined.agg(
        _round_fixed(F.lit(100.0) * num / den, 6).alias("promo_share_pct")
    )


@register(
    "q19_disjunctive_join",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-conjunctions) predicate spanning
    both join sides — stays an equi-join on the key with the disjunction as
    a post-join residual (NOT a nested-loop theta join)."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            dfix(F.sum(rev), "revenue", 4),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "a_array_agg",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',') AS event_ids,
           CAST(len(list(event_id)) AS BIGINT) AS n
    FROM events
    WHERE event_type = 'signup'
    GROUP BY user_id
    """,
)
def a_array_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Array aggregation (collect_list) with a deterministic sort — arrays
    as first-class values, serialized with ``array_join`` to a canonical
    string so the element-wise comparison survives the driver's pandas
    canonicalizer (list cells are unhashable there)."""
    e = load_table(spark, sf, "events").filter(F.col("event_type") == "signup")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("event_id")), lambda x: x.cast("string")),
            ",",
        ).alias("event_ids"),
        F.count(F.lit(1)).alias("n"),
    )


