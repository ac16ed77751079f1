"""TPC-H extension shapes — split from the monolithic queries.py (round 9,
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
# TPC-H extension shapes (adapted to the testdata's column subset)
# ===========================================================================


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey <> n2.n_nationkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): fact → two dim chains (customer
    and supplier nation), cross-nation filter, revenue by (nation pair,
    year).  All four dims broadcast — the lineitem side joins map-side and
    shuffles once, for the final 3-key aggregate."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            price.alias("__p"),
            disc.alias("__d"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dfix(F.sum(F.col("__p") * (F.lit(1) - F.col("__d"))), "revenue", 4))
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(3,1))
                           * CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
    """,
)
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): the testdata has no partsupp/
    ps_supplycost, so cost is proxied as 10% of retail price × quantity
    (documented deviation; the join/aggregate structure is Q9's).  Part
    filter pushed to the part scan before its broadcast."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("%a%"))
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit(0.1).cast("decimal(3,1)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (price * (F.lit(1) - disc) - cost).alias("__amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dfix(F.sum("__amount"), "profit", 4))
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returns per
    customer over a half-year window, top 20.  Returnflag + date filters
    push to the scans; the ORDER/LIMIT is a partial top-k."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dfix(F.sum(price * (F.lit(1) - disc)), "revenue", 4))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
                  AS DOUBLE) / 10000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue view, keep the
    supplier(s) at the global max.  The max is a rank-1 window over the
    tiny aggregated view (|suppliers| rows) — no second scan of lineitem,
    unlike the literal scalar-subquery plan."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dfix(F.sum(price * (F.lit(1) - disc)), "total_revenue", 4)
    )
    ranked = revenue.withColumn(
        "__mx", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("__mx"))
    s = load_table(spark, sf, "supplier")
    return (
        F.broadcast(ranked)
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) // 7
                AS DOUBLE) / 100.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey, 0.5 * AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated avg-quantity
    subquery decorrelated into a self-aggregate + join — the standard
    rewrite Spark and DuckDB both plan; the brand filter prunes the part
    side before broadcast."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    part_agg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("avg_qty")
    )
    joined = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(part_agg, F.col("agg_partkey") == li["l_partkey"])
        .filter(F.col("l_quantity") < F.col("avg_qty"))
    )
    # Exact cents FIRST, then integer DIV 7: dividing the decimal sum by
    # 7.0 before the BIGINT fix puts a non-terminating double through the
    # int cast, where Spark truncates but DuckDB rounds half-even — a
    # latent cross-engine mismatch (numeric-policy test catches this
    # class).  cents DIV 7 == trunc(sum/7 * 100) exactly, on both engines.
    return (
        joined.agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("__cents")
        )
        .select(
            (F.expr("__cents DIV 7").cast("double") / F.lit(100.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q20_part_suppliers",
    """
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 's%'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 2100
    )
    ORDER BY s_name
    """,
)
def q20_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    > 2100 units of 's%' parts — an aggregate-HAVING derived key set
    consumed as a left-semi join (no partsupp in the testdata, so the
    availability predicate is on shipped quantity; structure unchanged)."""
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("s%"))
    movers = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 2100)
        .select("l_suppkey")
    )
    return (
        s.join(movers, s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supps
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem
    JOIN order_stats ON lineitem.l_orderkey = order_stats.l_orderkey
    JOIN orders ON o_orderkey = lineitem.l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE l_returnflag = 'R'
      AND o_orderstatus = 'F'
      AND n_supps > 1
      AND n_r_supps = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS
    (another supplier on the order) / NOT EXISTS (another supplier also
    late) pair decorrelated into one per-order aggregate — no commitdate
    in the testdata, so "late" is the returned flag; the blame predicate
    (sole returning supplier on a multi-supplier finalized order) is
    Q21's."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf, "supplier")
    # Two-level aggregate instead of a double countDistinct: the latter
    # plans an Expand that triples every lineitem row before the shuffle;
    # (orderkey, suppkey) partials then a tiny per-order rollup move far
    # fewer bytes and keep map-side combine effective.  The order-status
    # semi-join lands BEFORE the aggregates: only finalized orders can be
    # blamed, so ~half the lineitem rows never enter either shuffle.
    li_f = li.join(o.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "left_semi")
    per_supp = li_f.groupBy(
        F.col("l_orderkey").alias("os_orderkey"), "l_suppkey"
    ).agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("__is_r")
    )
    order_stats = per_supp.groupBy("os_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("__is_r").alias("n_r_supps"),
    )
    # order_stats carries only finalized orders (semi-join above), so the
    # equijoin with it IS the o_orderstatus='F' filter — no second orders
    # join needed.
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(order_stats, li["l_orderkey"] == F.col("os_orderkey"))
        .filter((F.col("n_supps") > 1) & (F.col("n_r_supps") == 1))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
    )
    return (
        blamed.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(CAST(ROUND((CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                          THEN volume ELSE 0 END) AS DOUBLE)
                            / CAST(SUM(volume) AS DOUBLE)) * 1000000.0) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part     ON l_partkey  = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue among ASIA-region customers per order year.  Seven-table star:
    every dim broadcasts, lineitem shuffles once for the per-year aggregate;
    the share is a conditional-sum ratio computed in DOUBLE on both engines
    (exact DECIMAL sums → correctly-rounded doubles → one IEEE divide)."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nk"))
        .join(p, li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("__vol"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("__vol")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return base.groupBy("o_year").agg(
        r6(num.cast("double") / F.sum("__vol").cast("double"), "mkt_share")
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT pk, sk, unit_cost, MIN(unit_cost) OVER (PARTITION BY pk) AS best
      FROM costs
      JOIN supplier ON sk = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(CAST(ROUND(unit_cost * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
             AS unit_cost
    FROM ranked
    JOIN part ON pk = p_partkey
    JOIN supplier ON sk = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE unit_cost = best AND p_size = 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the testdata has no
    partsupp/ps_supplycost, so unit cost is proxied as the cheapest
    observed price-per-unit each supplier shipped a part for (documented
    deviation; the correlated-min-per-part structure is Q2's).  The
    correlated subquery is decorrelated into a per-part window min; region
    filter prunes suppliers before the window."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    costs = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.min(
            F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    ranked = (
        costs.join(s, F.col("sk") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .withColumn("best", F.min("unit_cost").over(Window.partitionBy("pk")))
        .filter(F.col("unit_cost") == F.col("best"))
    )
    return (
        ranked.join(p, F.col("pk") == p["p_partkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            _round_fixed(F.col("unit_cost"), 6).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    """
    WITH vals AS (
      SELECT l_partkey AS p_key,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT p_key AS l_partkey,
           CAST(CAST(val * 100 AS BIGINT) AS DOUBLE) / 100.0 AS part_value
    FROM vals
    WHERE val > (SELECT SUM(val) * 0.001 FROM vals)
    """,
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part shipped value from one
    nation's suppliers, kept when above 0.1% of that nation's total (no
    partsupp, so value = shipped extendedprice; the HAVING-vs-global-scalar
    structure is Q11's).  The global total is an empty-partition window over
    the already-aggregated |parts| rows — no second lineitem scan; the
    threshold compare stays in exact DECIMAL on both engines."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    vals = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("l_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("__val"))
    )
    total = F.sum("__val").over(Window.partitionBy())
    return (
        vals.withColumn("__total", total)
        .filter(F.col("__val") > F.col("__total") * F.lit(0.001).cast("decimal(4,3)"))
        .select("l_partkey", dfix(F.col("__val"), "part_value", 2))
    )


@register(
    "q12_late_shipments",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority): no l_shipmode/commitdate
    in the testdata, so the class is the return flag and "late" means
    shipped > 60 days after ordering (documented deviation; the
    high/low-priority conditional-count split is Q12's).  The lateness
    predicate is a non-equi condition evaluated inside the single
    broadcast-joined scan — integer counts, hash-exact by construction."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_count",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 30, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct suppliers
    per (brand, size) over an excluded brand/type/size-list, minus
    blacklisted suppliers (no partsupp → supply relation comes from
    lineitem; no s_comment → the complaint NOT-IN is negative account
    balance).  The blacklist is a broadcast anti-join; count-distinct
    expands to the standard two-phase partial aggregate."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 30, 45))
    )
    bad = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


