"""§2.3 projections / scalar expressions — split from the monolithic queries.py (round 9,
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
# §2.3 Projections / scalar expressions
# ===========================================================================


@register(
    "p_parse_project",
    """
    SELECT event_id, user_id, value AS score,
           epoch_ms(ts) AS event_ts_ms,
           CAST(floor(epoch_ms(ts)/1000.0/180) AS BIGINT) AS minute_ts,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           upper(event_type) AS event_type_uc
    FROM events
    """,
)
def p_parse_project(spark: SparkSession, sf: str) -> DataFrame:
    """P1-P8 pack: typed projection, epoch conversion, the reference's 180 s
    bucket derivation (silver.py:54-62), JSON scalar extraction on
    ``props`` (the from_json/get_json_object surface)."""
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        "user_id",
        F.col("value").alias("score"),
        F.unix_millis("ts").alias("event_ts_ms"),
        _bucket_ms(F.col("ts")).alias("minute_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.upper("event_type").alias("event_type_uc"),
    )


@register(
    "f_filter_routing",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type NOT IN ('view', 'click') AND value > 50.0
    """,
)
def f_filter_routing(spark: SparkSession, sf: str) -> DataFrame:
    """F1 (negated isin — the CDF insert-only routing shape, gold.py:57) +
    F2 (SQL-string predicate, tomongo.py:26)."""
    e = load_table(spark, sf, "events")
    return (
        e.filter(~F.col("event_type").isin("view", "click"))
        .filter("value > 50.0")
        .select("event_id", "event_type", "value")
    )


@register(
    "f_scalar_pack",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           abs(p_size - 25) AS size_dist,
           CAST(ROUND(p_retailprice * 10.0) AS BIGINT) / 10.0 AS price_r1
    FROM part
    """,
)
def f_scalar_pack(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 scalar-function surface: string / math / rounding built-ins."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        _round_fixed(F.col("p_retailprice"), 1).alias("price_r1"),
    )


@register(
    "d_datetime_pack",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start
    FROM orders
    """,
)
def d_datetime_pack(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 date/time surface: extraction, truncation, day arithmetic."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.unix_millis(F.date_trunc("month", "o_orderdate")).alias("month_start_ms"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


