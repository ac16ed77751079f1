"""typed JSON parsing, regex extraction, coverage — split from the monolithic queries.py (round 9,
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
# Typed JSON parsing, regex extraction, supplier coverage
# ===========================================================================


@register(
    "f_json_struct",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_valid(props) AS is_valid
    FROM events
    """,
)
def f_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-checked JSON parsing (P2, the reference's core parse shape,
    silver.py:57): ``from_json`` with a declared StructType → typed struct
    field access — not string-typed ``get_json_object`` scraping."""
    from pyspark.sql.types import LongType, StructField, StructType

    props_schema = StructType([StructField("k", LongType())])
    e = load_table(spark, sf, "events")
    parsed = e.select(
        "event_id", F.from_json("props", props_schema).alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("prop_k"),
        (F.col("p.k") % 10).alias("k_mod"),
        F.col("p").isNotNull().alias("is_valid"),
    )


@register(
    "f_null_pack",
    """
    WITH p AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
             CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END AS u
      FROM events
    )
    SELECT CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_v,
           CAST(SUM(CASE WHEN v IS NULL AND u IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both_null,
           CAST(CAST(SUM(CAST(coalesce(v, -1.0) AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100.0 AS sum_coalesced,
           CAST(SUM(CASE WHEN nullif(u, 0) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nullif_zero,
           CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullsafe_eq_null,
           CAST(COUNT(v) AS BIGINT) AS count_skips_nulls,
           CAST(COUNT(*) AS BIGINT) AS count_star
    FROM p
    """,
)
def f_null_pack(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-semantics surface in one query over planted nulls: aggregate
    null-skipping (COUNT(col) vs COUNT(*)), ``coalesce`` defaulting,
    ``nullif`` (0 → NULL here, so its count = nulls + zeros),
    three-valued AND, and null-safe equality (Spark ``<=>`` ≡ SQL
    ``IS NOT DISTINCT FROM``) — the semantics every engine must get
    identical or silently corrupt downstream aggregates."""
    e = load_table(spark, sf, "events")
    p = e.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(F.col("user_id")).alias("u"),
    )
    return p.agg(
        F.sum(F.col("v").isNull().cast("long")).alias("n_null_v"),
        F.sum((F.col("v").isNull() & F.col("u").isNull()).cast("long")).alias(
            "n_both_null"
        ),
        dsum(F.coalesce(F.col("v"), F.lit(-1.0)), "sum_coalesced"),
        F.sum(F.nullif(F.col("u"), F.lit(0)).isNull().cast("long")).alias(
            "n_nullif_zero"
        ),
        F.sum(F.col("v").eqNullSafe(F.lit(None)).cast("long")).alias(
            "n_nullsafe_eq_null"
        ),
        F.count(F.col("v")).alias("count_skips_nulls"),
        F.count(F.lit(1)).alias("count_star"),
    )


@register(
    "f_variant_pack",
    """
    WITH js AS (
      SELECT event_id,
             '{"p": ' || props || ', "meta": {"type": "' || event_type
             || '", "ids": [' || CAST(event_id AS VARCHAR) || ','
             || CAST(user_id AS VARCHAR) || ']}}' AS j
      FROM events
    )
    SELECT event_id,
           CAST(json_extract(j, '$.p.k') AS BIGINT) AS prop_k,
           json_extract_string(j, '$.meta.type') AS meta_type,
           CAST(json_extract(j, '$.meta.ids[1]') AS BIGINT) AS second_id,
           CAST(NULL AS BIGINT) AS missing_val
    FROM js
    """,
)
def f_variant_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT surface (the open-ended semi-structured path the
    typed ``from_json`` of `f_json_struct` can't cover): build a nested
    JSON document, ``parse_json`` it into a VARIANT, then typed
    ``variant_get`` extraction — nested object path, string leaf, array
    index, and ``try_variant_get`` on a missing path (NULL, not error).
    VARIANT keeps the binary-encoded document columnar-shreddable at
    scale; the oracle replays the same paths through DuckDB's JSON
    reader."""
    e = load_table(spark, sf, "events")
    js = e.select(
        "event_id",
        F.concat(
            F.lit('{"p": '),
            F.col("props"),
            F.lit(', "meta": {"type": "'),
            F.col("event_type"),
            F.lit('", "ids": ['),
            F.col("event_id").cast("string"),
            F.lit(","),
            F.col("user_id").cast("string"),
            F.lit("]}}"),
        ).alias("j"),
    )
    v = js.select("event_id", F.parse_json("j").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.p.k", "bigint").alias("prop_k"),
        F.variant_get("v", "$.meta.type", "string").alias("meta_type"),
        F.variant_get("v", "$.meta.ids[1]", "bigint").alias("second_id"),
        F.try_variant_get("v", "$.meta.nope", "bigint").alias("missing_val"),
    )


@register(
    "f_hof_pack",
    """
    WITH arr AS (
      SELECT event_id, generate_series(1, 1 + event_id % 5) AS a
      FROM events
    )
    SELECT event_id,
           CAST(len(a) AS INTEGER) AS n,
           CAST(list_aggregate(list_transform(a, x -> x * x), 'sum') AS BIGINT)
             AS sum_sq,
           CAST(len(list_filter(a, x -> x % 2 = 0)) AS INTEGER) AS n_even,
           CAST(list_aggregate(list_zip_wait, 'sum') AS BIGINT) AS rev_dot
    FROM (
      SELECT event_id, a,
             list_transform(generate_series(1, len(a)),
                            i -> a[i] * a[len(a) - i + 1]) AS list_zip_wait
      FROM arr
    )
    """,
)
def f_hof_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order-function surface in one query: ``sequence`` array
    construction, ``transform`` (map), ``filter``, ``aggregate`` (fold),
    ``zip_with`` against ``reverse`` — all JVM-side Catalyst lambda
    expressions, zero shuffles, integer-exact outputs."""
    e = load_table(spark, sf, "events")
    a = F.sequence(F.lit(1).cast("long"), 1 + F.col("event_id") % 5)
    arr = e.select("event_id", a.alias("a"))
    return arr.select(
        "event_id",
        F.size("a").alias("n"),
        F.aggregate(
            F.transform("a", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_sq"),
        F.size(F.filter("a", lambda x: x % 2 == 0)).alias("n_even"),
        F.aggregate(
            F.zip_with("a", F.reverse("a"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("rev_dot"),
    )


@register(
    "a_stats_pack",
    """
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                  AS DECIMAL(38,12)) AS sxx,
             CAST(SUM(CAST(user_id AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(user_id AS DECIMAL(18,0)) * CAST(user_id AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(user_id AS DECIMAL(18,0)))
                  AS DECIMAL(38,6)) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(ROUND((CAST(n * sxx - sx * sx AS DOUBLE) / (n * n)) * 1000000.0)
                AS BIGINT) / 1000000.0 AS var_pop_value,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000.0)
                AS BIGINT) / 1000000.0 AS corr_value_user
    FROM s
    """,
)
def a_stats_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates done order-independently: population variance
    and Pearson correlation derived from EXACT decimal power sums (sum,
    sum of squares, cross sum) — never from Spark's streaming float
    ``var_pop``/``corr``, whose single-pass float accumulation differs by
    partitioning.  The only floats are two final IEEE divisions + one
    sqrt (correctly rounded per IEEE 754), then 6-digit fixed-point — so
    both engines emit identical doubles at any parallelism."""
    e = load_table(spark, sf, "events")
    dv = F.col("value").cast("decimal(18,6)")
    du = F.col("user_id").cast("decimal(18,0)")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dv).alias("sx"),
        F.sum((dv * dv).cast("decimal(38,12)")).alias("sxx"),
        F.sum(du).alias("sy"),
        F.sum((du * du).cast("decimal(38,0)")).alias("syy"),
        F.sum((dv * du).cast("decimal(38,6)")).alias("sxy"),
    )
    n = F.col("n")
    var_pop = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / (n * n)
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "event_type",
        "n",
        _round_fixed(var_pop, 6).alias("var_pop_value"),
        _round_fixed(corr, 6).alias("corr_value_user"),
    )


@register(
    "f_regex_pack",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS adjective,
           regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS noun,
           CAST(regexp_matches(p_name, 'widget$') AS BOOLEAN) AS is_widget,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_brand, 'Brand#', 'B') AS brand_short
    FROM part
    """,
)
def f_regex_pack(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 regex surface: group extraction, match predicate, padding,
    literal replacement."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 1).alias("adjective"),
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 2).alias("noun"),
        F.col("p_name").rlike("widget$").alias("is_widget"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
    )


@register(
    "q_supplier_top_per_nation",
    """
    SELECT n_name, s_name,
           s_acctbal AS acctbal,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT n_name, s_name, s_acctbal,
             row_number() OVER (PARTITION BY n_nationkey
                                ORDER BY s_acctbal DESC, s_name) AS rn
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) WHERE rn <= 2
    """,
)
def q_supplier_top_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Top-2 suppliers by balance per nation (broadcast dim + ranking
    window) — completes table coverage: every testdata table is now
    exercised by at least one oracle-checked query."""
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    joined = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    top = top_k_per_group(
        joined.select("n_nationkey", "n_name", "s_name", "s_acctbal"),
        ["n_nationkey"],
        [F.col("s_acctbal").desc(), F.col("s_name").asc()],
        k=2,
        rank_col="rn",
    )
    return top.select(
        "n_name",
        "s_name",
        F.col("s_acctbal").alias("acctbal"),
        "rn",
    )


