"""§2.5-§2.7 dedup / merge / windows — split from the monolithic queries.py (round 9,
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
# §2.5-§2.7 Dedup / merge / windows
# ===========================================================================


@register(
    "w_latest_per_key",
    """
    SELECT user_id, event_id, value AS score, epoch_ms(ts) AS event_ts_ms
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def w_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """W1 (silver.py:7,13-18 batch-dedup idiom) / J3 (serving last-writer-
    wins): newest row per key with a total (deterministic) ordering."""
    e = load_table(spark, sf, "events")
    out = latest_per_key(e, ["user_id"], "ts", tiebreak="event_id")
    return out.select(
        "user_id", "event_id", F.col("value").alias("score"), F.unix_millis("ts").alias("event_ts_ms")
    )


@register(
    "j_merge_insert_if_absent",
    """
    WITH t AS (
      SELECT event_id, user_id,
             CAST(floor(epoch_ms(ts)/1000.0/180) AS BIGINT) AS minute_ts
      FROM events WHERE event_id % 2 = 0
    ), s AS (
      SELECT event_id, user_id,
             CAST(floor(epoch_ms(ts)/1000.0/180) AS BIGINT) AS minute_ts
      FROM events WHERE event_id % 3 = 0
    )
    SELECT event_id, user_id, minute_ts FROM t
    UNION ALL
    SELECT s.event_id, s.user_id, s.minute_ts FROM s
    WHERE NOT EXISTS (
      SELECT 1 FROM t
      WHERE t.minute_ts = s.minute_ts AND t.event_id = s.event_id
    )
    """,
)
def j_merge_insert_if_absent(spark: SparkSession, sf: str) -> DataFrame:
    """J1 + F3: the dedup-across-history MERGE (silver.py:22-40) in batch
    form — target ∪ (source anti-join target on (bucket, id)), with the
    IN-list bucket prune applied to the probe side."""
    e = load_table(spark, sf, "events").select(
        "event_id", "user_id", _bucket_ms(F.col("ts")).alias("minute_ts")
    )
    target = e.filter(F.col("event_id") % 2 == 0)
    source = e.filter(F.col("event_id") % 3 == 0)
    return merge_insert_if_absent(
        target, source, keys=["minute_ts", "event_id"], prune_col="minute_ts"
    )


@register(
    "w_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 generalized ranking: top-3 orders per customer (deterministic
    tiebreak on the key)."""
    o = load_table(spark, sf, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rn",
    )


@register(
    "l_pagination",
    """
    SELECT event_id, user_id, value
    FROM events ORDER BY event_id LIMIT 50 OFFSET 100
    """,
)
def l_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """L1 (serving pagination, route.ts:9-17) with a deterministic sort."""
    e = load_table(spark, sf, "events").select("event_id", "user_id", "value")
    return paginate(e, ["event_id"], page=3, page_size=50)


