"""as-of/band joins + sessionization + multimodal — split from the monolithic queries.py (round 9,
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
# §2.5 extension joins (as-of / band) + sessionization + multimodal
# ===========================================================================


@register(
    "j_asof_join",
    """
    SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS purchase_ts_ms,
           CAST(ROUND(r.value * 1000000.0) AS BIGINT) / 1000000.0 AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def j_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of (time-series) join via the union-sort algorithm: each purchase
    picks the user's latest click at-or-before it.  One shuffle, no range
    fan-out — the 100 TB-safe form of ``l.ts >= r.ts`` matching."""
    e = load_table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ts_ms"),
        r6(F.col("value_asof"), "last_click_value"),
    )


_BANDS = [(0.0, 100_000.0, "low"), (100_000.0, 250_000.0, "mid"), (250_000.0, 1e9, "high")]


@register(
    "j_band_join",
    """
    SELECT o_orderkey, b.label AS price_band
    FROM orders o
    LEFT JOIN (VALUES (0.0, 100000.0, 'low'),
                      (100000.0, 250000.0, 'mid'),
                      (250000.0, 1000000000.0, 'high')) AS b(lo, hi, label)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
)
def j_band_join(spark: SparkSession, sf: str) -> DataFrame:
    """Band (bounded-range) join: broadcast nested-loop against a tiny
    non-overlapping bands table — map-side, no shuffle of the fact side.
    The bands are a SQL VALUES LocalRelation (a createDataFrame from Python
    tuples would plan as Scan ExistingRDD and drag Python workers into an
    otherwise JVM-only query)."""
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"(CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE), '{lbl}')" for lo, hi, lbl in _BANDS)
        + " AS bands(lo, hi, label)"
    )
    out = band_join(o, bands, value_col="o_totalprice")
    return out.select("o_orderkey", F.col("label").alias("price_band"))


@register(
    "j_interval_join",
    """
    SELECT p.event_id AS p_id, c.event_id AS c_id,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS lag_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
)
def j_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream interval join (streaming/joins.py), pinned
    here in its batch shape — the SAME ``interval_join`` call, watermarks
    no-ops on bounded input: every purchase matched to the user's clicks in
    the preceding 30 minutes.  The time bound is what makes the streaming
    form's state finite; the batch oracle proves the join semantics."""
    from kafka_streaming_spark.streaming.joins import interval_join

    e = load_table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = interval_join(
        purchases, clicks,
        left_key="p_user", right_key="c_user",
        left_ts="p_ts", right_ts="c_ts",
        watermark="30 seconds", lookback="30 minutes", how="inner",
    )
    return joined.select(
        "p_id",
        "c_id",
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("lag_ms"),
    )


@register(
    "t_stateful_running",
    """
    SELECT CAST(user_id % 20 AS VARCHAR) AS group_id,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             AS cumulative_score
    FROM events
    GROUP BY user_id % 20
    """,
)
def t_stateful_running(spark: SparkSession, sf: str) -> DataFrame:
    """The ``applyInPandasWithState`` custom stateful operator under the
    driver's eye: a REAL availableNow streaming run over the events parquet
    (the API refuses batch DataFrames), memory-sinked, update mode — the
    final per-key state must equal the plain batch aggregate the oracle
    computes.  Scores are integer cents so the Arrow-side accumulation is
    exact (no float-order dependence)."""
    import uuid

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from kafka_streaming_spark.streaming.stateful import running_counter

    src_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")  # file source wants a dir
        .parquet(sf)
        .select(
            (F.col("user_id") % 20).cast("string").alias("group_id"),
            F.round(F.col("value") * 100).cast("long").cast("double").alias("score"),
        )
    )
    sink = f"t_stateful_running_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            running_counter(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select("group_id", "event_count", "cumulative_score")


@register(
    "t_stream_tumbling",
    """
    SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) * 86400000
             AS window_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             AS sum_cents
    FROM events GROUP BY 1
    """,
)
def t_stream_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """A REAL streaming tumbling-window aggregation under the driver's
    eye: availableNow drain of the events parquet through
    ``F.window(ts, '1 day')`` in complete mode (so every window emits at
    the final trigger, closed or not), memory-sinked — the streaming
    engine's windows must equal the batch epoch-day buckets the oracle
    computes.  Values are integer cents, so state-store accumulation
    order can't perturb the sums."""
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    # Probe the generation's RAW ts encoding (load_table call first: it
    # pins the UTC zone + nanosAsLong confs but normalizes its own output,
    # so the raw probe must re-read): nanos-as-long, NTZ, or plain
    # timestamp — the stream schema must match what the files store.
    load_table(spark, sf, "events")
    ts_dtype = dict(spark.read.parquet(f"{sf}/events.parquet").dtypes)["ts"]
    ts_field = {
        "bigint": StructField("ts", LongType()),
        "timestamp_ntz": StructField("ts", TimestampNTZType()),
    }.get(ts_dtype, StructField("ts", TimestampType()))
    src_schema = StructType(
        [ts_field, StructField("value", DoubleType()), StructField("user_id", LongType())]
    )
    raw = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    ts_col = {
        "bigint": F.expr("timestamp_micros(ts div 1000)"),
        "timestamp_ntz": F.col("ts").cast("timestamp"),
    }.get(ts_dtype, F.col("ts"))
    stream = raw.select(
        ts_col.alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = stream.groupBy(F.window("ts", "1 day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("__s"),
    )
    sink = f"t_stream_tumbling_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "n_events",
        F.col("__s").cast("double").alias("sum_cents"),
    )


@register(
    "t_stream_sliding",
    """
    SELECT (CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) - i) * 86400000
             AS window_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             AS sum_cents
    FROM events, unnest(generate_series(0, 1)) AS t(i)
    GROUP BY 1
    """,
)
def t_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """REAL streaming sliding (hopping) windows under the driver's eye —
    ``F.window(ts, '2 days', '1 day')`` in complete mode, availableNow
    drain to a memory sink: every event lands in exactly TWO overlapping
    windows, so the streaming result must equal the batch unnest([0,1])
    expansion the oracle computes.  The sibling of `t_stream_tumbling`
    (same ts-encoding probing); integer-cent sums keep state-accumulation
    order out of the comparison.  (No per-window COUNT DISTINCT here on
    purpose — that would be collect-set state, unbounded per window in a
    real stream; the engine's bounded-distinct form is the HLL sketch,
    see `a_approx_sketch`.)"""
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    load_table(spark, sf, "events")
    ts_dtype = dict(spark.read.parquet(f"{sf}/events.parquet").dtypes)["ts"]
    ts_field = {
        "bigint": StructField("ts", LongType()),
        "timestamp_ntz": StructField("ts", TimestampNTZType()),
    }.get(ts_dtype, StructField("ts", TimestampType()))
    src_schema = StructType(
        [ts_field, StructField("value", DoubleType()), StructField("user_id", LongType())]
    )
    raw = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    ts_col = {
        "bigint": F.expr("timestamp_micros(ts div 1000)"),
        "timestamp_ntz": F.col("ts").cast("timestamp"),
    }.get(ts_dtype, F.col("ts"))
    stream = raw.select(
        ts_col.alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = stream.groupBy(F.window("ts", "2 days", "1 day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("__s"),
    )
    sink = f"t_stream_sliding_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "n_events",
        F.col("__s").cast("double").alias("sum_cents"),
    )


@register(
    "t_stream_session",
    # (_SESSIONIZE_CTE is defined further down; inline the same >= oracle)
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_ms(MIN(ts)) AS session_start_ms,
           epoch_ms(MAX(ts) + INTERVAL '4 hours') AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def t_stream_session(spark: SparkSession, sf: str) -> DataFrame:
    """REAL streaming SESSION windows under the driver's eye — the one
    window shape whose streaming state machine differs qualitatively from
    batch: session boundaries are not known up front, so the state store
    must MERGE adjacent sessions as bridging events arrive (Spark's
    merging-session-state path, exercised here because availableNow
    replays the parquet in file order, not time order).  Complete-mode
    drain to a memory sink; the final merged sessions must equal the
    batch gaps-and-islands oracle (same ``>=`` boundary semantics as
    `t_session_window`, end = last event + gap).  Completes the
    streaming-witness family: tumbling / sliding / dedup / interval-join
    / session all have real `writeStream` driver rows."""
    import uuid

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    load_table(spark, sf, "events")
    ts_dtype = dict(spark.read.parquet(f"{sf}/events.parquet").dtypes)["ts"]
    ts_field = {
        "bigint": StructField("ts", LongType()),
        "timestamp_ntz": StructField("ts", TimestampNTZType()),
    }.get(ts_dtype, StructField("ts", TimestampType()))
    src_schema = StructType([ts_field, StructField("user_id", LongType())])
    raw = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    ts_col = {
        "bigint": F.expr("timestamp_micros(ts div 1000)"),
        "timestamp_ntz": F.col("ts").cast("timestamp"),
    }.get(ts_dtype, F.col("ts"))
    stream = raw.select(F.col("user_id"), ts_col.alias("ts"))
    agg = stream.groupBy(
        F.session_window("ts", _SESSION_GAP).alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sink = f"t_stream_session_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select(
        "user_id",
        F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
        F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
        "n_events",
    )


@register(
    "t_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def t_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """REAL streaming exact deduplication under the driver's eye: the
    events parquet drained availableNow through stateful
    ``dropDuplicates`` on (user_id, event_type), append-mode to a memory
    sink — the reference silver stage's drop-duplicates semantics
    (stream-processor silver.py dedup step) executed by the streaming
    engine, not batch.  Keys-only output: WHICH physical row survives a
    streaming dedup is arrival-order-dependent, the surviving key set is
    not — so the comparison is deterministic while the state store still
    does real work (~one entry per distinct pair).  The watermark-bounded
    variant (T2, `dropDuplicatesWithinWatermark`) is pinned by crafted
    late/dup fixtures in the pytest suite; this registry form is the
    unbounded exact one with a clean DISTINCT oracle."""
    import uuid

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    load_table(spark, sf, "events")  # pins UTC/nanos confs for this sf
    src_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    deduped = raw.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    sink = f"t_stream_dedup_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select("user_id", "event_type")


@register(
    "t_stream_interval_join",
    """
    SELECT s.user_id AS user_id,
           s.event_id AS signup_event_id,
           p.event_id AS purchase_event_id,
           epoch_ms(s.ts) - epoch_ms(p.ts) AS gap_ms
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id
     AND p.ts <= s.ts AND p.ts >= s.ts - INTERVAL 1 HOUR
    """,
)
def t_stream_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """A REAL stream-stream interval join under the driver's eye
    (VERDICT r4 item 8): the signup and purchase streams of the same
    events source, watermarked on both sides, inner-joined on user with
    purchases in the hour BEFORE each signup
    (:func:`kafka_streaming_spark.streaming.joins.interval_join`),
    availableNow-drained to a memory sink.  The single-file source makes
    one micro-batch, so no state eviction can race the matches and the
    result must equal the batch/oracle interval join exactly."""
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    from kafka_streaming_spark.streaming.joins import interval_join

    load_table(spark, sf, "events")
    ts_dtype = dict(spark.read.parquet(f"{sf}/events.parquet").dtypes)["ts"]
    ts_field = {
        "bigint": StructField("ts", LongType()),
        "timestamp_ntz": StructField("ts", TimestampNTZType()),
    }.get(ts_dtype, StructField("ts", TimestampType()))
    src_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            ts_field,
        ]
    )
    raw = (
        spark.readStream.schema(src_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    ts_col = {
        "bigint": F.expr("timestamp_micros(ts div 1000)"),
        "timestamp_ntz": F.col("ts").cast("timestamp"),
    }.get(ts_dtype, F.col("ts"))
    typed = raw.select("event_id", "user_id", "event_type", ts_col.alias("ts"))
    signups = typed.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("s_ts"),
    )
    purchases = typed.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = interval_join(
        signups,
        purchases,
        left_key="s_user",
        right_key="p_user",
        left_ts="s_ts",
        right_ts="p_ts",
        watermark="30 seconds",
        lookback="1 hour",
    )
    sink = f"t_stream_interval_join_{uuid.uuid4().hex[:8]}"
    # A stream-stream join keeps FOUR state stores per shuffle partition;
    # at the batch-tuned 32 partitions that is 128 RocksDB instances for
    # one bounded drain (measured ~5x the whole join's work).  Scope the
    # state partitioning down for this query — the streaming analogue of
    # AQE coalescing — and restore the session setting after.
    with _tiny_stream_conf(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select(
        F.col("s_user").alias("user_id"),
        "signup_event_id",
        "purchase_event_id",
        (F.unix_millis(F.col("s_ts")) - F.unix_millis(F.col("p_ts"))).alias("gap_ms"),
    )


_SESSION_GAP = "4 hours"

_SESSIONIZE_CTE = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts {cmp} lag(ts) OVER w + INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
               AS session_id
      FROM flagged
    )
"""


@register(
    "t_sessionize",
    _SESSIONIZE_CTE.format(cmp=">")
    + """
    SELECT user_id, session_id,
           epoch_ms(MIN(ts)) AS session_start_ms,
           epoch_ms(MAX(ts)) AS session_last_ms,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def t_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization via the lag/running-sum window idiom
    (portable SQL form); per-(user, session) stats."""
    e = load_table(spark, sf, "events").select("user_id", "ts")
    return session_stats(e, ["user_id"], "ts", gap=_SESSION_GAP)


@register(
    "t_session_window",
    _SESSIONIZE_CTE.format(cmp=">=")
    + """
    SELECT user_id,
           epoch_ms(MIN(ts)) AS session_start_ms,
           epoch_ms(MAX(ts) + INTERVAL '4 hours') AS session_end_ms,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def t_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Native ``F.session_window`` grouping — the idiomatic (and
    streaming-capable) sessionization; end = last event + gap, and a new
    session opens at exactly ts = prev + gap (hence ``>=`` in the oracle)."""
    e = load_table(spark, sf, "events").select("user_id", "ts")
    return session_window_agg(e, ["user_id"], "ts", gap=_SESSION_GAP)


@register(
    "x_event_funnel",
    """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
    UNION ALL
    SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM t2
    UNION ALL
    SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM t3
    """,
)
def x_event_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, each stage
    STRICTLY after the previous — the product-analytics sequence-match
    operator): stage k's anchor is the user's earliest qualifying event
    after their stage-(k-1) anchor, built as filter → min-aggregate →
    join per stage.  Each stage shrinks the key set, so successive joins
    get cheaper; all three stages shuffle on user_id and AQE folds the
    shrinking sides to broadcasts.  No window over full history — state
    per user is one timestamp per stage, the same invariant that makes
    the streaming form incremental."""
    e = load_table(spark, sf, "events").select(
        "user_id", "event_type", F.unix_millis(F.col("ts")).alias("ms")
    )

    def stage(prev: DataFrame | None, etype: str, out: str) -> DataFrame:
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            pcol = prev.columns[1]
            s = s.join(prev, "user_id").filter(F.col("ms") > F.col(pcol))
        return s.groupBy("user_id").agg(F.min("ms").alias(out))

    t1 = stage(None, "view", "t1")
    t2 = stage(t1, "click", "t2")
    t3 = stage(t2, "purchase", "t3")
    u = (
        t1.select(F.lit("1_view").alias("stage"))
        .unionAll(t2.select(F.lit("2_click")))
        .unionAll(t3.select(F.lit("3_purchase")))
    )
    return u.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "x_cohort_retention",
    """
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_ms(ts) / 604800000.0) AS BIGINT) AS week
      FROM events
    ), first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT first.cohort_week,
           wk.week - first.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM wk JOIN first ON wk.user_id = first.user_id
    GROUP BY first.cohort_week, week_offset
    """,
)
def x_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in every subsequent week they were active — the classic
    retention matrix.  One distinct pass (user, week), a min-aggregate
    for cohort assignment, and a self-join co-partitioned on user_id;
    the result is |cohorts| x |offsets| rows regardless of corpus size."""
    e = load_table(spark, sf, "events")
    wk = e.select(
        "user_id",
        F.floor(F.unix_millis(F.col("ts")) / F.lit(604800000.0)).cast("long").alias("week"),
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "x_doc_sample_weighted",
    """
    WITH mx AS (
      SELECT CAST(MAX(n_chars) AS BIGINT) AS m FROM documents
    )
    SELECT doc_id, n_chars
    FROM documents CROSS JOIN mx
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000000
          < (n_chars * 1000000) // mx.m
    """,
)
def x_doc_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted deterministic Bernoulli sample: doc kept with
    probability ``n_chars / max(n_chars)`` decided by a pure hash of its
    id against an integer threshold — the size-proportional sampling
    step (duplicate-weighted corpus thinning, importance-proportional
    eval pools) with full retry/engine reproducibility, no rand().
    Map-side except the 1-row max broadcast."""
    d = load_table(spark, sf, "documents")
    from kafka_streaming_spark.functions.dedup import portable_hash60

    mx = d.agg(F.max("n_chars").cast("long").alias("m"))
    return (
        d.crossJoin(F.broadcast(mx))
        .filter(
            F.pmod(portable_hash60(F.col("doc_id").cast("string")), F.lit(1000000))
            < F.expr("(n_chars * 1000000) DIV m")
        )
        .select("doc_id", "n_chars")
    )


@register(
    "x_quantile_binning",
    """
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice < b.q1 THEN 0
                WHEN o_totalprice < b.q2 THEN 1
                WHEN o_totalprice < b.q3 THEN 2
                ELSE 3 END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(MIN(o_totalprice) * 100.0) AS BIGINT) / 100.0 AS lo,
           CAST(ROUND(MAX(o_totalprice) * 100.0) AS BIGINT) / 100.0 AS hi
    FROM orders CROSS JOIN b
    GROUP BY 1
    """,
)
def x_quantile_binning(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-frequency feature binning (quartiles): cutpoints from ONE
    exact-percentile aggregate broadcast back over the table, bucket
    assignment by comparison — NOT an ``ntile`` window, which would
    funnel the whole table through one sorted partition at scale.  The
    boundary doubles are interpolated identically in both engines
    (`a_percentiles` equivalence), so bucket decisions agree exactly."""
    o = load_table(spark, sf, "orders")
    b = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") < F.col("q1"), F.lit(0))
        .when(F.col("o_totalprice") < F.col("q2"), F.lit(1))
        .when(F.col("o_totalprice") < F.col("q3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _round_fixed(F.min("o_totalprice"), 2).alias("lo"),
            _round_fixed(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "x_trending_topk",
    """
    WITH b AS (
      SELECT CAST(floor(epoch_ms(ts) / 86400000.0 / 7) AS BIGINT) AS week,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT week, event_type, n, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY week
                                       ORDER BY n DESC, event_type) AS rn
          FROM b)
    WHERE rn <= 3
    """,
)
def x_trending_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Trending items per time window: weekly event-type counts ranked
    within each week, top-3 kept — the leaderboard/trending-feed query.
    The rank window runs over the AGGREGATED (week, type) table —
    |weeks|x|types| rows — never over raw events; count + rank are two
    shuffles on small keys at any scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    b = e.groupBy(
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0) / F.lit(7.0))
        .cast("long")
        .alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("week").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        b.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("week", "event_type", "n", "rank")
    )


@register(
    "x_conversion_latency",
    """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), lat AS (
      SELECT t1.user_id,
             epoch_ms(t3.t3) - epoch_ms(t1.t1) AS ms
      FROM t1 JOIN t3 ON t1.user_id = t3.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(ms) AS BIGINT) AS min_ms,
           CAST(ROUND(quantile_cont(ms, 0.5) * 1000000.0) AS BIGINT) / 1000000.0
             AS p50_ms,
           CAST(ROUND(quantile_cont(ms, 0.95) * 1000000.0) AS BIGINT) / 1000000.0
             AS p95_ms,
           CAST(MAX(ms) AS BIGINT) AS max_ms
    FROM lat
    """,
)
def x_conversion_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert distribution: per user, first view → first
    subsequent purchase latency, summarized as count/min/p50/p95/max —
    the product-metric companion of the funnel (how LONG conversion
    takes, not just whether).  Same one-timestamp-per-stage state as the
    funnel; the exact percentiles use the proven
    ``percentile`` ≡ ``quantile_cont`` equivalence."""
    e = load_table(spark, sf, "events")
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis(F.col("ts"))).alias("t1"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id")
        .filter(F.unix_millis(F.col("ts")) > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min(F.unix_millis(F.col("ts"))).alias("t3"))
    )
    lat = t1.join(t3, "user_id").select((F.col("t3") - F.col("t1")).alias("ms"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("ms").alias("min_ms"),
        _round_fixed(F.expr("percentile(ms, 0.5)"), 6).alias("p50_ms"),
        _round_fixed(F.expr("percentile(ms, 0.95)"), 6).alias("p95_ms"),
        F.max("ms").alias("max_ms"),
    )


@register(
    "x_robust_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, abs(e.value - med.med) AS d, med.med
      FROM events e JOIN med ON e.event_type = med.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad, MAX(med) AS med
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(ROUND(mad.med * 1000000.0) AS BIGINT) / 1000000.0 AS med,
           CAST(ROUND(mad.mad * 1000000.0) AS BIGINT) / 1000000.0 AS mad
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type, mad.med, mad.mad
    """,
)
def x_robust_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust anomaly detection per group: median/MAD (the
    outlier-resistant z-score) with outliers counted at the classic
    ``|x - med| > 3·MAD`` threshold.  Exact interpolating percentiles
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — the proven
    equivalence from `a_percentiles`) and a scalar per-row deviation
    formula mean both engines make identical threshold decisions with no
    rounding in the comparison path.  Two grouped percentile passes +
    two joins on the 5-row group key; at 100 TB swap the exact
    percentile for ``approx_percentile`` exactly as `a_percentiles`
    documents."""
    e = load_table(spark, sf, "events")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad"), F.max("med").alias("med")
    )
    joined = dev.drop("med").join(F.broadcast(mad), "event_type")
    return joined.groupBy("event_type", "med", "mad").agg(
        F.sum((F.col("d") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_total"),
    ).select(
        "event_type",
        "n_outliers",
        "n_total",
        _round_fixed(F.col("med"), 6).alias("med"),
        _round_fixed(F.col("mad"), 6).alias("mad"),
    )


@register(
    "x_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type FROM seq WHERE next_type IS NOT NULL
    ), cnt AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs GROUP BY event_type, next_type
    ), tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY event_type
    )
    SELECT cnt.event_type AS from_type, cnt.next_type AS to_type, cnt.n,
           (cnt.n * 1000000) // tot.t AS p_micro
    FROM cnt JOIN tot ON cnt.event_type = tot.event_type
    """,
)
def x_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    consecutive (event, next-event) pairs via ``lead`` on the per-user
    timeline (deterministic (ts, event_id) tiebreak), counted globally,
    with the empirical transition probability in exact integer
    micro-units.  One window shuffle on user_id + one count shuffle on
    the 25-cell pair space; output is |event_types|² regardless of
    volume — the behavioral-analytics complement of the strict-order
    funnel."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("event_type").agg(F.sum("n").alias("t"))
    return cnt.join(tot, "event_type").select(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
        "n",
        F.expr("(n * 1000000) DIV t").alias("p_micro"),
    )


@register(
    "x_time_resample",
    """
    WITH spine AS (
      SELECT unnest(generate_series(19723, 19753)) AS day_num
    ), daily AS (
      SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day_num,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
               / 100.0 AS sum_value
      FROM events GROUP BY 1
    )
    SELECT spine.day_num,
           coalesce(daily.n_events, 0) AS n_events,
           coalesce(daily.sum_value, 0.0) AS sum_value
    FROM spine LEFT JOIN daily ON spine.day_num = daily.day_num
    """,
)
def x_time_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series resampling with gap fill: a generated calendar spine
    (the full 31 days of Jan 2024 as epoch-day numbers 19723-19753,
    ``sequence``+``explode``) left-joined
    to daily aggregates so empty days appear as explicit zeros — the
    resample/asfreq operator every monitoring pipeline needs (missing
    periods are silent lies otherwise).  The spine is generated, never
    scanned; the aggregate is one shuffle; the spine join broadcasts."""
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(19723), F.lit(19753))).alias("day_num")
    )
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long").alias("day_num")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), "sum_value"),
    )
    return (
        F.broadcast(spine)
        .join(daily, "day_num", "left")
        .select(
            "day_num",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "x_image_meta",
    """
    WITH h AS (
      SELECT doc_id AS asset_id,
             'image/synthetic' AS media_type,
             CAST(length(text) AS BIGINT) AS n_bytes,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split_regex(substr(text, 1, 16), ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 131 + b) % 1000003
             ) AS hh
      FROM documents
    )
    SELECT asset_id, media_type, n_bytes,
           CAST(64 + hh % 1024 AS INTEGER) AS width,
           CAST(64 + (hh // 1024) % 1024 AS INTEGER) AS height,
           CAST(1 + n_bytes % 4 AS INTEGER) AS channels
    FROM h
    """,
)
def x_image_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: documents re-encoded as binary assets →
    Arrow-batched ``mapInPandas`` metadata decode (the decoder is the
    documented deterministic stub; the oracle replays its byte-fold hash —
    valid because the corpus is ASCII, so chars == bytes)."""
    d = load_table(spark, sf, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/synthetic").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return decode_image_meta(assets)


