"""round-5+ batch, part 1 of 3: scans, bitwise, series, streaming
witnesses — split from the monolithic queries.py (round 9, VERDICT r8
ask #7), then re-split in round 10 (VERDICT r9 ask #4: this module was
6,846 lines) into q17 / q17b_late_r5_stats_text /
q17c_late_r5_ops_forecast.  Mechanical move: query bodies are verbatim;
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
from kafka_streaming_spark.queries.q06_ext_joins_session_multimodal import (  # noqa: F401
    _SESSIONIZE_CTE,
    _SESSION_GAP,
)
from kafka_streaming_spark.queries.q15b_misc_graph_part2 import (  # noqa: F401
    _nation_daily_cents,
)

# ===========================================================================
# Round-5 late batch: partition-pruned scans, bitwise surface, exact
# covariance, non-parametric tests, series repair, winsorizing, containment
# dedup, outer-join / multi-source streaming witnesses
# ===========================================================================


@register(
    "t_stream_update",
    """
    WITH e AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % 3 AS b
      FROM events
    )
    SELECT epoch_ms(w) AS window_start_ms,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS n_emissions
    FROM e GROUP BY 1
    """,
)
def t_stream_update(spark: SparkSession, sf: str) -> DataFrame:
    """UPDATE output mode witnessed end to end — the one emission contract
    the streaming family didn't yet pin (complete re-emits everything,
    append emits once-and-final; update re-emits a window EACH batch it
    changes).  Events are staged into three arrival batches by
    ``event_id % 3`` under ``maxFilesPerTrigger=1``; the memory sink then
    holds one row per (window, updating batch).  Per window, the FINAL
    state is the emission with the highest running count (counts grow
    strictly within a window), and the number of emissions must equal the
    number of distinct staging buckets that window received rows from —
    both reconstructed analytically by the oracle from the raw table, so
    the hash check pins emission CARDINALITY, not just final values."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    ev = load_table(spark, sf, "events").select(
        "ts", F.round(F.col("value") * 100).cast("long").alias("cents"), "event_id"
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_update_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        for i in range(3):
            df = ev.filter(F.col("event_id") % 3 == i).select("ts", "cents")
            df.coalesce(1).write.parquet(f"{build}/p{i}")
            part = glob.glob(f"{build}/p{i}/*.parquet")[0]
            shutil.copy(part, f"{build}/src/f{i}.parquet")
            os.utime(f"{build}/src/f{i}.parquet", (1_000_000 + i, 1_000_000 + i))
            shutil.rmtree(f"{build}/p{i}")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("cents", LongType())]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = raw.groupBy(F.window("ts", "1 day")).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("sum_cents")
    )
    sink = f"t_stream_update_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = spark.table(sink)
    return (
        emitted.groupBy(F.unix_millis(F.col("window.start")).alias("window_start_ms"))
        .agg(
            F.max(F.struct("n_events", "sum_cents")).alias("final"),
            F.count(F.lit(1)).alias("n_emissions"),
        )
        .select(
            "window_start_ms",
            F.col("final.n_events").alias("n_events"),
            F.col("final.sum_cents").cast("long").alias("sum_cents"),
            F.col("n_emissions").cast("long").alias("n_emissions"),
        )
    )


@register(
    "x_rendezvous_shards",
    """
    WITH docs AS (
      SELECT doc_id FROM documents
    ), h AS (
      SELECT doc_id, s,
             CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
                    CAST(s AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
      FROM docs, unnest(generate_series(0, 8)) AS t(s)
    ), mx8 AS (
      SELECT doc_id, MAX(hv) AS mh FROM h WHERE s < 8 GROUP BY doc_id
    ), mx9 AS (
      SELECT doc_id, MAX(hv) AS mh FROM h GROUP BY doc_id
    ), a8 AS (
      SELECT h.doc_id, MIN(s) AS shard8
      FROM h JOIN mx8 ON h.doc_id = mx8.doc_id AND h.hv = mx8.mh
      WHERE s < 8 GROUP BY h.doc_id
    ), a9 AS (
      SELECT h.doc_id, MIN(s) AS shard9
      FROM h JOIN mx9 ON h.doc_id = mx9.doc_id AND h.hv = mx9.mh
      GROUP BY h.doc_id
    )
    SELECT CAST(shard9 AS BIGINT) AS shard,
           COUNT(*) AS n_after,
           CAST(SUM(CASE WHEN shard8 = shard9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stayed,
           CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_arrived
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY 1
    """,
)
def x_rendezvous_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding — the consistent-
    placement primitive under shard scale-out: each doc goes to the shard
    with the max portable hash of (doc, shard), and when an 9th shard
    joins, ONLY docs whose new shard wins the hash race move (~1/9 of the
    corpus, vs 8/9 under mod-N).  Emits the post-scale-out occupancy and
    stayed/arrived counts per shard; ties (astronomically unlikely but
    determinism is the contract) break to the lowest shard id via the
    max-then-min-matching construction the oracle replays."""
    docs = load_table(spark, sf, "documents").select("doc_id")
    h = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("s")
    ).select(
        "doc_id",
        "s",
        D.portable_hash60(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("s").cast("string"))
        ).alias("hv"),
    )
    # Both argmaxes resolve in ONE doc-keyed aggregation: max(struct(hv,
    # -s)) picks the highest hash and breaks (impossible-in-practice) ties
    # to the LOWEST shard id — exactly the max-then-min-matching
    # construction the oracle replays with joins.  No self-joins, two
    # shuffles total (doc agg + shard rollup).
    pair = F.struct(F.col("hv").alias("h"), (-F.col("s")).alias("ns"))
    agg = h.groupBy("doc_id").agg(
        F.max(F.when(F.col("s") < 8, pair)).alias("m8"),
        F.max(pair).alias("m9"),
    )
    assigned = agg.select(
        (-F.col("m8.ns")).alias("shard8"), (-F.col("m9.ns")).alias("shard9")
    )
    return (
        assigned.groupBy(F.col("shard9").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.sum(F.when(F.col("shard8") == F.col("shard9"), 1).otherwise(0))
            .cast("long")
            .alias("n_stayed"),
            F.sum(F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0))
            .cast("long")
            .alias("n_arrived"),
        )
    )


@register(
    "x_mutual_best_match",
    """
    WITH ue AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), best_type AS (
      SELECT user_id, event_type, c FROM (
        SELECT user_id, event_type, c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, event_type) AS rn
        FROM ue) WHERE rn = 1
    ), best_user AS (
      SELECT user_id, event_type, c FROM (
        SELECT user_id, event_type, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, user_id) AS rn
        FROM ue) WHERE rn = 1
    )
    SELECT t.user_id, t.event_type, CAST(t.c AS BIGINT) AS n_events
    FROM best_type t JOIN best_user u
      ON t.user_id = u.user_id AND t.event_type = u.event_type
    """,
)
def x_mutual_best_match(spark: SparkSession, sf: str) -> DataFrame:
    """MUTUAL-argmax matching (the reciprocal-best-hit rule from entity
    linkage / bioinformatics): keep (user, event_type) pairs where the
    type is that user's most frequent AND the user is that type's heaviest
    user.  Two windowed argmaxes over the same pre-aggregated count table
    (computed once — the shuffles rank 150-row relations, not raw events)
    joined on double equality; ties break deterministically by key."""
    # Both argmaxes are struct-min AGGREGATES (min(struct(-c, key)) = max
    # count, ties to the smallest key — the x_preference_pairs sign trick),
    # never windows: a per-event_type window collapses to 5 partitions and
    # single-threads the sort at scale, while the aggregate keeps its
    # map-side partial at any cardinality.
    ue = (
        load_table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    best_type = ue.groupBy("user_id").agg(
        F.min(
            F.struct(
                (-F.col("c")).alias("nc"),
                F.col("event_type").alias("et"),
                F.col("c").alias("c"),
            )
        ).alias("m")
    ).select("user_id", F.col("m.et").alias("event_type"), F.col("m.c").alias("c"))
    best_user = ue.groupBy("event_type").agg(
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("user_id").alias("uid"))
        ).alias("m")
    ).select(F.col("m.uid").alias("user_id"), "event_type")
    return best_type.join(best_user, ["user_id", "event_type"]).select(
        "user_id", "event_type", F.col("c").cast("long").alias("n_events")
    )


@register(
    "x_rolling_corr",
    """
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day_num,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                           THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  // GREATEST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 1)
                  // 100 AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  // GREATEST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 1)
                  // 100 AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ), w AS (
      SELECT day_num,
        COUNT(*) OVER f AS n,
        SUM(x) OVER f AS sx, SUM(y) OVER f AS sy,
        SUM(x*y) OVER f AS sxy, SUM(x*x) OVER f AS sxx, SUM(y*y) OVER f AS syy
      FROM daily
      WINDOW f AS (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day_num, CAST(n AS BIGINT) AS n_days,
      CASE WHEN n < 7 OR (n*sxx - sx*sx) * (n*syy - sy*sy) = 0 THEN NULL
           ELSE CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)
                  / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                     * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) * 1000000.0)
                AS BIGINT)
      END AS corr_micro
    FROM w
    """,
)
def x_rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the daily mean click and
    purchase values: every co-moment (n, Σx, Σy, Σxy, Σx², Σy²) is an
    EXACT integer over truncated-dollar daily means, and the correlation
    itself is one fixed IEEE chain (int→double exact below 2^53, one
    sqrt·sqrt product, one division, one round) — bit-identical across
    engines, the float-determinism pattern from x_zscore_normalize.
    Incomplete leading windows emit NULL."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        (F.unix_millis(F.col("ts")) / F.lit(86400000)).cast("long").alias("day_num")
    ).agg(
        F.expr(
            "CAST(coalesce(sum(CASE WHEN event_type = 'click'"
            " THEN CAST(round(value * 100) AS BIGINT) END), 0)"
            " div greatest(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 1)"
            " div 100 AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100) AS BIGINT) END), 0)"
            " div greatest(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 1)"
            " div 100 AS BIGINT)"
        ).alias("y"),
    )
    f = W.orderBy("day_num").rowsBetween(-6, 0)
    w = daily.select(
        "day_num",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).alias("syy"),
    )
    return w.select(
        "day_num",
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CASE WHEN n < 7 OR (n*sxx - sx*sx) * (n*syy - sy*sy) = 0 THEN NULL"
            " ELSE CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)"
            "   / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))"
            "      * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) * 1000000.0)"
            " AS BIGINT) END"
        ).alias("corr_micro"),
    )


@register(
    "x_join_size_estimate",
    """
    WITH ok AS (
      SELECT o_orderkey AS k FROM orders
      WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                 AS BIGINT) % 16 = 0
    ), lk AS (
      SELECT l_orderkey AS k FROM lineitem
      WHERE CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                 AS BIGINT) % 16 = 0
    ), s AS (
      SELECT COUNT(*) AS sc FROM ok JOIN lk USING (k)
    ), e AS (
      SELECT COUNT(*) AS ec FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT CAST(16 * s.sc AS BIGINT) AS est_rows,
           CAST(e.ec AS BIGINT) AS exact_rows,
           CAST(abs(16 * s.sc - e.ec) * 1000000 // e.ec AS BIGINT) AS abs_err_micro
    FROM s CROSS JOIN e
    """,
)
def x_join_size_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Join-cardinality estimation by KEY-SYNCHRONIZED hash sampling — the
    optimizer-statistics primitive: keep the 1/16 of JOIN KEYS whose
    portable hash lands in bucket 0 (the same keys survive on BOTH sides,
    so sampled pairs join exactly as they would in full), run the small
    join, scale by 16.  Row-Bernoulli sampling would estimate p²·|J| and
    be useless; key-synchronized sampling is unbiased for equi-joins.  The
    estimate, the exact count, and the relative error are all emitted so
    the driver hash-checks the whole identity; the two 1-row scalar counts
    merge via a broadcast cross join (allow-listed)."""
    o = load_table(spark, sf, "orders").select(F.col("o_orderkey").alias("k"))
    li = load_table(spark, sf, "lineitem").select(F.col("l_orderkey").alias("k"))

    def _keep(df: DataFrame) -> DataFrame:
        return df.filter(
            F.pmod(D.portable_hash60(F.col("k").cast("string")), F.lit(16)) == 0
        )

    s = _keep(o).join(_keep(li), "k").agg(F.count(F.lit(1)).alias("sc"))
    # The exact count never materializes the join: |A ⋈ B| = Σ_k cntA(k)·
    # cntB(k), two map-side-combined groupBys + a key-count join — at 10x
    # this is 3x cheaper than counting the physical join rows, and at
    # 100 TB it is the only shape that doesn't shuffle the fact table twice.
    oc = o.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
    lc = li.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
    e = oc.join(lc, "k").agg(F.sum(F.col("ca") * F.col("cb")).alias("ec"))
    return s.crossJoin(e).select(
        (16 * F.col("sc")).cast("long").alias("est_rows"),
        F.col("ec").cast("long").alias("exact_rows"),
        F.expr("CAST(abs(16 * sc - ec) * 1000000 div ec AS BIGINT)").alias(
            "abs_err_micro"
        ),
    )


@register(
    "t_stream_left_outer",
    """
    WITH s AS (
      SELECT user_id, event_id AS signup_event_id, ts AS s_ts
      FROM events WHERE event_type = 'signup'
    ), p AS (
      SELECT user_id, event_id AS purchase_event_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.signup_event_id, p.purchase_event_id,
           epoch_ms(s.s_ts) - epoch_ms(p.p_ts) AS gap_ms
    FROM s LEFT JOIN p
      ON s.user_id = p.user_id
     AND p.p_ts <= s.s_ts
     AND p.p_ts >= s.s_ts - INTERVAL 1 HOUR
    """,
)
def t_stream_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, null-emission semantics
    witnessed end to end: unmatched signups may only emit their
    null-padded row once the watermark proves no purchase can still
    arrive, and Spark performs that eviction at the START of the batch
    AFTER the watermark advances.  So the source is staged into three
    arrival batches under ``maxFilesPerTrigger=1``: (0) every real
    signup/purchase row, (1) a non-matching advancer pair (+10 days, on
    BOTH sides — the watermark is the min across the two streams), (2) a
    second advancer pair (+20 days) whose batch evicts-and-emits the
    stragglers the first advancer's watermark covers.  After the drain
    the emitted set must equal the plain batch left-outer interval join
    the oracle runs (advancer keys are negative and filtered out)."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from kafka_streaming_spark.streaming.joins import interval_join

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_left_outer_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        real = ev.filter(F.col("event_type").isin("signup", "purchase"))
        mx = real.agg(F.max("ts").alias("mx"))

        def _adv(days: int) -> DataFrame:
            shifted = F.col("mx") + F.expr(f"INTERVAL {days} DAYS")
            return mx.select(
                F.lit(-1).cast("long").alias("user_id"),
                F.lit(-1).cast("long").alias("event_id"),
                F.lit("purchase").alias("event_type"),
                shifted.alias("ts"),
            ).union(
                mx.select(
                    F.lit(-2).cast("long").alias("user_id"),
                    F.lit(-2).cast("long").alias("event_id"),
                    F.lit("signup").alias("event_type"),
                    shifted.alias("ts"),
                )
            )

        for i, df in enumerate([real, _adv(10), _adv(20)]):
            df.coalesce(1).write.parquet(f"{build}/p{i}")
            part = glob.glob(f"{build}/p{i}/*.parquet")[0]
            shutil.copy(part, f"{build}/src/f{i}.parquet")
            os.utime(f"{build}/src/f{i}.parquet", (1_000_000 + i, 1_000_000 + i))
            shutil.rmtree(f"{build}/p{i}")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    signups = raw.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("s_ts"),
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
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
        how="left_outer",
    )
    sink = f"t_stream_left_outer_{uuid.uuid4().hex[:8]}"
    # r12 (guide §1 — fixed streaming costs): 2 state partitions (the
    # join state is tiny; at 4, every one of the 3 micro-batches paid 4
    # per-partition store open/commit cycles ×4 state stores of the
    # stream-stream join) and no trailing no-data batch (its only
    # evictions are the advancer rows the s_user >= 0 filter drops).
    # Interleaved A/B at sf0.1: 6.60s → 3.04s best-of-2; emitted rows
    # verified identical.
    with _tiny_stream_conf(spark, partitions=2, no_data_batches=False):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(sink)
        .filter(F.col("s_user") >= 0)
        .select(
            F.col("s_user").alias("user_id"),
            "signup_event_id",
            "purchase_event_id",
            (F.unix_millis(F.col("s_ts")) - F.unix_millis(F.col("p_ts"))).alias(
                "gap_ms"
            ),
        )
    )


@register(
    "t_stream_union",
    """
    SELECT epoch_ms(time_bucket(INTERVAL '1 day', ts)) AS window_start_ms,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
    """,
)
def t_stream_union(spark: SparkSession, sf: str) -> DataFrame:
    """MULTI-SOURCE streaming: two independent file-stream sources (the
    events table staged into disjoint halves by event_id parity — the
    two-topic shape of a real ingest fan-in) unioned INSIDE one streaming
    query, through a tumbling day aggregate in complete mode.  The union
    of two streams must behave exactly like one stream of the union: the
    windowed sums equal the single-source batch oracle, cent-exact."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    ev = load_table(spark, sf, "events").select(
        "ts", F.round(F.col("value") * 100).cast("long").alias("cents"), "event_id"
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_union_{slug}"
    if not os.path.isdir(f"{base}/a"):  # deterministic content → reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        for half, pred in (("a", 0), ("b", 1)):
            os.makedirs(f"{build}/{half}")
            df = ev.filter(F.col("event_id") % 2 == pred).select("ts", "cents")
            df.coalesce(1).write.parquet(f"{build}/p")
            part = glob.glob(f"{build}/p/*.parquet")[0]
            shutil.copy(part, f"{build}/{half}/data.parquet")
            shutil.rmtree(f"{build}/p")
        os.makedirs(base, exist_ok=True)
        for half in ("a", "b"):
            try:
                os.rename(f"{build}/{half}", f"{base}/{half}")
            except OSError:
                pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("cents", LongType())]
    )
    stream_a = spark.readStream.schema(schema).parquet(f"{base}/a")
    stream_b = spark.readStream.schema(schema).parquet(f"{base}/b")
    agg = (
        stream_a.union(stream_b)
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("sum_cents"))
    )
    sink = f"t_stream_union_{uuid.uuid4().hex[:8]}"
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
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )

_PARTSCAN_READY: set[str] = set()


def ensure_partitioned_copy(spark: SparkSession, sf: str) -> str:
    """Once-per-sf hive-partitioned events copy (``event_type=<v>/`` dirs)
    for :func:`f_partitioned_scan`: the physical layout every large-scale
    ingest lands on (reference bronze tables cluster on the stream key the
    same way).  Idempotent; timestamps travel as epoch millis so the copy
    is encoding-stable across testdata generations."""
    import os as _os

    dest = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".tmp",
        f"events_hivepart_{_os.path.basename(sf.rstrip('/'))}",
    )
    if dest in _PARTSCAN_READY:
        return dest
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        ev = load_table(spark, sf, "events").select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            "value",
            "event_type",
        )
        ev.write.partitionBy("event_type").mode("overwrite").parquet(dest)
    _PARTSCAN_READY.add(dest)
    return dest


@register(
    "f_partitioned_scan",
    """
    SELECT event_type, epoch_ms(ts) // 86400000 AS day_num,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2
    """,
)
def f_partitioned_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Hive-partitioned source scan with PARTITION PRUNING: the predicate on
    the partition column never touches a data file — Spark resolves it
    against directory names alone (plan shows ``PartitionFilters``, and the
    pruning gate in tests/test_plan_quality.py pins it).  At 100 TB this is
    the difference between reading 2/5 of the table and all of it; values
    must equal the unpartitioned oracle scan exactly."""
    part = spark.read.parquet(ensure_partitioned_copy(spark, sf))
    return (
        part.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type",
            (F.col("ts_ms") / F.lit(86400000)).cast("long").alias("day_num"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
    )


@register(
    "f_bitwise_pack",
    """
    WITH b AS (
      SELECT event_type,
             event_id & user_id AS band,
             event_id | user_id AS bor,
             xor(event_id, user_id) AS bxor,
             (user_id % 16) << 3 AS shl,
             CAST(bit_count(event_id) AS BIGINT) AS pc
      FROM events
    )
    SELECT event_type, COUNT(*) AS n,
           CAST(bit_or(band) AS BIGINT) AS or_of_and,
           CAST(bit_and(bor) AS BIGINT) AS and_of_or,
           CAST(bit_xor(bxor) AS BIGINT) AS xor_of_xor,
           CAST(SUM(shl) AS BIGINT) AS sum_shl,
           CAST(SUM(pc) AS BIGINT) AS sum_popcount
    FROM b GROUP BY event_type
    """,
)
def f_bitwise_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise expression + aggregate surface (&, |, ^, <<, popcount and the
    bit_or/bit_and/bit_xor aggregates): the id-mask/bitmap toolbox that
    bitmap-index and bloom-style ops build on.  Everything is exact BIGINT
    arithmetic — identical in both engines by construction."""
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "event_type")
    b = ev.select(
        "event_type",
        F.expr("event_id & user_id").alias("band"),
        F.expr("event_id | user_id").alias("bor"),
        F.expr("event_id ^ user_id").alias("bxor"),
        F.expr("shiftleft(user_id % 16, 3)").alias("shl"),
        F.expr("CAST(bit_count(event_id) AS BIGINT)").alias("pc"),
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_or(band)").cast("long").alias("or_of_and"),
        F.expr("bit_and(bor)").cast("long").alias("and_of_or"),
        F.expr("bit_xor(bxor)").cast("long").alias("xor_of_xor"),
        F.sum("shl").cast("long").alias("sum_shl"),
        F.sum("pc").cast("long").alias("sum_popcount"),
    )


@register(
    "x_covariance_matrix",
    """
    WITH m AS (
      SELECT list_transform(embedding[1:8],
               x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS m
      FROM embeddings
    ), p AS (
      SELECT unnest(flatten(list_transform(generate_series(1, 8), i ->
               list_transform(generate_series(i, 8), j ->
                 {'i': i - 1, 'j': j - 1, 'x': m[i], 'y': m[j]})))) AS s
      FROM m
    )
    -- cov_num combines the sums in HUGEINT (no inner BIGINT downcasts:
    -- n·sxy and sx·sy are ~1e18 at the 100x replica and wrap past it);
    -- the OUTPUT columns are BIGINT-ranged values.
    SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(s.x) AS BIGINT) AS sx,
           CAST(SUM(s.y) AS BIGINT) AS sy,
           CAST(SUM(s.x * s.y) AS BIGINT) AS sxy,
           CAST(COUNT(*) * SUM(s.x * s.y) - SUM(s.x) * SUM(s.y)
                AS BIGINT) AS cov_num
    FROM p GROUP BY 1, 2
    """,
)
def x_covariance_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Exact pairwise covariance (upper triangle) of the first 8 embedding
    dims — the feature-correlation pass before whitening/PCA in an
    embedding pipeline.  Dims are quantized to exact milli integers, so the
    co-moment sums and the covariance numerator n*Σxy − ΣxΣy are exact
    BIGINTs in both engines (no float accumulation order anywhere).  One
    explode + one groupBy on (i, j): 36 output groups regardless of row
    count — map-side partial aggregation does almost all the work."""
    emb = load_table(spark, sf, "embeddings")
    m = emb.select(
        F.expr(
            "transform(slice(embedding, 1, 8),"
            " x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))"
        ).alias("m")
    )
    pairs = m.select(
        F.explode(
            F.expr(
                "flatten(transform(m, (x, i) -> transform(m, (y, j) ->"
                " named_struct('i', i, 'j', j, 'x', x, 'y', y))))"
            )
        ).alias("s")
    ).filter(F.col("s.i") <= F.col("s.j"))
    agg = pairs.groupBy(
        F.col("s.i").cast("long").alias("i"), F.col("s.j").cast("long").alias("j")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s.x").cast("long").alias("sx"),
        F.sum("s.y").cast("long").alias("sy"),
        F.sum(F.col("s.x") * F.col("s.y")).cast("long").alias("sxy"),
    )
    # DECIMAL bridge for the co-moment combination: n·sxy and sx·sy are
    # ~1e18 at the 100x embeddings replica (9x headroom) and wrap past
    # it; the VALUE of cov_num stays long-ranged, only the intermediate
    # products need the width (DuckDB computes them in HUGEINT).
    return agg.withColumn(
        "cov_num",
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxy")
            - F.col("sx").cast("decimal(38,0)") * F.col("sy")
        ).cast("long"),
    )


@register(
    "x_mann_whitney",
    """
    WITH v AS (
      SELECT event_type AS grp, value FROM events
      WHERE event_type IN ('click', 'purchase')
    ), r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY value)
               + COUNT(*) OVER (PARTITION BY value) - 1 AS two_r
      FROM v
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(two_r) AS BIGINT) AS two_rank_sum,
           CAST(SUM(two_r) - COUNT(*) * (COUNT(*) + 1) AS BIGINT) AS two_u
    FROM r GROUP BY grp
    """,
)
def x_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U (two-sample rank test) on click vs purchase values,
    kept fully exact: tied observations take the average rank, so DOUBLED
    rank sums (2R = 2*rank + ties − 1) stay integers — two_u = 2U = 2R −
    n(n+1).  Significance is a table lookup on (n, U) downstream; the
    distributed part is ranking, which the oracle replays rank-for-rank.
    Global-order rank = one total sort; at 100 TB swap in the partitioned
    rank composition used by x_ntile_quartiles (sort within range
    partitions + cumulative offsets)."""
    from pyspark.sql import Window as W

    v = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(F.col("event_type").alias("grp"), "value")
    # Rank over the DISTINCT-VALUE spine, not raw rows (the x_roc_auc
    # trick): every row at value v shares two_r(v) = 2·rank(v) + t(v) − 1
    # = 2·cum(v) − t(v) + 1, so one cumulative window over the bounded
    # price-granularity spine replaces a full-data global sort.
    h = v.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("grp") == "click", 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0)).alias("np"),
    )
    cum = F.sum("t").over(W.orderBy("value").rowsBetween(W.unboundedPreceding, 0))
    h2 = h.select(
        "nc", "np", (2 * cum - F.col("t") + 1).alias("two_r")
    )
    one = h2.agg(
        F.sum("nc").cast("long").alias("n_c"),
        F.sum(F.col("nc") * F.col("two_r")).cast("long").alias("r_c"),
        F.sum("np").cast("long").alias("n_p"),
        F.sum(F.col("np") * F.col("two_r")).cast("long").alias("r_p"),
    )
    stacked = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click").alias("grp"),
                    F.col("n_c").alias("n"),
                    F.col("r_c").alias("two_rank_sum"),
                ),
                F.struct(
                    F.lit("purchase").alias("grp"),
                    F.col("n_p").alias("n"),
                    F.col("r_p").alias("two_rank_sum"),
                ),
            )
        ).alias("s")
    )
    return stacked.select(
        F.col("s.grp").alias("grp"),
        F.col("s.n").alias("n"),
        F.col("s.two_rank_sum").alias("two_rank_sum"),
        (F.col("s.two_rank_sum") - F.col("s.n") * (F.col("s.n") + 1))
        .cast("long")
        .alias("two_u"),
    )


@register(
    "x_runs_test",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day_num,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v100
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), rk AS (
      SELECT day_num, v100,
             ROW_NUMBER() OVER (ORDER BY v100, day_num) AS rn,
             COUNT(*) OVER () AS n
      FROM d
    ), md AS (
      SELECT day_num, v100,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN v100 END) OVER () AS med
      FROM rk
    ), s AS (
      SELECT day_num, CASE WHEN v100 > med THEN 1 ELSE 0 END AS sgn FROM md
    ), runs AS (
      SELECT sgn,
             CASE WHEN LAG(sgn) OVER (ORDER BY day_num) IS NULL
                    OR LAG(sgn) OVER (ORDER BY day_num) <> sgn
                  THEN 1 ELSE 0 END AS brk
      FROM s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(sgn) AS BIGINT) AS n_above,
           CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n_below,
           CAST(SUM(brk) AS BIGINT) AS n_runs,
           CAST(1000000 + 2000000 * SUM(sgn) * (COUNT(*) - SUM(sgn))
                  // COUNT(*) AS BIGINT) AS expected_runs_micro
    FROM runs
    """,
)
def x_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily click-revenue
    series: sign each day against the (lower) median, count sign runs, and
    emit the exact expected-run count 1 + 2·n₁n₂/N in micro units.  The
    median is resolved as a window scalar (no cross join) and ties sign
    'below', so every count is integer-exact in both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "click")
    d = ev.groupBy(
        (F.unix_millis(F.col("ts")) / F.lit(86400000)).cast("long").alias("day_num")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long").alias("v100")
    )
    rk = d.select(
        "day_num",
        "v100",
        F.row_number().over(W.orderBy("v100", "day_num")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    md = rk.select(
        "day_num",
        "v100",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v100"))
        ).over(W.partitionBy()).alias("med"),
    )
    s = md.select(
        "day_num", F.when(F.col("v100") > F.col("med"), 1).otherwise(0).alias("sgn")
    )
    lagged = s.select(
        "sgn",
        F.when(
            F.lag("sgn").over(W.orderBy("day_num")).isNull()
            | (F.lag("sgn").over(W.orderBy("day_num")) != F.col("sgn")),
            1,
        ).otherwise(0).alias("brk"),
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("sgn").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("sgn")).cast("long").alias("n_below"),
        F.sum("brk").cast("long").alias("n_runs"),
        (
            F.lit(1000000)
            + F.expr("2000000 * sum(sgn) * (count(1) - sum(sgn)) div count(1)")
        ).cast("long").alias("expected_runs_micro"),
    )


@register(
    "x_linear_interp_fill",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day_num,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v100
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), k AS (
      SELECT * FROM d WHERE day_num % 3 = 0
    ), spine AS (
      SELECT unnest(generate_series((SELECT MIN(day_num) FROM k),
                                    (SELECT MAX(day_num) FROM k))) AS day_num
    ), j AS (
      SELECT s.day_num, k.v100 FROM spine s LEFT JOIN k USING (day_num)
    ), f AS (
      SELECT day_num, v100,
        last_value(v100 IGNORE NULLS) OVER
          (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v100 IS NOT NULL THEN day_num END IGNORE NULLS) OVER
          (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v100 IGNORE NULLS) OVER
          (ORDER BY day_num ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v100 IS NOT NULL THEN day_num END IGNORE NULLS) OVER
          (ORDER BY day_num ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT day_num,
           CAST(CASE WHEN v100 IS NOT NULL THEN v100
                     ELSE pv + (nv - pv) * (day_num - pd) // (nd - pd)
                END AS BIGINT) AS filled_v100,
           CASE WHEN v100 IS NOT NULL THEN 1 ELSE 0 END AS is_known
    FROM f
    """,
)
def x_linear_interp_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap repair by linear interpolation: keep every 3rd day of the daily
    purchase series as 'known', rebuild the full calendar spine between the
    known endpoints, and fill each gap day with the integer-truncated
    linear blend pv + (nv−pv)·(t−pd)/(nd−pd) on exact cent values (both
    engines truncate toward zero, negatives included).  The
    forward/backward known-neighbor scan is two ignore-nulls window passes
    — the standard distributed fill (sort within day ranges at scale, no
    self-join)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    d = ev.groupBy(
        (F.unix_millis(F.col("ts")) / F.lit(86400000)).cast("long").alias("day_num")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long").alias("v100")
    )
    k = d.filter(F.col("day_num") % 3 == 0)
    spine = k.agg(
        F.min("day_num").alias("mn"), F.max("day_num").alias("mx")
    ).select(F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day_num"))
    j = spine.join(k, "day_num", "left")
    wp = W.orderBy("day_num").rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = W.orderBy("day_num").rowsBetween(W.currentRow, W.unboundedFollowing)
    known_day = F.when(F.col("v100").isNotNull(), F.col("day_num"))
    f = j.select(
        "day_num",
        "v100",
        F.last("v100", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v100", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wn).alias("nd"),
    )
    return f.select(
        "day_num",
        F.when(F.col("v100").isNotNull(), F.col("v100"))
        .otherwise(
            F.col("pv")
            + F.expr("(nv - pv) * (day_num - pd) div (nd - pd)")
        )
        .cast("long")
        .alias("filled_v100"),
        F.when(F.col("v100").isNotNull(), 1).otherwise(0).alias("is_known"),
    )


@register(
    "x_winsorize",
    """
    WITH c AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), r AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ), p AS (
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS p05_cents,
             MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS p95_cents
      FROM r GROUP BY event_type
    )
    SELECT r.event_type, CAST(p.n AS BIGINT) AS n,
           CAST(p.p05_cents AS BIGINT) AS p05_cents,
           CAST(p.p95_cents AS BIGINT) AS p95_cents,
           CAST(CAST(SUM(GREATEST(p.p05_cents, LEAST(p.p95_cents, r.cents))) AS BIGINT)
                  * 10000 // p.n AS BIGINT) AS mean_wins_micro
    FROM r JOIN p USING (event_type)
    GROUP BY r.event_type, p.n, p.p05_cents, p.p95_cents
    """,
)
def x_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean per event type: clamp values into the [p05, p95]
    DISCRETE percentile band before averaging — the outlier-robust
    normalization step of a quality-score pipeline.  Percentiles are
    defined explicitly as the value at sorted position ceil(q·n) (pure
    integer arithmetic, no engine-specific quantile semantics), values are
    exact cents, and the mean is emitted as truncated micro units."""
    from pyspark.sql import Window as W

    # Everything runs on the bounded (event_type, cents) HISTOGRAM — the
    # decile_lift pattern: the value at sorted position k is the smallest
    # cents whose cumulative count reaches k, so no per-row ranking window
    # ever touches raw events (measured 12s → ~1s at the 10x replica).
    c = load_table(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    hist = c.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    hist = hist.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt")
        .over(
            W.partitionBy("event_type").orderBy("cents").rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).alias("n"),
    ).cache()
    p = hist.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 5 + 99) div 100"), F.col("cents"))
        ).alias("p05_cents"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 95 + 99) div 100"), F.col("cents"))
        ).alias("p95_cents"),
    )
    joined = hist.select("event_type", "cents", "cnt").join(F.broadcast(p), "event_type")
    return (
        joined.groupBy("event_type", "n", "p05_cents", "p95_cents")
        .agg(
            F.sum(
                F.greatest(F.col("p05_cents"), F.least(F.col("p95_cents"), F.col("cents")))
                * F.col("cnt")
            ).cast("long").alias("clamped_sum")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("p05_cents").cast("long").alias("p05_cents"),
            F.col("p95_cents").cast("long").alias("p95_cents"),
            F.expr("clamped_sum * 10000 div n").cast("long").alias("mean_wins_micro"),
        )
    )


@register(
    "x_containment_dedup",
    """
    WITH t AS (
      SELECT doc_id, substr(text, 1, 40) AS blk,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 4, 0)),
               i -> array_to_string(w[i:i+4], ' '))) AS sh
      FROM (SELECT doc_id, text,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS w
            FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(a.sh) AS BIGINT) AS n_a,
           CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
           CAST(len(list_intersect(a.sh, b.sh)) * 1000000 // len(a.sh) AS BIGINT)
             AS containment_micro
    FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(a.sh) > 0
    ORDER BY containment_micro DESC, id_a, id_b
    LIMIT 40
    """,
)
def x_containment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric CONTAINMENT dedup |shingles(A) ∩ shingles(B)| / |A| — the
    truncation/quote detector Jaccard systematically misses (a doc fully
    contained in a longer one scores 1.0 here but low Jaccard).  Word
    5-gram shingle sets, candidate pairs blocked on the 40-char text prefix
    (testdata's natural collision key), so the pair join is a bounded
    equijoin — never all-pairs.  Top 40 by (containment, id) is a total
    order, so both engines pick identical rows."""
    docs0 = load_table(spark, sf, "documents").select(
        "doc_id", F.substring(F.col("text"), 1, 40).alias("blk"), "text"
    )
    # Prune to COLLIDING blocks before any shingling: singleton blocks can
    # never pair, and they are ~95% of the corpus — without this the block
    # equijoin shuffles every doc's full shingle array (measured 8s → 1.4s
    # at sf0.1; at 100 TB it is the difference between shuffling the corpus
    # and shuffling the collision set).  No broadcast hint: the multi-block
    # list is data-derived and SF-scaled (header policy).
    multi = (
        docs0.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("blk")
    )
    docs = docs0.join(multi, "blk", "left_semi").select(
        "doc_id", "blk", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    # cached: the shingled collision set feeds BOTH sides of the block
    # pair join — uncached, the tokenize+5-gram+distinct subtree (the
    # query's dominant cost) executes twice
    t = (
        docs.select(
            "doc_id",
            "blk",
            F.expr(
                "CASE WHEN size(w) >= 5 THEN array_distinct(transform("
                " sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' ')))"
                " ELSE array() END"
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .cache()
    )
    a = t.select(
        F.col("doc_id").alias("id_a"), F.col("blk").alias("blk"), F.col("sh").alias("sh_a")
    )
    b = t.select(
        F.col("doc_id").alias("id_b"), F.col("blk").alias("blk"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.size("sh_a").cast("long").alias("n_a"),
        F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_common"),
        F.expr("CAST(size(array_intersect(sh_a, sh_b)) * 1000000 div size(sh_a) AS BIGINT)")
        .alias("containment_micro"),
    )
    return scored.orderBy(
        F.col("containment_micro").desc(), "id_a", "id_b"
    ).limit(40)


@register(
    "t_stream_static_join",
    """
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY 1
    """,
)
def t_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-STATIC join witnessed end to end — the enrichment shape every
    production pipeline runs (facts stream in, a small dimension sits
    still) and the one join family the streaming witnesses didn't yet
    cover: unlike stream-stream joins it needs NO watermark and keeps no
    join state, because the static side is simply broadcast into every
    micro-batch.  The events parquet is drained with ``availableNow``,
    joined INSIDE the streaming query to the 25-row nation dim (broadcast
    — constant-bounded, header policy) on ``user_id % 25``, and aggregated
    per nation in complete mode (state = 25 groups, bounded at any SF).
    The emitted table must equal the oracle's batch join byte for byte."""
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    nation = F.broadcast(
        load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    )
    # Raw-encoding probe (see t_stream_tumbling): the stream schema must
    # match what the files physically store.
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
    stream = raw.select(
        F.col("user_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    joined = stream.join(
        nation, stream["user_id"] % 25 == nation["n_nationkey"]
    )
    agg = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    sink = f"t_stream_static_join_{uuid.uuid4().hex[:8]}"
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
        "n_name", "n_events", F.col("sum_cents").cast("long").alias("sum_cents")
    )


@register(
    "f_url_pack",
    """
    WITH u AS (
      SELECT 'https://s' || (user_id % 7) || '.example.com/cat/' || event_type
               || '/item?uid=' || user_id || '&eid=' || event_id
               || '#f' || (event_id % 5) AS url
      FROM events
    ), p AS (
      SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
             regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1) AS path,
             regexp_extract(url, '[?&]uid=([^&#]+)', 1) AS uid,
             regexp_extract(url, '#(.*)$', 1) AS frag
      FROM u
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(SUM(CAST(uid AS BIGINT)) AS BIGINT) AS sum_uid,
           CAST(COUNT(DISTINCT frag) AS BIGINT) AS n_frags
    FROM p GROUP BY host
    """,
)
def f_url_pack(spark: SparkSession, sf: str) -> DataFrame:
    """URL component extraction — the log-analytics scalar surface
    (clickstream hosts, canonical paths, tracking params) via Spark's
    JVM-side ``parse_url`` (HOST / PATH / QUERY-param / REF), which the
    oracle replays with pure regexes: a pass proves the builtin's
    component grammar agrees with RFC-style splitting on every generated
    URL.  URLs are synthesized deterministically from events columns, and
    the round-trip is pinned by summing the ``uid`` query param BACK as a
    BIGINT — any mis-extraction breaks the sum.  Whole-stage codegen
    end to end; one aggregation exchange over 7 bounded host groups."""
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "event_type")
    url = F.concat(
        F.lit("https://s"),
        (F.col("user_id") % 7).cast("string"),
        F.lit(".example.com/cat/"),
        F.col("event_type"),
        F.lit("/item?uid="),
        F.col("user_id").cast("string"),
        F.lit("&eid="),
        F.col("event_id").cast("string"),
        F.lit("#f"),
        (F.col("event_id") % 5).cast("string"),
    )
    parsed = ev.select(url.alias("url")).select(
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'uid')").alias("uid"),
        F.expr("parse_url(url, 'REF')").alias("frag"),
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("path").alias("n_paths"),
        F.sum(F.col("uid").cast("long")).cast("long").alias("sum_uid"),
        F.countDistinct("frag").alias("n_frags"),
    )


@register(
    "x_gopher_rules",
    """
    WITH d AS (
      SELECT source,
             regexp_split_to_array(trim(text), '\\s+') AS w,
             length(regexp_replace(text, '\\s+', '', 'g')) AS word_chars,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis
      FROM documents
    ), r AS (
      SELECT source,
             CASE WHEN len(w) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_words,
             CASE WHEN 3 * len(w) <= word_chars AND word_chars <= 10 * len(w)
                  THEN 1 ELSE 0 END AS r_mwl,
             CASE WHEN 10 * (n_hash + n_ellipsis) <= len(w) THEN 1 ELSE 0 END
               AS r_sym,
             CASE WHEN 5 * len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                       >= 4 * len(w) THEN 1 ELSE 0 END AS r_alpha,
             CASE WHEN len(list_filter(w, x -> lower(x) IN
                       ('the','be','to','of','and','that','have','with'))) >= 2
                  THEN 1 ELSE 0 END AS r_stop
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r_words) AS BIGINT) AS pass_words,
           CAST(SUM(r_mwl) AS BIGINT) AS pass_mwl,
           CAST(SUM(r_sym) AS BIGINT) AS pass_sym,
           CAST(SUM(r_alpha) AS BIGINT) AS pass_alpha,
           CAST(SUM(r_stop) AS BIGINT) AS pass_stop,
           CAST(SUM(r_words * r_mwl * r_sym * r_alpha * r_stop) AS BIGINT)
             AS pass_all
    FROM r GROUP BY source
    """,
)
def x_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style heuristic quality GATES (Rae et al. 2021 §A1.1, public)
    as per-rule diagnostics — the pre-training corpus filter every LLM
    pipeline runs before dedup, and deliberately different from
    ``x_doc_quality``'s single composite score: each rule is a HARD gate
    and the per-source pass counts show WHICH rule kills a source's
    documents.  Rules (all exact integer inequalities — ratio thresholds
    cross-multiplied so no division ever happens): word count in
    [50, 100000]; mean word length in [3, 10] (3n ≤ chars ≤ 10n);
    symbol-to-word ratio ≤ 0.1 (hash marks + ellipses); ≥ 80% of words
    contain a letter; ≥ 2 stopword hits from the 8-word probe set.  Pure
    column expressions over one split — no explode, no join, no shuffle
    except the final bounded per-source aggregation."""
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    docs = load_table(spark, sf, "documents").select("source", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    d = docs.select(
        "source",
        F.size(w).alias("n_words"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("word_chars"),
        (
            F.length("text") - F.length(F.regexp_replace("text", r"#", ""))
        ).alias("n_hash"),
        (
            (F.length("text") - F.length(F.replace("text", F.lit("..."), F.lit(""))))
            / F.lit(3)
        ).cast("long").alias("n_ellipsis"),
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).alias("alpha_words"),
        F.size(F.filter(w, lambda x: F.lower(x).isin(*stops))).alias("stop_hits"),
    )
    r = d.select(
        "source",
        F.when(F.col("n_words").between(50, 100000), 1).otherwise(0).alias("r_words"),
        F.when(
            (3 * F.col("n_words") <= F.col("word_chars"))
            & (F.col("word_chars") <= 10 * F.col("n_words")),
            1,
        ).otherwise(0).alias("r_mwl"),
        F.when(10 * (F.col("n_hash") + F.col("n_ellipsis")) <= F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_sym"),
        F.when(5 * F.col("alpha_words") >= 4 * F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_alpha"),
        F.when(F.col("stop_hits") >= 2, 1).otherwise(0).alias("r_stop"),
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("r_words").cast("long").alias("pass_words"),
        F.sum("r_mwl").cast("long").alias("pass_mwl"),
        F.sum("r_sym").cast("long").alias("pass_sym"),
        F.sum("r_alpha").cast("long").alias("pass_alpha"),
        F.sum("r_stop").cast("long").alias("pass_stop"),
        F.sum(
            F.col("r_words") * F.col("r_mwl") * F.col("r_sym") * F.col("r_alpha")
            * F.col("r_stop")
        )
        .cast("long")
        .alias("pass_all"),
    )


@register(
    "f_bad_records_scan",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad,
           CAST(SUM(CASE WHEN event_id % 37 <> 0
                         THEN CAST(ROUND(value * 100.0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
)
def f_bad_records_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Malformed-record tolerance — the ingest reality every 100 TB text
    pipeline faces: a CSV copy of events is staged with every 37th row's
    numeric field deliberately corrupted to a non-numeric token, then read
    back under PERMISSIVE mode with an explicit schema and a
    ``columnNameOfCorruptRecord`` sidecar.  The typed column parses to
    NULL exactly on the corrupted rows and the raw line is preserved in
    the sidecar for quarantine — per-type good/bad counts and the
    good-row sum must match the oracle's analytic replay (it knows which
    rows were corrupted by construction).  No inferSchema (which would
    double-scan at scale); one bounded aggregation."""
    import os
    import shutil
    import uuid

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 37 == 0, F.lit("oops")).otherwise(
            F.round(F.col("value") * 100).cast("long").cast("string")
        ).alias("cents_str"),
    )
    slug = sf.replace("/", "_").strip("_")
    base = f"/root/repo/.tmp/f_bad_records_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        ev.write.mode("overwrite").csv(f"{build}/src")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("cents", LongType()),
            StructField("_bad", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(src)
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.sum(F.coalesce(F.col("cents"), F.lit(0))).cast("long").alias("sum_cents"),
    )


@register(
    "x_vocab_coverage",
    """
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), cnt AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), v AS (
      SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 500
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN 1 ELSE 0 END)
                AS BIGINT) AS in_vocab,
           CAST(SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS coverage_micro
    FROM toks GROUP BY source
    """,
)
def x_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-vocabulary coverage per source — the go/no-go check run
    before committing a vocab to a 100 TB tokenization pass (a source
    whose OOV rate is high will shred into per-byte fallbacks and blow the
    token budget).  Vocab = top-500 whitespace tokens by global count
    under a TOTAL order (count desc, token asc — the rank-500 tie is
    deterministic on both engines); per-source coverage = in-vocab tokens
    / all tokens in integer micro.  The vocab is a bounded top-k
    (TakeOrdered, never a global sort) and is broadcast into the probe —
    constant-bounded at every SF per the header policy; token counting is
    one explode + two key-partitioned aggregations."""
    docs = load_table(spark, sf, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(500)
        .select("tok", F.lit(1).alias("in_v"))
    )
    probe = toks.join(F.broadcast(vocab), "tok", "left")
    return probe.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("in_v"), F.lit(0))).cast("long").alias("in_vocab"),
        F.expr(
            "CAST(sum(coalesce(in_v, 0)) * 1000000 div count(1) AS BIGINT)"
        ).alias("coverage_micro"),
    )


@register(
    "s_intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 set ops, BAG semantics: INTERSECT ALL keeps min(multiplicity)
    copies per value — the half of the set-op surface the round-2 distinct
    forms left open.  Spark plans it as a left-semi-style join over
    per-side counts, never an Expand of the raw rows."""
    o = load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


@register(
    "s_except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 set ops, BAG semantics: EXCEPT ALL keeps max(0, m_left −
    m_right) copies per value (multiset difference)."""
    o = load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "f_text_scan",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents GROUP BY source
    """,
)
def f_text_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Line-oriented TEXT source end to end — the last uncovered file
    format in the source matrix (csv / jsonl / orc / parquet / bucketed /
    hive-partitioned / mergeSchema are all witnessed): a delimited dump of
    documents metadata is staged as one-record-per-line text, read back
    with ``spark.read.text`` (each line a single ``value`` string — the
    raw-log ingest shape), parsed with a split projection, and aggregated;
    the oracle reads the original parquet, so a pass proves the
    write → line → parse round trip drops and damages nothing."""
    import os
    import shutil
    import uuid

    d = load_table(spark, sf, "documents").select(
        F.concat_ws(
            "|",
            F.col("source"),
            F.col("doc_id").cast("string"),
            F.col("n_chars").cast("string"),
        ).alias("value")
    )
    slug = sf.replace("/", "_").strip("_")
    base = f"/root/repo/.tmp/f_text_scan_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        d.write.mode("overwrite").text(f"{build}/src")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    lines = spark.read.text(src)
    parts = F.split(F.col("value"), r"\|")
    parsed = lines.select(
        parts.getItem(0).alias("source"),
        parts.getItem(1).cast("long").alias("doc_id"),
        parts.getItem(2).cast("long").alias("n_chars"),
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


@register(
    "j_full_outer",
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 7000
    ), o AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS spent_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           c_mktsegment AS segment,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(spent_cents, 0) AS spent_cents,
           CASE WHEN c_custkey IS NULL THEN 'right_only'
                WHEN o_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS side
    FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
    """,
)
def j_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join witness — the reconciliation join (ledger vs
    statements, CRM vs billing): rich customers on the left, 1997 buyer
    activity on the right, and BOTH unmatched sides survive with a
    provenance flag.  The key is COALESCEd into one column (the classic
    full-outer footgun: selecting either side's key alone nulls out the
    other side's rows) and measures are null-filled to 0 so downstream
    arithmetic is total.  Scale shape: both sides pre-reduced before the
    join (the right side is an aggregate, not raw orders), then one
    shuffle on the join key; full-outer cannot broadcast, so hash
    partitioning both sides on custkey is the plan at any SF."""
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_mktsegment")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("long")
            .alias("spent_cents"),
        )
    )
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    return j.select(
        F.coalesce(c["c_custkey"], o["o_custkey"]).alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce(F.col("spent_cents"), F.lit(0)).cast("long").alias("spent_cents"),
        F.when(c["c_custkey"].isNull(), "right_only")
        .when(o["o_custkey"].isNull(), "left_only")
        .otherwise("both")
        .alias("side"),
    )


@register(
    "x_vwap",
    """
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
             AS ship_month,
           l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS qty_centi,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                // SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS vwap_cents
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def x_vwap(spark: SparkSession, sf: str) -> DataFrame:
    """VOLUME-WEIGHTED average price (VWAP — execution-quality benchmark
    in trading, unit-economics price in retail) per ship-month and return
    flag: Σ(price·qty)/Σ(qty), where a 500-unit line moves the average
    500× more than a single-unit line (plain AVG(price) is the classic
    wrong answer this operator exists to correct).  Price and quantity
    are both exact centi-units via the DECIMAL(18,2) bridge, so the
    weighted sum and the final floor-division are pure BIGINT arithmetic
    — hash-identical across engines.  Scale shape: a single two-phase
    aggregate keyed on (month, flag) — map-side partials reduce 100 TB of
    lineitem to ~months×flags rows before the one shuffle."""
    li = load_table(spark, sf, "lineitem").select(
        # integer month key: 2.2x cheaper than a date_format string at the
        # 10x replica (3.85s -> 1.75s on 60M rows, SCALE.md)
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("ship_month"),
        "l_returnflag",
        F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("q"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "p"
        ),
    )
    return (
        li.groupBy("ship_month", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("q").cast("long").alias("qty_centi"),
            F.sum(F.col("p") * F.col("q")).alias("__pq"),
        )
        .select(
            "ship_month",
            "l_returnflag",
            "n_lines",
            "qty_centi",
            F.expr("__pq DIV qty_centi").alias("vwap_cents"),
        )
    )


@register(
    "x_ohlc_bars",
    """
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day_num,
             epoch_ms(ts) AS ms, event_id,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      FROM events
    ), w AS (
      SELECT user_id, day_num, cents,
             first_value(cents) OVER (PARTITION BY user_id, day_num
                                      ORDER BY ms, event_id) AS open_cents,
             first_value(cents) OVER (PARTITION BY user_id, day_num
                                      ORDER BY ms DESC, event_id DESC)
               AS close_cents
      FROM e
    )
    SELECT user_id, day_num, open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w GROUP BY user_id, day_num, open_cents, close_cents
    """,
)
def x_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC BAR aggregation (candlestick resampling — the first operator
    every market-data and metrics pipeline runs): per (user, day), the
    first/highest/lowest/last observed value in cents.  Open/close are
    order-statistics, not extrema, so they ride struct-min/struct-max
    aggregates keyed (ms, event_id, cents) — a pure two-phase aggregate
    with deterministic event-id tie-breaks, NO window sort (the windowed
    first_value formulation the oracle uses would shuffle+sort the full
    event stream; the struct-argmin form is map-side combinable).  Scale
    shape: one shuffle on (user, day), partial aggregation upstream."""
    e = load_table(spark, sf, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)").alias("day_num"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    first = F.min(
        F.struct(F.col("ms").alias("t"), F.col("event_id").alias("e"), F.col("cents").alias("v"))
    )
    last = F.max(
        F.struct(F.col("ms").alias("t"), F.col("event_id").alias("e"), F.col("cents").alias("v"))
    )
    return (
        e.groupBy("user_id", "day_num")
        .agg(
            first.alias("__o"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            last.alias("__c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "day_num",
            F.col("__o.v").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("__c.v").alias("close_cents"),
            "n_events",
        )
    )


@register(
    "x_drawdown",
    """
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      FROM events
    ), c AS (
      SELECT user_id, ms, event_id,
             CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS run_sum
      FROM e
    ), p AS (
      SELECT user_id, run_sum,
             CAST(MAX(run_sum) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS peak
      FROM c
    )
    SELECT user_id,
           CAST(MAX(peak - run_sum) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM p GROUP BY user_id
    """,
)
def x_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """MAX DRAWDOWN per user (the risk metric: worst peak-to-trough fall
    of the running balance — portfolio risk, battery-drain analysis, SLA
    burn-down): cumulative sum of event cents in time order, running max
    of that equity curve, drawdown = peak − current, maximized per user.
    Exact BIGINT throughout.  Scale shape: ONE window shuffle on user_id
    serves both running aggregates (same partition + order), then the
    final per-user reduce reuses the partitioning — AQE plans a single
    exchange end-to-end."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = e.withColumn("run_sum", F.sum("cents").over(wo).cast("long")).withColumn(
        "peak", F.max(F.sum("cents").over(wo)).over(wo).cast("long")
    )
    return curve.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("run_sum")).cast("long").alias("max_drawdown_cents"),
        F.max("peak").cast("long").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "x_rsi_indicator",
    """
    WITH daily AS (
      SELECT n_name AS nat,
             CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), d AS (
      SELECT nat, day, x - lag(x) OVER (PARTITION BY nat ORDER BY day) AS dx,
             row_number() OVER (PARTITION BY nat ORDER BY day) AS rn
      FROM daily
    ), g AS (
      SELECT nat, day, rn,
             CAST(SUM(CASE WHEN dx > 0 THEN dx ELSE 0 END)
                  OVER (PARTITION BY nat ORDER BY day
                        ROWS 13 PRECEDING) AS BIGINT) AS gain,
             CAST(SUM(CASE WHEN dx < 0 THEN -dx ELSE 0 END)
                  OVER (PARTITION BY nat ORDER BY day
                        ROWS 13 PRECEDING) AS BIGINT) AS loss
      FROM d
    )
    SELECT nat AS n_name, day, gain AS gain_cents, loss AS loss_cents,
           CAST(gain * 1000000 // (gain + loss) AS BIGINT) AS rsi_micro
    FROM g
    WHERE rn >= 15 AND gain + loss > 0
    """,
)
def x_rsi_indicator(spark: SparkSession, sf: str) -> DataFrame:
    """RSI-14 (relative strength index, simple-average Cutler variant —
    the momentum oscillator): over each nation's daily revenue series,
    the trailing-14-day sum of up-moves vs down-moves, RSI = gain/(gain+
    loss) in micro-units.  Day-over-day deltas are exact cents, rolling
    sums are BIGINT row-frame windows, and the micro ratio is a single
    floor division — no float forms anywhere.  Rows need a full 14-delta
    history (rn ≥ 15).  Scale shape: raw orders collapse to the
    ~nation×2400-row daily series first (`_nation_daily_cents`); ALL
    windows then share one (nation)-partitioned sort — one shuffle of a
    tiny series table regardless of order volume."""
    from pyspark.sql import Window

    daily = _nation_daily_cents(spark, sf)
    wo = Window.partitionBy("nat").orderBy("day")
    w14 = wo.rowsBetween(-13, 0)
    d = daily.withColumn("dx", F.col("x") - F.lag("x").over(wo)).withColumn(
        "rn", F.row_number().over(wo)
    )
    g = d.withColumn(
        "gain",
        F.sum(F.when(F.col("dx") > 0, F.col("dx")).otherwise(0)).over(w14).cast("long"),
    ).withColumn(
        "loss",
        F.sum(F.when(F.col("dx") < 0, -F.col("dx")).otherwise(0)).over(w14).cast("long"),
    )
    return (
        g.filter((F.col("rn") >= 15) & (F.col("gain") + F.col("loss") > 0))
        .select(
            F.col("nat").alias("n_name"),
            "day",
            F.col("gain").alias("gain_cents"),
            F.col("loss").alias("loss_cents"),
            F.expr("gain * 1000000 DIV (gain + loss)").alias("rsi_micro"),
        )
    )


@register(
    "x_association_rules",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey % 200 AS item
      FROM lineitem
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ), item_cnt AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS ante, b.item AS cons,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.item <> b.item
      GROUP BY a.item, b.item
    )
    SELECT p.ante, p.cons, p.n_ab,
           (p.n_ab * 1000000) // n_orders.n AS support_micro,
           (p.n_ab * 1000000) // ca.c AS confidence_micro,
           (p.n_ab * n_orders.n * 1000000) // (ca.c * cb.c) AS lift_micro
    FROM pairs p
    JOIN item_cnt ca ON p.ante = ca.item
    JOIN item_cnt cb ON p.cons = cb.item
    CROSS JOIN n_orders
    WHERE p.n_ab >= 3
    ORDER BY confidence_micro DESC, p.ante, p.cons LIMIT 30
    """,
)
def x_association_rules(spark: SparkSession, sf: str) -> DataFrame:
    """ASSOCIATION RULES (directional a→b, the step beyond
    `x_market_basket`'s symmetric lift): support P(ab), confidence
    P(b|a), and lift P(ab)/(P(a)P(b)) for every co-purchased item pair
    with ≥3 joint baskets, all in exact integer micro-units.  Confidence
    is the asymmetric measure — beer→diapers and diapers→beer differ —
    so pairs are emitted in BOTH directions and ranked by confidence.
    Scale shape identical to the basket miner: the pair join stays
    WITHIN l_orderkey (basket² per order, never catalog²), pair counts
    partial-aggregate map-side, and the item-count/total tables join
    broadcast (constant-bounded: 200 items, 1 scalar row)."""
    li = load_table(spark, sf, "lineitem")
    # cached: the basket list feeds the count tables AND both pairing
    # sides — uncached, the lineitem distinct re-executes per consumer
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 200).alias("item")
    ).distinct().cache()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    item_cnt = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey"), F.col("item").alias("ante"))
    b = items.select(F.col("l_orderkey"), F.col("item").alias("cons"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    ca = item_cnt.select(F.col("item").alias("ante"), F.col("c").alias("__ca"))
    cb = item_cnt.select(F.col("item").alias("cons"), F.col("c").alias("__cb"))
    return (
        pairs.join(F.broadcast(ca), "ante")
        .join(F.broadcast(cb), "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ante",
            "cons",
            "n_ab",
            F.expr("(n_ab * 1000000) DIV n").alias("support_micro"),
            F.expr("(n_ab * 1000000) DIV __ca").alias("confidence_micro"),
            F.expr("(n_ab * n * 1000000) DIV (__ca * __cb)").alias("lift_micro"),
        )
        .orderBy(F.col("confidence_micro").desc(), "ante", "cons")
        .limit(30)
    )


@register(
    "x_link_prediction",
    """
    WITH edges0 AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), cdeg AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM edges0 GROUP BY c
    ), edges AS (
      SELECT e.u, e.c FROM edges0 e JOIN cdeg ON e.c = cdeg.c
      WHERE cdeg.d <= 50
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), common AS (
      SELECT a.u AS u1, b.u AS u2, CAST(COUNT(*) AS BIGINT) AS cn
      FROM edges a JOIN edges b ON a.c = b.c AND a.u < b.u
      GROUP BY a.u, b.u
    )
    SELECT c.u1, c.u2, c.cn AS common_neighbors,
           CAST(c.cn * 1000000 // (d1.d + d2.d - c.cn) AS BIGINT)
             AS jaccard_micro
    FROM common c
    JOIN deg d1 ON c.u1 = d1.u
    JOIN deg d2 ON c.u2 = d2.u
    ORDER BY jaccard_micro DESC, c.u1, c.u2 LIMIT 25
    """,
)
def x_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    """LINK PREDICTION by neighborhood overlap (common-neighbors +
    Jaccard — the classic unsupervised recommender for 'who should trade
    with whom'): suppliers sharing many customers are likely future
    partners.  Candidate pairs are generated WITHIN each shared customer
    (the within-key self-join pattern — work bounded by per-customer
    supplier count², never |suppliers|²), counted, then normalized by the
    union of neighborhoods via exact integer micro-division.  HUB-DEGREE
    CAP: customers with more than ``PAIR_DEGREE_CAP`` (=50, the same
    bound as the LSH miner's ``max_bucket``) distinct suppliers are
    dropped from the pairing subgraph BEFORE the self-join — a hub key
    of degree 10⁵ would otherwise put 10¹⁰ pairs on one reducer, and a
    shared hub carries near-zero link-prediction signal anyway (the
    exact rationale of the RA weighting in `x_resource_allocation`).
    Supplier degrees are recomputed on the capped subgraph so the
    Jaccard denominator stays consistent with the pair counts.  Degree
    tables join broadcast (supplier-bounded).  Top-25 by (jaccard, pair)
    total order; per-key pair work is ≤ C(50,2) ≈ 1.2k rows per
    customer, which holds unchanged at 100 TB."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    edges0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("u"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    cdeg = edges0.groupBy("c").agg(F.count(F.lit(1)).alias("__cd"))
    # Cached: the capped edge list feeds THREE consumers (the supplier
    # degree table and both sides of the pairing self-join) — uncached,
    # the lineitem⋈orders⋈distinct⋈cap subtree re-executes per consumer
    # (153s -> 59s at the 100x replica).
    edges = (
        edges0.join(cdeg, "c")
        .filter(F.col("__cd") <= PAIR_DEGREE_CAP)
        .select("u", "c")
        .cache()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select(F.col("c"), F.col("u").alias("u1"))
    b = edges.select(F.col("c"), F.col("u").alias("u2"))
    common = (
        a.join(b, "c")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    d1 = deg.select(F.col("u").alias("u1"), F.col("d").alias("__d1"))
    d2 = deg.select(F.col("u").alias("u2"), F.col("d").alias("__d2"))
    return (
        common.join(F.broadcast(d1), "u1")
        .join(F.broadcast(d2), "u2")
        .select(
            "u1",
            "u2",
            F.col("cn").alias("common_neighbors"),
            F.expr("cn * 1000000 DIV (__d1 + __d2 - cn)").alias("jaccard_micro"),
        )
        .orderBy(F.col("jaccard_micro").desc(), "u1", "u2")
        .limit(25)
    )


@register(
    "x_chi2_feature_select",
    """
    WITH pres AS (
      SELECT DISTINCT doc_id, lang = 'en' AS pos,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), margins AS (
      SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS r0
      FROM documents
    ), cnt AS (
      SELECT tok,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM pres GROUP BY tok
    ), scored AS (
      SELECT tok, a, b, a + b AS df,
             CAST(FLOOR(
               CAST(r1 + r0 AS DOUBLE)
               * CAST(a * r0 - b * r1 AS DOUBLE)
               * CAST(a * r0 - b * r1 AS DOUBLE)
               / (CAST(a + b AS DOUBLE)
                  * CAST(r1 + r0 - a - b AS DOUBLE)
                  * CAST(r1 AS DOUBLE) * CAST(r0 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS chi2_micro
      FROM cnt CROSS JOIN margins
      WHERE a + b >= 20 AND r1 + r0 - a - b > 0
    )
    SELECT tok AS token, df, a AS df_pos, b AS df_neg, chi2_micro
    FROM scored ORDER BY chi2_micro DESC, tok LIMIT 25
    """,
)
def x_chi2_feature_select(spark: SparkSession, sf: str) -> DataFrame:
    """CHI-SQUARE FEATURE SELECTION (the supervised vocabulary filter for
    text classifiers): for every token present in ≥20 documents, the 2×2
    chi² between token presence and the lang='en' label, top-25 features.
    The 2×2 statistic collapses to N·(a·d−b·c)²/((a+b)(c+d)(r₁)(r₀)) with
    d = r₀−b and c = r₁−a substituted so only EXACT BIGINT margins enter;
    the value flows through one fixed IEEE double chain and floors to
    micro-units — hash-identical cross-engine (`x_chi2_independence`
    pioneered the trick; this is its per-feature one-vs-rest form).
    Scale shape: doc-level presence dedups map-side, one groupBy on
    token, the 1-row margin table joins broadcast, ranking is bounded
    top-k (TakeOrdered, no global sort)."""
    d = load_table(spark, sf, "documents")
    pres = (
        spread(d)
        .select(
            "doc_id",
            (F.col("lang") == "en").alias("pos"),
            F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"),
        )
        .distinct()
    )
    margins = d.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).cast("long").alias("r0"),
    )
    cnt = pres.groupBy("tok").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("b"),
    )
    scored = (
        cnt.crossJoin(F.broadcast(margins))
        .filter((F.col("a") + F.col("b") >= 20) & (F.col("r1") + F.col("r0") - F.col("a") - F.col("b") > 0))
        .select(
            F.col("tok").alias("token"),
            (F.col("a") + F.col("b")).alias("df"),
            F.col("a").alias("df_pos"),
            F.col("b").alias("df_neg"),
            F.expr(
                "CAST(FLOOR(CAST(r1 + r0 AS DOUBLE)"
                " * CAST(a * r0 - b * r1 AS DOUBLE)"
                " * CAST(a * r0 - b * r1 AS DOUBLE)"
                " / (CAST(a + b AS DOUBLE) * CAST(r1 + r0 - a - b AS DOUBLE)"
                "    * CAST(r1 AS DOUBLE) * CAST(r0 AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ).alias("chi2_micro"),
        )
    )
    return scored.orderBy(F.col("chi2_micro").desc(), "token").limit(25)


@register(
    "x_holt_linear",
    """
    WITH RECURSIVE mon AS (
      SELECT n_name AS nat, strftime(o_orderdate, '%Y-%m') AS mon,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), m AS (
      SELECT nat, mon, x,
             row_number() OVER (PARTITION BY nat ORDER BY mon) AS rn
      FROM mon
    ), h AS (
      SELECT nat, mon, rn, x, x AS l, CAST(0 AS BIGINT) AS b
      FROM m WHERE rn = 1
      UNION ALL
      SELECT m.nat, m.mon, m.rn, m.x,
             (2*m.x + 8*(h.l+h.b)) // 10 AS l,
             ((((2*m.x + 8*(h.l+h.b)) // 10) - h.l) + 9*h.b) // 10 AS b
      FROM h JOIN m ON m.nat = h.nat AND m.rn = h.rn + 1
    )
    SELECT nat AS n_name, mon, x AS revenue_cents,
           l AS level_cents, b AS trend_cents,
           l + b AS forecast_cents
    FROM h
    """,
)
def x_holt_linear(spark: SparkSession, sf: str) -> DataFrame:
    """HOLT'S LINEAR TREND smoothing (double exponential smoothing, α=0.2
    β=0.1 — the forecasting workhorse one step above EWMA, which
    `x_ewma_smooth` covers): per nation-month revenue, a SEQUENTIAL
    recurrence lₜ = αxₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
    emitting level, trend, and the 1-step-ahead forecast for every month.
    The recurrence runs in EXACT integer cents (rational coefficients,
    truncating DIV at every step — bit-identical to the oracle's unrolled
    recursive CTE).  Spark-first trick for ordered folds: each nation's
    ~84-month series collects into ONE array and folds through the
    `aggregate` higher-order function with an append accumulator — the
    recurrence parallelizes ACROSS nations while staying sequential
    WITHIN one, with no driver loop and no Python.  Scale shape: raw
    orders reduce to the nation-month table first (one shuffle); the
    fold state is bounded by series length (calendar-bounded, ~100
    entries), never by order volume."""
    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nat"), "mon")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    arr = monthly.groupBy("nat").agg(
        F.sort_array(F.collect_list(F.struct("mon", "x"))).alias("arr")
    )
    folded = arr.select(
        "nat",
        F.expr(
            """
            aggregate(
              slice(arr, 2, greatest(size(arr) - 1, 0)),
              array(named_struct('mon', arr[0].mon, 'x', arr[0].x,
                                 'l', arr[0].x, 'b', CAST(0 AS BIGINT))),
              (acc, e) -> array_append(acc, named_struct(
                'mon', e.mon, 'x', e.x,
                'l', (2*e.x + 8*(element_at(acc,-1).l + element_at(acc,-1).b))
                     DIV 10,
                'b', (((2*e.x + 8*(element_at(acc,-1).l
                                   + element_at(acc,-1).b)) DIV 10)
                      - element_at(acc,-1).l + 9*element_at(acc,-1).b) DIV 10))
            ) AS h
            """
        ),
    )
    return (
        folded.select("nat", F.explode("h").alias("s"))
        .select(
            F.col("nat").alias("n_name"),
            F.col("s.mon").alias("mon"),
            F.col("s.x").alias("revenue_cents"),
            F.col("s.l").alias("level_cents"),
            F.col("s.b").alias("trend_cents"),
            (F.col("s.l") + F.col("s.b")).alias("forecast_cents"),
        )
    )


