"""round-5+ batch: scans, bitwise, series, streaming witnesses — split from the monolithic queries.py (round 9,
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
from kafka_streaming_spark.queries.q06_ext_joins_session_multimodal import (  # noqa: F401
    _SESSIONIZE_CTE,
    _SESSION_GAP,
)
from kafka_streaming_spark.queries.q15_misc_graph_batch import (  # noqa: F401
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
    with _tiny_stream_conf(spark):
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


@register(
    "x_kaplan_meier",
    """
    WITH RECURSIVE dur AS (
      SELECT o_orderpriority AS prio,
             CAST(floor(epoch_ms(MIN(l_shipdate)) / 86400000.0) AS BIGINT)
               - CAST(floor(epoch_ms(MIN(o_orderdate)) / 86400000.0) AS BIGINT)
               AS t,
             CASE WHEN MIN(o_orderstatus) = 'F' THEN 1 ELSE 0 END AS evt
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderpriority
    ), grp AS (
      SELECT prio, t,
             CAST(SUM(evt) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM dur GROUP BY prio, t
    ), risk AS (
      SELECT prio, t, d,
             CAST(SUM(tot) OVER (PARTITION BY prio) AS BIGINT)
               - CAST(COALESCE(SUM(tot) OVER (PARTITION BY prio ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS n
      FROM grp
    ), ev AS (
      SELECT prio, t, d, n,
             row_number() OVER (PARTITION BY prio ORDER BY t) AS rn
      FROM risk WHERE d > 0
    ), km AS (
      SELECT prio, t, d, n, rn,
             CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS s
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.prio, e.t, e.d, e.n, e.rn,
             km.s * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE)) AS s
      FROM km JOIN ev e ON e.prio = km.prio AND e.rn = km.rn + 1
    )
    SELECT prio AS o_orderpriority, t AS duration_days,
           n AS n_at_risk, d AS d_events,
           CAST(FLOOR(s * 1000000000.0) AS BIGINT) AS survival_nano
    FROM km
    """,
)
def x_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """KAPLAN-MEIER survival curves (the censoring-aware time-to-event
    estimator — order-fulfillment SLAs here, churn/retention curves in
    product analytics): duration = days from order to first shipment,
    with non-finalized orders (status ≠ 'F') treated as RIGHT-CENSORED —
    they keep inflating the at-risk denominator but never count as
    events, which is exactly what a naive AVG(duration) gets wrong.
    Ŝ(t) = Π over event times ≤ t of (1 − dᵢ/nᵢ); the ordered product
    folds through the same array-`aggregate` pattern as `x_holt_linear`,
    each step one correctly-rounded IEEE divide + multiply from exact
    BIGINT (d, n) — bit-identical to the oracle's recursive-CTE unroll,
    emitted as a floored nano-unit integer.  Scale shape: order volume
    reduces to per-(priority, day) counts in two shuffles; the at-risk
    window and the fold run on the ≤ priorities × duration-range rows
    (calendar-bounded constant)."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate"
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    # Pre-aggregate lineitem to per-order MIN(shipdate) BEFORE the join:
    # the order attributes are constant per order, so grouping the JOINED
    # fact rows (the r5 shape) paid a second |lineitem|-row shuffle for
    # nothing — this shape shuffles lineitem once (the groupBy) and joins
    # order-grain tables, and the groupBy's hash partitioning on the
    # orderkey is reusable by the join (10x self-bench: 52.8s -> ~2x less
    # shuffle volume; oracle keeps the joined-grain derivation as an
    # independent witness).
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    dur = (
        first_ship.join(o, first_ship["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_orderpriority").alias("prio"),
            (
                F.expr("CAST(floor(unix_millis(ship0) / 86400000.0) AS BIGINT)")
                - F.expr("CAST(floor(unix_millis(o_orderdate) / 86400000.0) AS BIGINT)")
            ).alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("evt"),
        )
    )
    grp = dur.groupBy("prio", "t").agg(
        F.sum("evt").cast("long").alias("d"), F.count(F.lit(1)).alias("tot")
    )
    wp = Window.partitionBy("prio")
    wb = Window.partitionBy("prio").orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = grp.select(
        "prio",
        "t",
        "d",
        (
            F.sum("tot").over(wp).cast("long")
            - F.coalesce(F.sum("tot").over(wb), F.lit(0)).cast("long")
        ).alias("n"),
    ).filter(F.col("d") > 0)
    arr = risk.groupBy("prio").agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias("arr")
    )
    folded = arr.select(
        "prio",
        F.expr(
            """
            aggregate(
              slice(arr, 2, greatest(size(arr) - 1, 0)),
              array(named_struct('t', arr[0].t, 'd', arr[0].d, 'n', arr[0].n,
                    's', CAST(arr[0].n - arr[0].d AS DOUBLE)
                         / CAST(arr[0].n AS DOUBLE))),
              (acc, e) -> array_append(acc, named_struct(
                't', e.t, 'd', e.d, 'n', e.n,
                's', element_at(acc,-1).s
                     * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE))))
            ) AS km
            """
        ),
    )
    return (
        folded.select("prio", F.explode("km").alias("s"))
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("s.t").alias("duration_days"),
            F.col("s.n").alias("n_at_risk"),
            F.col("s.d").alias("d_events"),
            F.expr("CAST(FLOOR(s.s * 1000000000.0) AS BIGINT)").alias("survival_nano"),
        )
    )


@register(
    "x_lttb_downsample",
    """
    WITH daily AS (
      SELECT CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), b AS (
      SELECT day // 40 AS bk, day, y FROM daily
    ), st AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
      FROM b GROUP BY bk
    ), cand AS (
      SELECT p.bk, p.day, p.y,
             ABS( (l.sx - l.n * p.day) * (r.sy - r.n * p.y)
                - (r.sx - r.n * p.day) * (l.sy - l.n * p.y) ) AS area2
      FROM b p
      JOIN st l ON l.bk = p.bk - 1
      JOIN st r ON r.bk = p.bk + 1
    ), rk AS (
      SELECT bk, day, y, area2,
             row_number() OVER (PARTITION BY bk
                                ORDER BY area2 DESC, day) AS rn
      FROM cand
    )
    SELECT bk AS bucket, day AS day_num, y AS cents, area2
    FROM rk WHERE rn = 1
    """,
)
def x_lttb_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """LTTB DOWNSAMPLING (largest-triangle-three-buckets — the standard
    visual decimation for monitoring dashboards: keep the ~60 points that
    preserve the SHAPE of a 2,400-point series, not a blind every-Nth
    sample): the daily revenue series buckets into 40-day windows and
    each interior bucket keeps the point forming the largest triangle
    against its neighbor buckets' centroids (the parallel mean-anchor
    LTTB variant — anchoring on the previous bucket's MEAN instead of its
    selected point removes the sequential dependency, the documented
    trade-off that makes it distributable).  Triangle areas compare in
    EXACT integers: the two centroid divisions are cleared by
    cross-multiplying both terms with n_left·n_right (same positive
    factor within a bucket ⇒ same argmax), so area2 is pure BIGINT and
    the per-bucket winner is a deterministic (area DESC, day) struct-max
    AGGREGATE — no window sort.  Scale shape: orders reduce to the
    calendar-bounded daily table; bucket stats (~60 rows) broadcast back;
    one aggregate per bucket."""
    daily = (
        load_table(spark, sf, "orders")
        .select(
            F.expr("CAST(floor(unix_millis(o_orderdate) / 86400000.0) AS BIGINT)").alias(
                "day"
            ),
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    # the bucketed daily series feeds three consumers (stats twice via the
    # left/right neighbor views + the candidate probe): cache the
    # calendar-bounded table once instead of re-reducing orders per branch
    b = daily.select(F.expr("day DIV 40").alias("bk"), "day", "y").cache()
    st = b.groupBy("bk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    ).cache()
    # bucket-stat table is calendar-bounded (~days/40 rows at ANY SF)
    left = F.broadcast(
        st.select(
            (F.col("bk") + 1).alias("bk"),
            F.col("n").alias("ln"),
            F.col("sx").alias("lsx"),
            F.col("sy").alias("lsy"),
        )
    )
    right = F.broadcast(
        st.select(
            (F.col("bk") - 1).alias("bk"),
            F.col("n").alias("rn_"),
            F.col("sx").alias("rsx"),
            F.col("sy").alias("rsy"),
        )
    )
    cand = (
        b.join(left, "bk")
        .join(right, "bk")
        .select(
            "bk",
            "day",
            "y",
            F.abs(
                (F.col("lsx") - F.col("ln") * F.col("day"))
                * (F.col("rsy") - F.col("rn_") * F.col("y"))
                - (F.col("rsx") - F.col("rn_") * F.col("day"))
                * (F.col("lsy") - F.col("ln") * F.col("y"))
            ).alias("area2"),
        )
    )
    return (
        cand.groupBy("bk")
        .agg(
            F.min(
                F.struct(
                    (-F.col("area2")).alias("neg"),
                    F.col("day").alias("d"),
                    F.col("y").alias("v"),
                )
            ).alias("m")
        )
        .select(
            F.col("bk").alias("bucket"),
            F.col("m.d").alias("day_num"),
            F.col("m.v").alias("cents"),
            (-F.col("m.neg")).alias("area2"),
        )
    )


def _textrank_oracle(iters: int = 2) -> str:
    """DuckDB replica of integer PageRank over the word co-occurrence
    graph (adjacent alphabetic tokens within a document, canonicalized
    undirected) — same unrolled-round arithmetic as
    :func:`_pagerank_oracle`, different edge builder."""
    parts = [
        """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> regexp_matches(t, '^[a-z]{3,}$')) AS w
      FROM documents
    ), pairs AS (
      SELECT DISTINCT least(p.a, p.b) AS u, greatest(p.a, p.b) AS v
      FROM toks,
           unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> struct_pack(a := w[i], b := w[i+1]))) AS t(p)
      WHERE p.a <> p.b
    ), edges AS (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL
      SELECT v AS src, u AS dst FROM pairs
    ), deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg
    )"""
    ]
    for i in range(iters):
        parts.append(f""", r{i + 1} AS (
      SELECT e.dst AS node,
             150000 + (85 * CAST(SUM(r.r // d.degree) AS BIGINT)) // 100 AS r
      FROM edges e
      JOIN r{i} r ON e.src = r.node
      JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    )""")
    parts.append(f"""
    SELECT r.node AS token, r.r AS rank_micro, d.degree
    FROM r{iters} r JOIN deg d ON r.node = d.node
    ORDER BY rank_micro DESC, token LIMIT 25
    """)
    return "".join(parts)


@register("x_textrank_keywords", _textrank_oracle())
def x_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """TEXTRANK keyword extraction (Mihalcea & Tarau's unsupervised
    keyword ranker — PageRank over the word co-occurrence graph instead
    of the citation graph): adjacent alphabetic tokens (≥3 chars) within
    each document become canonical undirected edges, and 2 damped
    iterations of the SAME exact-integer PageRank used by
    `x_pagerank_trade` (`functions/graph.py:pagerank`) rank the
    vocabulary; top-25 keywords.  Demonstrates the graph engine is
    generic over node type (string tokens here, BIGINT entity keys
    there).  Scale shape: edge building is a map-side array transform +
    one distinct; each round is one broadcast-rank join + one inbound
    groupBy on the token key; ranking is bounded top-k."""
    d = load_table(spark, sf, "documents")
    toks = spread(d).select(
        F.expr(
            "filter(split(trim(lower(text)), '\\\\s+'), t -> t rlike '^[a-z]{3,}$')"
        ).alias("w")
    )
    pairs = (
        toks.filter(F.expr("size(w) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> named_struct('a', w[i], 'b', w[i+1]))"
                )
            ).alias("p")
        )
        .filter(F.col("p.a") != F.col("p.b"))
        .select(
            F.least("p.a", "p.b").alias("u"), F.greatest("p.a", "p.b").alias("v")
        )
        .distinct()
    )
    ranks = G.pagerank(G.undirect(pairs), iters=2, broadcast_ranks=True)
    return (
        ranks.select(F.col("node").alias("token"), "rank_micro", "degree")
        .orderBy(F.col("rank_micro").desc(), "token")
        .limit(25)
    )


_RAKE_STOPWORDS = (
    "the,a,an,and,or,but,of,to,in,on,for,with,is,are,was,were,be,as,at,by,"
    "it,its,this,that,from,has,have,had,not,no,we,you,they,he,she,i"
)


@register(
    "x_rake_keywords",
    f"""
    WITH toks AS (
      SELECT doc_id, p.i AS i, p.tok AS tok
      FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        FROM documents
      ), unnest(list_transform(generate_series(1, len(w)),
               i -> struct_pack(i := i, tok := w[i]))) AS t(p)
    ), flagged AS (
      SELECT doc_id, tok, i,
             CASE WHEN list_contains(string_split('{_RAKE_STOPWORDS}', ','),
                                     tok)
                    OR NOT regexp_matches(tok, '^[a-z]+$')
                  THEN 1 ELSE 0 END AS stop
      FROM toks
    ), seg AS (
      SELECT doc_id, tok, stop,
             CAST(SUM(stop) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS pid
      FROM flagged
    ), phrase_words AS (
      SELECT doc_id, pid, tok FROM seg WHERE stop = 0
    ), plen AS (
      SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS phrase_len
      FROM phrase_words GROUP BY doc_id, pid
    ), scored AS (
      SELECT w.tok,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.phrase_len) AS BIGINT) AS degree
      FROM phrase_words w
      JOIN plen p ON w.doc_id = p.doc_id AND w.pid = p.pid
      GROUP BY w.tok
    )
    SELECT tok AS token, freq, degree,
           degree * 1000000 // freq AS score_micro
    FROM scored
    WHERE freq >= 5
    ORDER BY score_micro DESC, token LIMIT 25
    """,
)
def x_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction —
    the degree/frequency heuristic): documents split into candidate
    phrases at stopwords/non-alpha tokens (the phrase id is a running
    count of delimiter tokens — one cumulative-sum window per document),
    then each word scores degree/frequency where degree sums the lengths
    of every phrase containing it — words that live in LONG multi-word
    phrases outrank equally-frequent words that appear alone.  Exact
    integer micro-score; ≥5 occurrences; top-25.  Scale shape: one
    window pass per doc-token stream (partitioned by doc_id, bounded by
    doc length), two keyed aggregates, bounded top-k — the stopword list
    is a compile-time literal shared verbatim with the oracle."""
    from pyspark.sql import Window

    stops = _RAKE_STOPWORDS.split(",")
    d = load_table(spark, sf, "documents")
    toks = spread(d).select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "i", "tok"
        ),
    )
    flagged = toks.withColumn(
        "stop",
        F.when(
            F.col("tok").isin(stops) | ~F.col("tok").rlike("^[a-z]+$"), 1
        ).otherwise(0),
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = flagged.withColumn("pid", F.sum("stop").over(wseg).cast("long"))
    phrase_words = seg.filter(F.col("stop") == 0).select("doc_id", "pid", "tok")
    plen = phrase_words.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    scored = (
        phrase_words.join(plen, ["doc_id", "pid"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("phrase_len").cast("long").alias("degree"),
        )
        .filter(F.col("freq") >= 5)
    )
    return (
        scored.select(
            F.col("tok").alias("token"),
            "freq",
            "degree",
            F.expr("degree * 1000000 DIV freq").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "token")
        .limit(25)
    )


@register(
    "x_readability",
    """
    WITH stats AS (
      SELECT doc_id,
             GREATEST(len(list_filter(
               regexp_split_to_array(text, '[.!?]+'),
               s -> trim(s) <> '')), 1) AS n_sents,
             GREATEST(len(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t <> '')), 1) AS n_words,
             GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS n_sylls
      FROM documents
    )
    SELECT doc_id,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sylls AS BIGINT) AS n_sylls,
           CAST(206835000
                - (1015 * (n_words * 1000000 // n_sents)) // 1000
                - (846 * (n_sylls * 1000000 // n_words)) // 10
                AS BIGINT) AS flesch_micro
    FROM stats
    """,
)
def x_readability(spark: SparkSession, sf: str) -> DataFrame:
    """FLESCH READING-EASE scoring (the corpus-quality readability gate —
    206.835 − 1.015·words/sentence − 84.6·syllables/word): sentences
    split on terminal punctuation, syllables approximated by vowel-group
    runs (the standard regex proxy), and the linear formula evaluated
    ENTIRELY in integer micro-units — the transcendental-free cousin of
    the Gopher/quality gates, with the constant coefficients embedded as
    exact micro literals shared with the oracle.  GREATEST(·,1) guards
    division on degenerate docs.  Scale shape: pure map-side column
    expressions over one scan — no shuffle at all beyond the input
    spread."""
    d = load_table(spark, sf, "documents")
    return spread(d).select(
        "doc_id",
        F.greatest(
            F.expr(
                "size(filter(split(text, '[.!?]+'), s -> trim(s) != ''))"
            ),
            F.lit(1),
        )
        .cast("long")
        .alias("n_sents"),
        F.greatest(
            F.expr("size(filter(split(trim(lower(text)), '\\\\s+'), t -> t != ''))"),
            F.lit(1),
        )
        .cast("long")
        .alias("n_words"),
        F.greatest(
            F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"), F.lit(1)
        )
        .cast("long")
        .alias("n_sylls"),
    ).select(
        "doc_id",
        "n_sents",
        "n_words",
        "n_sylls",
        F.expr(
            "CAST(206835000"
            " - (1015 * (n_words * 1000000 DIV n_sents)) DIV 1000"
            " - (846 * (n_sylls * 1000000 DIV n_words)) DIV 10 AS BIGINT)"
        ).alias("flesch_micro"),
    )


def _dbscan_ctes(eps: int = 4000, min_nbrs: int = 3) -> str:
    """Shared DuckDB CTE chain for grid-blocked DBSCAN over md5-derived
    customer coordinates: ``nbrs`` (eps-ball pairs via 3×3 cell probe),
    ``core`` (points with ≥ min_nbrs neighbors), ``cc`` (min-reachable-id
    transitive closure over core-core edges)."""
    return f"""pts AS (
      SELECT c_custkey AS k,
             CAST(concat('0x', substr(md5('dbx' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100000 AS x,
             CAST(concat('0x', substr(md5('dby' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100000 AS y
      FROM customer
    ), nbrs AS (
      SELECT a.k AS k1, b.k AS k2
      FROM pts a
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
      JOIN pts b ON b.x // {eps} = a.x // {eps} + ox.dx
                AND b.y // {eps} = a.y // {eps} + oy.dy
      WHERE a.k <> b.k
        AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {eps * eps}
    ), core AS (
      SELECT k1 AS k FROM nbrs GROUP BY k1 HAVING COUNT(*) >= {min_nbrs}
    ), core_edges AS (
      SELECT n.k1 AS a, n.k2 AS b FROM nbrs n
      JOIN core c1 ON n.k1 = c1.k JOIN core c2 ON n.k2 = c2.k
    ), reach(a, b) AS (
      SELECT a, b FROM core_edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN core_edges e ON r.b = e.a
    ), cc0 AS (
      SELECT a AS k, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    ), cc AS (
      -- isolated cores (no core-core edge) are singleton clusters
      SELECT c.k, COALESCE(cc0.cluster_id, c.k) AS cluster_id
      FROM core c LEFT JOIN cc0 ON c.k = cc0.k
    )"""


@register(
    "x_dbscan_clusters",
    f"""
    WITH RECURSIVE {_dbscan_ctes()}
    SELECT k AS point_id, 'core' AS role, cluster_id
    FROM cc
    UNION ALL
    SELECT n.k1 AS point_id, 'border' AS role,
           MIN(c.cluster_id) AS cluster_id
    FROM nbrs n
    JOIN cc c ON n.k2 = c.k
    LEFT JOIN core me ON n.k1 = me.k
    WHERE me.k IS NULL
    GROUP BY n.k1
    """,
)
def x_dbscan_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """GRID-BLOCKED DBSCAN (density-based clustering with noise — the
    spatial/embedding clustering that k-means can't do: arbitrary-shape
    clusters, explicit outlier rejection): points on a 100k² integer
    plane (portable md5 coordinates), eps-ball neighborhoods found by the
    SAME 3×3 cell-probe blocking as `x_grid_nearest_join` (cell = eps ⇒
    every true neighbor is in the 9-cell stencil — never a distance cross
    join), core points have ≥3 neighbors, clusters are connected
    components over core-core edges (the engine's pointer-jumping CC
    solver, `functions/dedup.py:dedup_clusters`), and border points
    attach to their minimum-id neighboring core cluster; noise is
    absent.  Every stage is exact-integer and cross-engine (the oracle
    re-runs the blocking and closes components by recursive transitive
    closure).  Scale shape: the pair join is cell-keyed (density-bounded
    fan-out), core detection is one count aggregate, CC is O(log n)
    keyed rounds with checkpointed lineage."""
    EPS, MIN_NBRS = 4000, 3
    c = load_table(spark, sf, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        (D.portable_hash60(F.concat(F.lit("dbx"), F.col("c_custkey").cast("string"))) % 100000).alias("x"),
        (D.portable_hash60(F.concat(F.lit("dby"), F.col("c_custkey").cast("string"))) % 100000).alias("y"),
    ).cache()
    offsets = spark.range(1).select(
        F.explode(F.expr("array(-1, 0, 1)")).alias("dx")
    ).crossJoin(
        spark.range(1).select(F.explode(F.expr("array(-1, 0, 1)")).alias("dy"))
    )
    a = pts.select(F.col("k").alias("k1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select(F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    nbrs = (
        a.crossJoin(F.broadcast(offsets))
        .join(
            b,
            (F.expr(f"x2 DIV {EPS}") == F.expr(f"x1 DIV {EPS}") + F.col("dx"))
            & (F.expr(f"y2 DIV {EPS}") == F.expr(f"y1 DIV {EPS}") + F.col("dy")),
        )
        .filter(
            (F.col("k1") != F.col("k2"))
            & (
                (F.col("x1") - F.col("x2")) * (F.col("x1") - F.col("x2"))
                + (F.col("y1") - F.col("y2")) * (F.col("y1") - F.col("y2"))
                <= EPS * EPS
            )
        )
        .select("k1", "k2")
        .cache()
    )
    core = (
        nbrs.groupBy("k1")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_NBRS)
        .select(F.col("k1").alias("k"))
        .cache()
    )
    core_edges = (
        nbrs.join(core.select(F.col("k").alias("k1")), "k1")
        .join(core.select(F.col("k").alias("k2")), "k2")
        .filter(F.col("k1") < F.col("k2"))
        .select(F.col("k1").alias("id_a"), F.col("k2").alias("id_b"))
    )
    cc0 = D.dedup_clusters(core_edges).select(
        F.col("doc_id").alias("k"), "cluster_id"
    )
    # isolated cores (no core-core edge) are singleton clusters
    cc = core.join(cc0, "k", "left").select(
        "k", F.coalesce("cluster_id", F.col("k")).alias("cluster_id")
    )
    cores_out = cc.select(
        F.col("k").alias("point_id"), F.lit("core").alias("role"), "cluster_id"
    )
    borders_out = (
        nbrs.join(core.select(F.col("k").alias("k1")), "k1", "left_anti")
        .join(cc.select(F.col("k").alias("k2"), "cluster_id"), "k2")
        .groupBy(F.col("k1").alias("point_id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
        .select("point_id", F.lit("border").alias("role"), "cluster_id")
    )
    return cores_out.unionAll(borders_out)


@register(
    "x_image_histogram",
    """
    WITH px AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 200
    ), vals AS (
      SELECT doc_id,
             unnest(flatten(list_transform(
               generate_series(0, h*w - 1),
               p -> list_transform([0, 1, 2],
                      c -> ((p // w) + 2*(p % w) + 37*c + doc_id) % 256)
             ))) AS v
      FROM px
    )
    SELECT doc_id AS asset_id, CAST(v // 64 AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pixels
    FROM vals GROUP BY doc_id, v // 64
    """,
)
def x_image_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """PIXEL-INTENSITY HISTOGRAM over real decoded PNGs (the
    brightness/contrast audit every vision-data pipeline runs before
    training): the same deterministic gradient PNGs as
    `x_image_pixel_stats` are decoded end-to-end and each image reduces
    to its 4-bucket intensity histogram — the histogram is computed from
    the DECODED BYTES inside the Arrow batch (numpy bincount over the
    pixel tensor), while the oracle re-derives it from the generation
    formula, so agreement witnesses the whole codec chain again but
    through a different reduction.  Scale shape: decode stays in
    `mapInPandas` at the binary boundary; the histogram rows (≤4 per
    asset) aggregate map-side."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from kafka_streaming_spark.functions.multimodal import (
        decode_image_pixels,
        encode_png,
    )
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + d % 7
                i = np.arange(h).reshape(h, 1, 1)
                j = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((i + 2 * j + 37 * c + d) % 256).astype(np.uint8)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "media_type": "image/png", "payload": payloads}
            )

    decoded = decode_image_pixels(ids.mapInPandas(gen, gen_schema))
    hist_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("bin", IntegerType(), False),
            StructField("n_pixels", LongType(), False),
        ]
    )

    def hist(batches):
        for pdf in batches:
            ids_, bins_, cnts_ = [], [], []
            for asset_id, px in zip(pdf["asset_id"], pdf["pixels"]):
                if px is None:
                    continue
                counts = np.bincount(
                    np.frombuffer(px, np.uint8) >> 6, minlength=4
                )
                for bn in range(4):
                    if counts[bn]:
                        ids_.append(asset_id)
                        bins_.append(bn)
                        cnts_.append(int(counts[bn]))
            yield pd.DataFrame({"asset_id": ids_, "bin": bins_, "n_pixels": cnts_})

    return decoded.select("asset_id", "pixels").mapInPandas(hist, hist_schema)


@register(
    "x_video_shot_detect",
    """
    WITH a AS (
      SELECT doc_id, 4 + doc_id % 5 AS n, 8 + doc_id % 5 AS h, 8 + doc_id % 6 AS w
      FROM documents WHERE doc_id < 120
    ), fr AS (
      SELECT doc_id, h, w, unnest(generate_series(0, n - 1)) AS f
      FROM a
    ), sums AS (
      SELECT doc_id, f,
             CAST(list_sum(flatten(list_transform(
               generate_series(0, h*w - 1),
               p -> list_transform([0, 1, 2],
                      c -> (doc_id + 11*f + 3*(p // w) + 5*(p % w) + 29*c) % 256)
             ))) AS BIGINT) AS s
      FROM fr
    ), d AS (
      SELECT doc_id, f, s,
             s - lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS ds
      FROM sums
    )
    SELECT doc_id AS asset_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(ABS(ds) AS BIGINT) AS sum_diff,
           CAST(CASE WHEN ABS(ds) > 2000 THEN 1 ELSE 0 END AS INTEGER)
             AS is_shot_boundary
    FROM d WHERE ds IS NOT NULL
    """,
)
def x_video_shot_detect(spark: SparkSession, sf: str) -> DataFrame:
    """SHOT-BOUNDARY DETECTION over real decoded AVI video (the temporal
    segmentation step of video-training pipelines — split on hard cuts
    before captioning/sampling): every frame of each deterministic AVI is
    decoded (`sample_frames` with every_n=1 → real PNG per frame), each
    frame reduces to its pixel sum, and consecutive-frame deltas above a
    threshold flag a cut.  The oracle recomputes the per-frame sums from
    the generation formula and applies the same lag — so the pass
    witnesses codec + temporal ordering end-to-end.  Scale shape: decode
    fans out inside `mapInPandas` (no frame-array shuffle); the lag
    window partitions by asset (state bounded by frames-per-asset)."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from pyspark.sql import Window
    from kafka_streaming_spark.functions.multimodal import (
        decode_png,
        encode_avi,
        sample_frames,
    )
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 120).select("doc_id")
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, h, w = 4 + d % 5, 8 + d % 5, 8 + d % 6
                f = np.arange(n).reshape(n, 1, 1, 1)
                y = np.arange(h).reshape(1, h, 1, 1)
                x = np.arange(w).reshape(1, 1, w, 1)
                c = np.arange(3).reshape(1, 1, 1, 3)
                px = ((d + 11 * f + 3 * y + 5 * x + 29 * c) % 256).astype(np.uint8)
                payloads.append(encode_avi(px, fps=25))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "media_type": "video/avi", "payload": payloads}
            )

    frames = sample_frames(ids.mapInPandas(gen, gen_schema), every_n=1)

    png_sum = F.pandas_udf(
        lambda b: b.map(
            lambda v: int(decode_png(v)[3].astype(np.int64).sum()) if v is not None else 0
        ),
        "long",
    )
    sums = frames.select(
        "asset_id", "frame_idx", png_sum("frame").alias("s")
    )
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    d = sums.withColumn("ds", F.col("s") - F.lag("s").over(w)).filter(
        F.col("ds").isNotNull()
    )
    return d.select(
        "asset_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.abs(F.col("ds")).cast("long").alias("sum_diff"),
        F.when(F.abs(F.col("ds")) > 2000, 1).otherwise(0).cast("int").alias(
            "is_shot_boundary"
        ),
    )


@register(
    "x_compaction_plan",
    """
    WITH f AS (
      SELECT doc_id, n_chars,
             COALESCE(CAST(SUM(n_chars) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS BIGINT), 0) AS cum_before
      FROM documents
    ), assigned AS (
      SELECT doc_id, n_chars, cum_before // 32768 AS target_file
      FROM f
    )
    SELECT target_file,
           CAST(COUNT(*) AS BIGINT) AS n_source_files,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc,
           CAST(CASE WHEN SUM(n_chars) < 16384 THEN 1 ELSE 0 END AS INTEGER)
             AS underfull
    FROM assigned GROUP BY target_file
    """,
)
def x_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """SMALL-FILE COMPACTION PLANNER (the OPTIMIZE bin-packing step every
    lakehouse table needs: coalesce thousands of small files into
    ~target-size outputs while preserving sort order): files (stand-in:
    documents sized by n_chars) are packed by CUMULATIVE-SUM bucketing —
    running total ÷ target (32 KiB) assigns each file to an output group,
    which keeps doc_id order contiguous per output (range-readable
    afterwards, unlike first-fit-decreasing which scrambles order and is
    inherently sequential).  Emits per-target-file manifests with an
    underfull flag (< half target).  Scale shape: ONE global running-sum
    window + one aggregate; at 100 TB the window partitions by table
    partition key first (per-partition compaction, embarrassingly
    parallel) — the global form here is the single-partition case."""
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    assigned = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("long")
    ).select("doc_id", "n_chars", F.expr("cum_before DIV 32768").alias("target_file"))
    return (
        assigned.groupBy("target_file")
        .agg(
            F.count(F.lit(1)).alias("n_source_files"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select(
            "target_file",
            "n_source_files",
            "total_bytes",
            "first_doc",
            "last_doc",
            F.when(F.col("total_bytes") < 16384, 1).otherwise(0).cast("int").alias(
                "underfull"
            ),
        )
    )


@register(
    "f_xml_scan",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents GROUP BY source
    """,
)
def f_xml_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Native XML source end to end (Spark 4's built-in ``xml`` format —
    the spark-xml donation): documents metadata is staged as an XML
    document per row (``rowTag``-delimited), read back through the XML
    reader with an explicit schema, and aggregated; the oracle reads the
    original parquet, so a pass proves the XML write → parse round trip
    (escaping included) drops and damages nothing.  Completes the source
    matrix: csv / jsonl / text / orc / parquet / hive-partitioned /
    mergeSchema / bucketed / XML."""
    import os
    import shutil
    import uuid

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = load_table(spark, sf, "documents").select("source", "doc_id", "n_chars")
    slug = sf.replace("/", "_").strip("_")
    base = f"/root/repo/.tmp/f_xml_scan_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        d.write.mode("overwrite").option("rowTag", "doc").format("xml").save(
            f"{build}/src"
        )
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [
            StructField("source", StringType(), True),
            StructField("doc_id", LongType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )
    back = (
        spark.read.schema(schema).option("rowTag", "doc").format("xml").load(src)
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


@register(
    "x_seasonal_decompose",
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
    ), tr AS (
      SELECT nat, day, x,
             CAST(SUM(x) OVER w AS BIGINT) // 7 AS trend,
             COUNT(*) OVER w AS n7
      FROM daily
      WINDOW w AS (PARTITION BY nat ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
      SELECT nat, day, x, trend, x - trend AS detr
      FROM tr WHERE n7 = 7
    ), seas AS (
      SELECT nat, day % 7 AS dow,
             CAST(SUM(detr) AS BIGINT) AS s_sum,
             CAST(COUNT(*) AS BIGINT) AS s_n
      FROM det GROUP BY nat, day % 7
    )
    SELECT d.nat AS n_name, d.day, d.x AS revenue_cents,
           d.trend AS trend_cents,
           s.s_sum * 1000000 // s.s_n AS seasonal_micro,
           d.detr * 1000000 - s.s_sum * 1000000 // s.s_n AS residual_micro
    FROM det d JOIN seas s ON d.nat = s.nat AND d.day % 7 = s.dow
    """,
)
def x_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """CLASSICAL ADDITIVE DECOMPOSITION (trend + seasonal + residual —
    the STL-style diagnostic behind `x_seasonal_baseline`'s weekday
    profile and `x_traffic_anomaly`'s spike monitor): per nation, trend =
    centered 7-day moving average (full windows only), seasonal = each
    weekday's mean of the detrended series, residual = what neither
    explains.  Division appears exactly twice (trend DIV 7, seasonal
    micro-mean) — both truncating integer DIV, so the whole decomposition
    is BIGINT-exact cross-engine.  Weekday = epoch_day % 7
    (locale-free).  Scale shape: orders reduce to the daily series
    first; ONE (nation)-partitioned window sort serves the centered MA;
    the 7-row-per-nation seasonal profile joins back broadcast."""
    from pyspark.sql import Window

    daily = _nation_daily_cents(spark, sf)
    w7 = Window.partitionBy("nat").orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.withColumn("trend", F.expr("CAST(1 AS BIGINT)") * F.sum("x").over(w7))
        .withColumn("n7", F.count(F.lit(1)).over(w7))
        .filter(F.col("n7") == 7)
        .select(
            "nat",
            "day",
            "x",
            F.expr("trend DIV 7").alias("trend"),
            (F.col("x") - F.expr("trend DIV 7")).alias("detr"),
        )
        # detrended series feeds BOTH the seasonal profile and the final
        # join: cache the (nation×~2400)-row table instead of re-reducing
        # raw orders per consumer
        .cache()
    )
    seas = det.groupBy(
        F.col("nat").alias("s_nat"), (F.col("day") % 7).alias("dow")
    ).agg(
        F.sum("detr").cast("long").alias("s_sum"),
        F.count(F.lit(1)).alias("s_n"),
    )
    j = det.join(
        F.broadcast(seas),
        (F.col("nat") == F.col("s_nat")) & ((F.col("day") % 7) == F.col("dow")),
    )
    return j.select(
        F.col("nat").alias("n_name"),
        "day",
        F.col("x").alias("revenue_cents"),
        F.col("trend").alias("trend_cents"),
        F.expr("s_sum * 1000000 DIV s_n").alias("seasonal_micro"),
        (F.col("detr") * 1000000 - F.expr("s_sum * 1000000 DIV s_n")).alias(
            "residual_micro"
        ),
    )


@register(
    "x_decision_stump",
    """
    WITH pts AS (
      SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 50000 AS bin,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS pos
      FROM customer
    ), bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM pts GROUP BY bin
    ), cum AS (
      SELECT bin, n, p,
             CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cn,
             CAST(SUM(p) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cp,
             CAST(SUM(n) OVER () AS BIGINT) AS tn,
             CAST(SUM(p) OVER () AS BIGINT) AS tp
      FROM bins
    ), scored AS (
      SELECT (bin + 1) * 50000 AS threshold_cents,
             cn AS n_left, tn - cn AS n_right,
             cp AS pos_left, tp - cp AS pos_right,
             CAST(FLOOR(2000000.0 * CAST(cp AS DOUBLE)
                        * CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE))
                  AS BIGINT)
             + CAST(FLOOR(2000000.0 * CAST(tp - cp AS DOUBLE)
                          * CAST((tn - cn) - (tp - cp) AS DOUBLE)
                          / CAST(tn - cn AS DOUBLE)) AS BIGINT)
               AS weighted_gini_scaled
      FROM cum WHERE cn > 0 AND tn - cn > 0
    )
    SELECT threshold_cents, n_left, n_right, pos_left, pos_right,
           weighted_gini_scaled
    FROM scored ORDER BY weighted_gini_scaled, threshold_cents LIMIT 5
    """,
)
def x_decision_stump(spark: SparkSession, sf: str) -> DataFrame:
    """DECISION-STUMP SPLIT SEARCH (the inner loop of every tree/GBDT
    trainer: scan candidate thresholds on a feature, pick the split
    minimizing weighted Gini impurity): account balance (binned to $500
    candidate cuts) vs the BUILDING-segment label.  The weighted impurity
    N·Σ nₛ/N·giniₛ expands to 2·posL·negL/nL + 2·posR·negR/nR — each
    term one fixed IEEE multiply/divide chain floored to a scaled BIGINT
    (exact while pos·neg·2e6 < 2⁵³ — beyond that swap the chain for
    DECIMAL accumulation), cumulative sums over the ordered bin table
    give EVERY candidate split in one window pass (no per-threshold
    rescan).  Top-5 splits.  Scale shape: rows reduce to ≤ #bins
    immediately; the candidate scan is a window over the tiny bin table."""
    from pyspark.sql import Window

    pts = load_table(spark, sf, "customer").select(
        F.expr(
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 50000"
        ).alias("bin"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("pos"),
    )
    bins = pts.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").cast("long").alias("p")
    )
    wo = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = (
        bins.withColumn("cn", F.sum("n").over(wo).cast("long"))
        .withColumn("cp", F.sum("p").over(wo).cast("long"))
        .withColumn("tn", F.sum("n").over(wall).cast("long"))
        .withColumn("tp", F.sum("p").over(wall).cast("long"))
    )
    scored = cum.filter((F.col("cn") > 0) & (F.col("tn") - F.col("cn") > 0)).select(
        ((F.col("bin") + 1) * 50000).alias("threshold_cents"),
        F.col("cn").alias("n_left"),
        (F.col("tn") - F.col("cn")).alias("n_right"),
        F.col("cp").alias("pos_left"),
        (F.col("tp") - F.col("cp")).alias("pos_right"),
        F.expr(
            "CAST(FLOOR(2000000.0 * CAST(cp AS DOUBLE)"
            " * CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE)) AS BIGINT)"
            " + CAST(FLOOR(2000000.0 * CAST(tp - cp AS DOUBLE)"
            " * CAST((tn - cn) - (tp - cp) AS DOUBLE)"
            " / CAST(tn - cn AS DOUBLE)) AS BIGINT)"
        ).alias("weighted_gini_scaled"),
    )
    return scored.orderBy("weighted_gini_scaled", "threshold_cents").limit(5)


@register(
    "x_inverted_index",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
      FROM documents
    ), idx AS (
      SELECT t AS token,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS cf,
             array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',')
               AS postings_head
      FROM tok GROUP BY t
    )
    SELECT token, df, cf, postings_head
    FROM idx WHERE df >= 20
    """,
)
def x_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """INVERTED-INDEX CONSTRUCTION (the data structure BEHIND
    `x_bm25_search` — built here as an inspectable artifact, the search-
    engine-build workload): per token, document frequency, collection
    frequency, and the head of the sorted postings list (first 10 doc
    ids).  One tokenize-explode + one aggregate; postings collect as a
    set and sort INSIDE each group (bounded by df), never a global sort,
    then serialize to a comma-joined string (driver canonicalizer policy:
    no container outputs).
    Scale shape: classic map-side-combinable aggregation on the token
    key; at 100 TB the posting heads stay bounded (10 ids) while full
    postings would go to a bucketed sink instead of the driver."""
    d = load_table(spark, sf, "documents")
    tok = spread(d).select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("t")
    )
    return (
        tok.groupBy(F.col("t").alias("token"))
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("cf"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 10), ","
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 20)
    )


@register(
    "x_local_clustering",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey % 100 AS item FROM lineitem
    ), pairs0 AS (
      SELECT a.item AS u, b.item AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    ), st AS (
      SELECT CAST(SUM(c) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS np
      FROM pairs0
    ), pairs AS (
      SELECT u, v FROM pairs0 CROSS JOIN st WHERE c * st.np > st.tot
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), tri AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT unnest([e1.u, e1.v, e2.v]) AS node
        FROM pairs e1
        JOIN pairs e2 ON e1.v = e2.u
        JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
      ) GROUP BY node
    )
    SELECT deg.node, deg.d AS degree,
           COALESCE(tri.t, 0) AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN COALESCE(tri.t, 0) * 2000000 // (deg.d * (deg.d - 1))
                ELSE 0 END AS lcc_micro
    FROM deg LEFT JOIN tri ON deg.node = tri.node
    """,
)
def x_local_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT (per-node triangle density — 'are my
    neighbors also neighbors of each other?', the community-tightness
    diagnostic that global counts like `x_triangle_count` can't give):
    on the same support-filtered co-purchase graph, each oriented
    triangle (u<v<w) credits ALL THREE corners, and lcc = 2t/(d(d−1)) in
    exact integer micro-units.  Scale shape: the oriented-edge triangle
    join (two co-partitioned self-joins), one explode to corners, one
    count — the per-node credit costs one extra aggregate over the
    global version; isolated and degree-1 nodes report 0."""
    li = load_table(spark, sf, "lineitem")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    a = items.select("l_orderkey", F.col("item").alias("u"))
    b = items.select("l_orderkey", F.col("item").alias("v"))
    pairs0 = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    st = pairs0.agg(F.sum("__c").alias("__tot"), F.count(F.lit(1)).alias("__np"))
    pairs = (
        pairs0.crossJoin(F.broadcast(st))
        .filter(F.col("__c") * F.col("__np") > F.col("__tot"))
        .select("u", "v")
        .cache()
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = pairs.select(F.col("u").alias("a1"), F.col("v").alias("b1"))
    e2 = pairs.select(F.col("u").alias("b1"), F.col("v").alias("c1"))
    e3 = pairs.select(F.col("u").alias("a1"), F.col("v").alias("c1"))
    tri = (
        e1.join(e2, "b1")
        .join(e3, ["a1", "c1"])
        .select(F.explode(F.array("a1", "b1", "c1")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
        F.expr(
            "CASE WHEN degree >= 2"
            " THEN coalesce(t, 0) * 2000000 DIV (degree * (degree - 1))"
            " ELSE 0 END"
        ).alias("lcc_micro"),
    )


@register(
    "x_calibration_curve",
    """
    WITH scored AS (
      SELECT lang = 'en' AS pos,
             len(regexp_extract_all(lower(text), '[aeiou]')) * 1000000
               // GREATEST(n_chars, 1) AS p_hat_micro
      FROM documents
    ), binned AS (
      SELECT LEAST(p_hat_micro // 50000, 9) AS bin, pos, p_hat_micro
      FROM scored
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p_hat_micro) // COUNT(*) AS BIGINT) AS mean_pred_micro,
           CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS frac_pos_micro
    FROM binned GROUP BY bin
    """,
)
def x_calibration_curve(spark: SparkSession, sf: str) -> DataFrame:
    """CALIBRATION / RELIABILITY CURVE (the model-eval diagnostic ROC-AUC
    can't give: 'when the model says 30%, does it happen 30% of the
    time?'): a deterministic vowel-density score proxies the predicted
    P(lang=en), predictions bucket into 10 bins, and each bin reports
    mean prediction vs observed positive rate — perfectly calibrated
    means the two columns track.  Everything exact integer micro-units.
    Scale shape: pure map-side scoring + one bounded (≤10-row) aggregate
    — the eval suite's fourth leg beside `x_roc_auc`,
    `x_regression_metrics`, `x_ndcg_eval`."""
    d = load_table(spark, sf, "documents")
    scored = spread(d).select(
        (F.col("lang") == "en").alias("pos"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[aeiou]', 0)) * 1000000"
            " DIV greatest(n_chars, 1)"
        ).alias("p_hat_micro"),
    )
    return (
        scored.select(
            F.least(F.expr("p_hat_micro DIV 50000"), F.lit(9)).alias("bin"),
            "pos",
            "p_hat_micro",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p_hat_micro").alias("__sp"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("__pp"),
        )
        .select(
            "bin",
            "n_docs",
            F.expr("CAST(__sp DIV n_docs AS BIGINT)").alias("mean_pred_micro"),
            F.expr("CAST(__pp * 1000000 DIV n_docs AS BIGINT)").alias(
                "frac_pos_micro"
            ),
        )
    )


@register(
    "x_revenue_bridge",
    """
    WITH yr AS (
      SELECT c_mktsegment AS seg, year(o_orderdate) AS y,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r,
             CAST(COUNT(*) AS BIGINT) AS q
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), w AS (
      SELECT seg,
             MAX(CASE WHEN y = 1996 THEN r END) AS r1,
             MAX(CASE WHEN y = 1996 THEN q END) AS q1,
             MAX(CASE WHEN y = 1997 THEN r END) AS r2,
             MAX(CASE WHEN y = 1997 THEN q END) AS q2
      FROM yr GROUP BY seg
    ), eff AS (
      SELECT seg, r1, q1, r2, q2,
             r1 * 1000000 // q1 AS avg1_micro,
             r2 * 1000000 // q2 AS avg2_micro
      FROM w WHERE q1 > 0 AND q2 > 0
    )
    SELECT seg AS c_mktsegment, r1 AS rev1_cents, r2 AS rev2_cents,
           q1 AS n_orders1, q2 AS n_orders2,
           r2 - r1 AS delta_cents,
           (q2 - q1) * avg1_micro // 1000000 AS volume_effect_cents,
           q2 * (avg2_micro - avg1_micro) // 1000000 AS price_effect_cents,
           (r2 - r1) - (q2 - q1) * avg1_micro // 1000000
             - q2 * (avg2_micro - avg1_micro) // 1000000 AS residual_cents
    FROM eff
    """,
)
def x_revenue_bridge(spark: SparkSession, sf: str) -> DataFrame:
    """REVENUE BRIDGE / PRICE-VOLUME DECOMPOSITION (the FP&A waterfall:
    'how much of the YoY revenue change came from selling MORE orders vs
    BIGGER orders?'): per segment, ΔR splits into a Laspeyres volume
    effect (order-count change at last year's average ticket) and a
    price/mix effect (this year's volume times the average-ticket
    change), plus the explicit truncation residual so the bridge
    provably reconciles.  Exact integer cents with micro-unit average
    tickets (truncating DIV both engines).  Scale shape: one aggregate
    keyed (segment, year), then a ≤segments-row pivot and pure
    arithmetic."""
    o = load_table(spark, sf, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    yr = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"), F.year("o_orderdate").alias("y"))
        .agg(
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            )
            .cast("long")
            .alias("r"),
            F.count(F.lit(1)).alias("q"),
        )
    )
    w = yr.groupBy("seg").agg(
        F.max(F.when(F.col("y") == 1996, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("y") == 1996, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("y") == 1997, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("y") == 1997, F.col("q"))).alias("q2"),
    )
    eff = w.filter((F.col("q1") > 0) & (F.col("q2") > 0)).select(
        "seg",
        "r1",
        "q1",
        "r2",
        "q2",
        F.expr("r1 * 1000000 DIV q1").alias("avg1_micro"),
        F.expr("r2 * 1000000 DIV q2").alias("avg2_micro"),
    )
    return eff.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("r1").alias("rev1_cents"),
        F.col("r2").alias("rev2_cents"),
        F.col("q1").alias("n_orders1"),
        F.col("q2").alias("n_orders2"),
        (F.col("r2") - F.col("r1")).alias("delta_cents"),
        F.expr("(q2 - q1) * avg1_micro DIV 1000000").alias("volume_effect_cents"),
        F.expr("q2 * (avg2_micro - avg1_micro) DIV 1000000").alias(
            "price_effect_cents"
        ),
        F.expr(
            "(r2 - r1) - (q2 - q1) * avg1_micro DIV 1000000"
            " - q2 * (avg2_micro - avg1_micro) DIV 1000000"
        ).alias("residual_cents"),
    )


@register(
    "x_ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, g
      FROM toks, unnest(list_transform(
        generate_series(1, len(t) - 2),
        i -> array_to_string(t[i:i+2], ' '))) AS u(g)
    ), firsts AS (
      SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_micro
    FROM grams gr JOIN firsts f ON gr.g = f.g
    GROUP BY gr.doc_id
    """,
)
def x_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """N-GRAM NOVELTY SCORING (the data-curation 'how much of this
    document is NEW?' signal — low-novelty docs are near-copies or
    boilerplate, the soft sibling of hard dedup): each document's
    distinct word trigrams, the corpus-wide first-seeing document per
    trigram (min doc_id — deterministic, order-free), and novelty = the
    fraction of a doc's trigrams it introduced.  Exact integers.  Scale
    shape: one explode + distinct, one trigram-keyed min aggregate, one
    join back on the trigram key, one per-doc count — all
    map-side-combinable hash operations; no windows, no driver state."""
    d = load_table(spark, sf, "documents")
    grams = (
        spread(d)
        .select("doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
        .filter(F.expr("size(t) >= 3"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat_ws(' ', slice(t, i + 1, 3)))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_novel",
            F.expr("n_novel * 1000000 DIV n_ngrams").alias("novelty_micro"),
        )
    )


@register(
    "x_source_similarity",
    """
    WITH big AS (
      SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT source, g
        FROM (
          SELECT source,
                 regexp_split_to_array(trim(lower(text)), '\\s+') AS t
          FROM documents
        ), unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> array_to_string(t[i:i+1], ' '))) AS u(g)
      ) GROUP BY source, g
    ), norms AS (
      SELECT source, CAST(SUM(c * c) AS BIGINT) AS ssq FROM big GROUP BY source
    ), dots AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM big a JOIN big b ON a.g = b.g AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT d.source_a, d.source_b, d.n_shared,
           CAST(FLOOR(CAST(d.dot AS DOUBLE) * 1000000.0
                      / (sqrt(CAST(na.ssq AS DOUBLE))
                         * sqrt(CAST(nb.ssq AS DOUBLE)))) AS BIGINT)
             AS cosine_micro
    FROM dots d
    JOIN norms na ON d.source_a = na.source
    JOIN norms nb ON d.source_b = nb.source
    """,
)
def x_source_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-SLICE SIMILARITY MATRIX (the diversity audit before mixing
    training sources: two sources with cosine ≈ 1 over their bigram
    distributions are redundant — `x_dataset_mix` decides proportions,
    this measures OVERLAP): per-source bigram count vectors, pairwise
    cosine via exact BIGINT dot products and sum-of-squares, one
    fixed-chain sqrt·sqrt division floored to micro.  Scale shape: the
    bigram profile is one explode + one (source, gram) aggregate; the
    pair dot-product joins ON THE GRAM KEY (never a cross join of
    documents), and norms are a ≤sources-row broadcast."""
    d = load_table(spark, sf, "documents")
    big = (
        spread(d)
        .select("source", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
        .filter(F.expr("size(t) >= 2"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat_ws(' ', slice(t, i + 1, 2)))"
                )
            ).alias("g"),
        )
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    norms = big.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).alias("ssq"))
    a = big.select(F.col("source").alias("source_a"), "g", F.col("c").alias("ca"))
    b = big.select(F.col("source").alias("source_b"), "g", F.col("c").alias("cb"))
    dots = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
    )
    na = norms.select(F.col("source").alias("source_a"), F.col("ssq").alias("__na"))
    nb = norms.select(F.col("source").alias("source_b"), F.col("ssq").alias("__nb"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.expr(
                "CAST(FLOOR(CAST(dot AS DOUBLE) * 1000000.0"
                " / (sqrt(CAST(__na AS DOUBLE)) * sqrt(CAST(__nb AS DOUBLE))))"
                " AS BIGINT)"
            ).alias("cosine_micro"),
        )
    )


@register(
    "x_did_estimate",
    """
    WITH cells AS (
      SELECT c_mktsegment = 'BUILDING' AS treated,
             year(o_orderdate) = 1997 AS post,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), m AS (
      SELECT MAX(CASE WHEN treated AND NOT post THEN r * 1000 // n END) AS t1,
             MAX(CASE WHEN treated AND post THEN r * 1000 // n END) AS t2,
             MAX(CASE WHEN NOT treated AND NOT post THEN r * 1000 // n END)
               AS c1,
             MAX(CASE WHEN NOT treated AND post THEN r * 1000 // n END) AS c2,
             CAST(SUM(n) AS BIGINT) AS n_obs
      FROM cells
    )
    SELECT t1 AS treated_pre_millicents, t2 AS treated_post_millicents,
           c1 AS control_pre_millicents, c2 AS control_post_millicents,
           (t2 - t1) - (c2 - c1) AS did_millicents, n_obs
    FROM m
    """,
)
def x_did_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES (the workhorse causal estimator for
    'did the thing we changed for group T actually move the metric?'):
    treated = BUILDING-segment customers, pre/post = 1996/1997, and the
    DiD estimate subtracts the control group's trend from the treated
    group's — the parallel-trends counterfactual a naive before/after
    misses.  Four cell means in exact milli-cents (truncating DIV), one
    arithmetic row out.  Scale shape: ONE aggregate over the fact join
    keyed by the 2×2 cell, then constant-size algebra — the same shape
    as `x_ab_test` but across time."""
    o = load_table(spark, sf, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            (F.col("c_mktsegment") == "BUILDING").alias("treated"),
            (F.year("o_orderdate") == 1997).alias("post"),
        )
        .agg(
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            )
            .cast("long")
            .alias("r"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    m = cells.agg(
        F.max(F.when(F.col("treated") & ~F.col("post"), F.expr("r * 1000 DIV n"))).alias("t1"),
        F.max(F.when(F.col("treated") & F.col("post"), F.expr("r * 1000 DIV n"))).alias("t2"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), F.expr("r * 1000 DIV n"))).alias("c1"),
        F.max(F.when(~F.col("treated") & F.col("post"), F.expr("r * 1000 DIV n"))).alias("c2"),
        F.sum("n").cast("long").alias("n_obs"),
    )
    return m.select(
        F.col("t1").alias("treated_pre_millicents"),
        F.col("t2").alias("treated_post_millicents"),
        F.col("c1").alias("control_pre_millicents"),
        F.col("c2").alias("control_post_millicents"),
        ((F.col("t2") - F.col("t1")) - (F.col("c2") - F.col("c1"))).alias(
            "did_millicents"
        ),
        "n_obs",
    )


@register(
    "x_fifo_allocation",
    """
    WITH li AS (
      SELECT l_partkey % 50 AS bucket,
             strftime(l_shipdate, '%Y-%m') AS mon,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
                  AS BIGINT) AS supplied,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(CAST(l_quantity AS DECIMAL(18,2))
                                     AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS returned
      FROM lineitem GROUP BY 1, 2
    ), sup AS (
      SELECT bucket, mon AS supply_mon, supplied,
             CAST(SUM(supplied) OVER (PARTITION BY bucket ORDER BY mon
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_hi
      FROM li WHERE supplied > 0
    ), ret AS (
      SELECT bucket, mon AS return_mon, returned,
             CAST(SUM(returned) OVER (PARTITION BY bucket ORDER BY mon
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r_hi
      FROM li WHERE returned > 0
    )
    SELECT s.bucket, s.supply_mon, r.return_mon,
           LEAST(s.s_hi, r.r_hi)
             - GREATEST(s.s_hi - s.supplied, r.r_hi - r.returned)
             AS qty_allocated
    FROM sup s JOIN ret r ON s.bucket = r.bucket
    WHERE LEAST(s.s_hi, r.r_hi)
          > GREATEST(s.s_hi - s.supplied, r.r_hi - r.returned)
    """,
)
def x_fifo_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """FIFO LOT ALLOCATION (inventory costing / tax-lot matching: which
    supply month does each returned unit consume, first-in-first-out?):
    the classic sequential queue match becomes FULLY PARALLEL via the
    cumulative-interval identity — supply month i owns the cumulative
    range (S_{i-1}, S_i], return month j consumes (R_{j-1}, R_j], and the
    FIFO allocation is exactly the overlap max(0, min(S_i,R_j) −
    max(S_{i-1},R_{j-1})) — no loop, no state, bit-exact integers.
    Scale shape: reduce to (bucket, month) first, two running-sum windows
    share the bucket partitioning, and the allocation join stays WITHIN
    the bucket key with the overlap predicate pruning non-touching
    month pairs."""
    from pyspark.sql import Window

    li = (
        load_table(spark, sf, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 50).alias("bucket"),
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"),
        )
        .agg(
            F.sum(F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"))
            .cast("long")
            .alias("supplied"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("returned"),
        )
        .cache()
    )
    wb = Window.partitionBy("bucket").orderBy("mon").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sup = (
        li.filter(F.col("supplied") > 0)
        .withColumn("s_hi", F.sum("supplied").over(wb).cast("long"))
        .select("bucket", F.col("mon").alias("supply_mon"), "supplied", "s_hi")
    )
    ret = (
        li.filter(F.col("returned") > 0)
        .withColumn("r_hi", F.sum("returned").over(wb).cast("long"))
        .select("bucket", F.col("mon").alias("return_mon"), "returned", "r_hi")
    )
    j = sup.join(ret, "bucket")
    alloc = F.least(F.col("s_hi"), F.col("r_hi")) - F.greatest(
        F.col("s_hi") - F.col("supplied"), F.col("r_hi") - F.col("returned")
    )
    return (
        j.filter(alloc > 0)
        .select(
            "bucket",
            "supply_mon",
            "return_mon",
            alloc.alias("qty_allocated"),
        )
    )


@register(
    "x_cohort_ltv",
    """
    WITH first_mon AS (
      SELECT o_custkey,
             MIN(strftime(o_orderdate, '%Y-%m')) AS cohort
      FROM orders GROUP BY o_custkey
    ), sized AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_n
      FROM first_mon GROUP BY cohort
    ), rev AS (
      SELECT f.cohort,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
               - (CAST(substr(f.cohort, 1, 4) AS BIGINT) * 12
                  + CAST(substr(f.cohort, 6, 2) AS BIGINT)) AS age_months,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r
      FROM orders o JOIN first_mon f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ), cum AS (
      SELECT cohort, age_months,
             CAST(SUM(r) OVER (PARTITION BY cohort ORDER BY age_months
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      FROM rev
    )
    SELECT c.cohort, c.age_months, s.cohort_n,
           c.cum_cents,
           c.cum_cents // s.cohort_n AS ltv_per_customer_cents
    FROM cum c JOIN sized s ON c.cohort = s.cohort
    WHERE c.age_months <= 12
    """,
)
def x_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """COHORT LTV CURVES (the money-side twin of `x_cohort_retention`:
    cumulative revenue per acquisition cohort by account age — the curve
    that tells you when a cohort pays back CAC): customers cohorted by
    first-order month, revenue bucketed by age-in-months, cumulated per
    cohort, normalized per member in exact cents.  First 13 age points.
    Scale shape: one per-customer min, one (cohort, age) aggregate, one
    running-sum window over the calendar-bounded cohort×age grid, cohort
    sizes broadcast back."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("abs_mon"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    ).cache()
    first_mon = o.groupBy("o_custkey").agg(F.min("mon").alias("cohort"))
    sized = first_mon.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_n"))
    rev = (
        o.join(first_mon, "o_custkey")
        .select(
            "cohort",
            (
                F.col("abs_mon")
                - (
                    F.substring("cohort", 1, 4).cast("long") * 12
                    + F.substring("cohort", 6, 2).cast("long")
                )
            ).alias("age_months"),
            "cents",
        )
        .groupBy("cohort", "age_months")
        .agg(F.sum("cents").cast("long").alias("r"))
    )
    wc = Window.partitionBy("cohort").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.withColumn("cum_cents", F.sum("r").over(wc).cast("long"))
    return (
        cum.filter(F.col("age_months") <= 12)
        .join(F.broadcast(sized), "cohort")
        .select(
            "cohort",
            "age_months",
            "cohort_n",
            "cum_cents",
            F.expr("cum_cents DIV cohort_n").alias("ltv_per_customer_cents"),
        )
    )


@register(
    "x_concurrency_sweep",
    """
    WITH iv AS (
      SELECT o.o_orderpriority AS prio,
             CAST(floor(epoch_ms(o.o_orderdate) / 86400000.0) AS BIGINT)
               AS d0,
             CAST(floor(epoch_ms(MIN(l.l_shipdate)) / 86400000.0) AS BIGINT)
               AS d1
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ), deltas AS (
      SELECT prio, d0 AS day, CAST(COUNT(*) AS BIGINT) AS delta
      FROM iv GROUP BY prio, d0
      UNION ALL
      SELECT prio, d1 + 1 AS day, -CAST(COUNT(*) AS BIGINT) AS delta
      FROM iv GROUP BY prio, d1
    ), merged AS (
      SELECT prio, day, CAST(SUM(delta) AS BIGINT) AS delta
      FROM deltas GROUP BY prio, day
    ), sweep AS (
      SELECT prio, day,
             CAST(SUM(delta) OVER (PARTITION BY prio ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
      FROM merged
    )
    SELECT prio AS o_orderpriority,
           CAST(MAX(open_orders) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) AS BIGINT) AS n_change_days
    FROM sweep GROUP BY prio
    """,
)
def x_concurrency_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """SWEEP-LINE CONCURRENCY (max simultaneous open intervals — 'how
    many orders were in flight at once?', the capacity-planning question
    behind connection pools, WIP limits, and licensing): every order
    opens at order date and closes at first shipment; the sweep encodes
    each interval as a +1/−1 delta pair, collapses deltas per day, and a
    running sum over the day spine IS the concurrency curve — peak per
    priority reported.  The naive day×interval explode (O(n·duration))
    never happens; this is O(n) deltas + one bounded window.  Scale
    shape: interval endpoints reduce per (priority, day) map-side, ONE
    priority-partitioned window over the calendar-bounded change-day
    spine."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.expr(
                "CAST(floor(unix_millis(MIN(o_orderdate)) / 86400000.0) AS BIGINT)"
            ).alias("d0"),
            F.expr(
                "CAST(floor(unix_millis(MIN(l_shipdate)) / 86400000.0) AS BIGINT)"
            ).alias("d1"),
        )
        .select(F.col("o_orderpriority").alias("prio"), "d0", "d1")
        .cache()
    )
    opens = iv.groupBy("prio", F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("delta")
    )
    closes = iv.groupBy("prio", (F.col("d1") + 1).alias("day")).agg(
        (-F.count(F.lit(1))).alias("delta")
    )
    merged = (
        opens.unionAll(closes)
        .groupBy("prio", "day")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    ws = Window.partitionBy("prio").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = merged.withColumn("open_orders", F.sum("delta").over(ws).cast("long"))
    return sweep.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.max("open_orders").alias("peak_concurrency"),
        F.count(F.lit(1)).alias("n_change_days"),
    )


@register(
    "x_window_funnel",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ), nxt AS (
      SELECT user_id, event_type, ms, event_id,
             first_value(CASE WHEN event_type = 'click' THEN ms END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nc_ms,
             first_value(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nc_eid,
             first_value(CASE WHEN event_type = 'purchase' THEN ms END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS np_ms
      FROM e
    ), views AS (
      SELECT v.user_id, v.ms AS v_ms, c.ms AS c_ms, c.np_ms AS p_ms
      FROM (SELECT * FROM nxt WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM nxt WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND v.nc_ms = c.ms AND v.nc_eid = c.event_id
    ), lv AS (
      SELECT user_id,
             CASE WHEN c_ms IS NOT NULL AND p_ms IS NOT NULL
                    AND p_ms - v_ms <= 3600000 THEN 3
                  WHEN c_ms IS NOT NULL AND c_ms - v_ms <= 3600000 THEN 2
                  ELSE 1 END AS lvl
      FROM views
    ), best AS (
      SELECT user_id, CAST(MAX(lvl) AS INTEGER) AS funnel_level FROM lv
      GROUP BY user_id
    )
    SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY funnel_level
    """,
)
def x_window_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """WINDOWED FUNNEL (ClickHouse-`windowFunnel` semantics — the funnel
    with a CONVERSION DEADLINE: view → click → purchase must all land
    within 1 hour of the view, unlike `x_event_funnel`'s unbounded
    chain): every view starts a candidate chain, greedily matched to the
    next click and that click's next purchase; a user's level is the best
    chain achieved.  The greedy 'next event of type X after me' is a
    FORWARD-MIN WINDOW over a (ms, event_id)-keyed composite (one sort
    serves both step lookups), and chain completion is ONE keyed
    self-join from views to their matched click — never a per-pair
    range join.  Scale shape: one user-partitioned window pass + one
    equi-join + two bounded aggregates."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ms"),
            "event_id",
        )
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = e.withColumn(
        "nc_ms",
        F.first(F.when(F.col("event_type") == "click", F.col("ms")), True).over(wf),
    ).withColumn(
        "nc_eid",
        F.first(
            F.when(F.col("event_type") == "click", F.col("event_id")), True
        ).over(wf),
    ).withColumn(
        "np_ms",
        F.first(
            F.when(F.col("event_type") == "purchase", F.col("ms")), True
        ).over(wf),
    ).cache()
    v = nxt.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ms").alias("v_ms"), "nc_ms", "nc_eid"
    )
    c = nxt.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ms").alias("c_ms"),
        F.col("event_id").alias("c_eid"),
        F.col("np_ms").alias("p_ms"),
    )
    views = v.join(
        c,
        (v["user_id"] == c["c_user"])
        & (v["nc_ms"] == c["c_ms"])
        & (v["nc_eid"] == c["c_eid"]),
        "left",
    )
    lv = views.select(
        "user_id",
        F.expr(
            "CASE WHEN c_ms IS NOT NULL AND p_ms IS NOT NULL"
            " AND p_ms - v_ms <= 3600000 THEN 3"
            " WHEN c_ms IS NOT NULL AND c_ms - v_ms <= 3600000 THEN 2"
            " ELSE 1 END"
        ).alias("lvl"),
    )
    best = lv.groupBy("user_id").agg(F.max("lvl").cast("int").alias("funnel_level"))
    return best.groupBy("funnel_level").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "x_pca_power_iter",
    """
    WITH vals AS (
      SELECT p.i AS dim,
             CAST(round(CAST(p.v AS DOUBLE) * 1000.0) AS BIGINT) AS x, vec_id
      FROM (
        SELECT vec_id,
               unnest(list_transform(generate_series(1, 8),
                      i -> struct_pack(i := i - 1, v := embedding[i]))) AS p
        FROM embeddings
      )
    ), moments AS (
      -- sums stay HUGEINT (no BIGINT downcasts): n·sab ~1e18 at the
      -- 100x replica and the matvec multiplies by a ≤1e6 normalizer —
      -- the Spark side carries the same width via DECIMAL(38,0).
      SELECT a.dim AS di, b.dim AS dj,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(a.x) AS sa,
             SUM(b.x) AS sb,
             SUM(a.x * b.x) AS sab
      FROM vals a JOIN vals b ON a.vec_id = b.vec_id
      GROUP BY a.dim, b.dim
    ), s AS (
      SELECT di, dj, n * sab - sa * sb AS cov_scaled FROM moments
    ), v0 AS (
      SELECT unnest(generate_series(0, 7)) AS dim,
             CAST(1000000 AS BIGINT) AS v
    ), w1 AS (
      SELECT s.di AS dim, SUM(s.cov_scaled * v0.v) AS w
      FROM s JOIN v0 ON s.dj = v0.dim GROUP BY s.di
    ), m1 AS (SELECT MAX(ABS(w)) AS mw FROM w1
    ), v1 AS (
      SELECT dim, CAST(w // GREATEST(mw // 1000000, 1) AS BIGINT) AS v
      FROM w1 CROSS JOIN m1
    ), w2 AS (
      SELECT s.di AS dim, SUM(s.cov_scaled * v1.v) AS w
      FROM s JOIN v1 ON s.dj = v1.dim GROUP BY s.di
    ), m2 AS (SELECT MAX(ABS(w)) AS mw FROM w2)
    SELECT dim, CAST(w // GREATEST(mw // 1000000, 1) AS BIGINT) AS eigvec_micro
    FROM w2 CROSS JOIN m2
    """,
)
def x_pca_power_iter(spark: SparkSession, sf: str) -> DataFrame:
    """PCA TOP EIGENVECTOR by power iteration (in-engine linear algebra:
    the direction of maximum variance of the embedding cloud — the first
    step of whitening, spectral diagnostics, and PCA-based outlier
    scores): the exact 8×8 scaled covariance S = n·Σxy − Σx·Σy from
    milli-quantized coordinates (the `x_covariance_matrix` moments, full
    matrix), then two matvec-and-normalize rounds starting from the
    all-ones vector.  EVERY step is integer: matvec products are BIGINT,
    and max-|w| normalization divides by (max DIV 1e6) — the same
    1-row-broadcast normalizer HITS uses, so the oracle unrolls
    bit-identically.  Scale shape: moments are one partial-agg pass over
    the exploded dims (64 pairs out); each round is an (8×8)⋈(8) keyed
    join — constant beyond the moment scan."""
    emb = load_table(spark, sf, "embeddings")
    vals = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                "transform(sequence(1, 8),"
                " i -> named_struct('dim', i - 1,"
                " 'x', CAST(round(CAST(embedding[i - 1] AS DOUBLE) * 1000.0)"
                " AS BIGINT)))"
            )
        ).alias("p"),
    ).select("vec_id", F.col("p.dim").alias("dim"), F.col("p.x").alias("x"))
    a = vals.select("vec_id", F.col("dim").alias("di"), F.col("x").alias("xa"))
    b = vals.select("vec_id", F.col("dim").alias("dj"), F.col("x").alias("xb"))
    s = (
        a.join(b, "vec_id")
        .groupBy("di", "dj")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xa").alias("sa"),
            F.sum("xb").alias("sb"),
            F.sum(F.col("xa") * F.col("xb")).alias("sab"),
        )
        .select(
            "di",
            "dj",
            # DECIMAL bridge: n·sab ~1e18 at the 100x embeddings replica
            # and the matvec below multiplies by a ≤1e6 normalizer —
            # decimal all the way to the DIV (IntegralDivide accepts
            # decimal, returns long), mirroring the oracle's HUGEINT.
            (
                F.col("n").cast("decimal(38,0)") * F.col("sab")
                - F.col("sa").cast("decimal(38,0)") * F.col("sb")
            ).alias("cov_scaled"),
        )
        .cache()
    )
    v = spark.range(8).select(
        F.col("id").cast("long").alias("dim"), F.lit(1000000).cast("long").alias("v")
    )
    for _ in range(2):
        w = (
            s.join(F.broadcast(v.withColumnRenamed("dim", "dj")), "dj")
            .groupBy(F.col("di").alias("dim"))
            .agg(F.sum(F.col("cov_scaled") * F.col("v")).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("mw"))
        v = w.crossJoin(F.broadcast(m)).select(
            "dim", F.expr("w DIV greatest(mw DIV 1000000, 1)").alias("v")
        )
    return v.select("dim", F.col("v").alias("eigvec_micro"))


@register(
    "x_conformal_interval",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) - 19723 AS x,
             CAST(ROUND(value * 100.0) AS BIGINT) AS y
      FROM events
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY event_type
    ), coef AS (
      SELECT event_type, n,
             (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS beta_milli,
             (sy * 1000 - ((n * sxy - sx * sy) * 1000
                           // (n * sxx - sx * sx)) * sx) // n AS alpha_milli
      FROM sums
    ), resid AS (
      SELECT p.event_type, c.n, c.beta_milli, c.alpha_milli,
             ABS(p.y * 1000 - (c.alpha_milli + c.beta_milli * p.x)) AS r,
             row_number() OVER (
               PARTITION BY p.event_type
               ORDER BY ABS(p.y * 1000 - (c.alpha_milli + c.beta_milli * p.x))
             ) AS rk
      FROM pts p JOIN coef c ON p.event_type = c.event_type
    )
    SELECT event_type, n, beta_milli, alpha_milli,
           CAST(MAX(CASE WHEN rk = (9 * (n + 1) + 9) // 10 THEN r END)
                AS BIGINT) AS q90_residual_milli
    FROM resid GROUP BY event_type, n, beta_milli, alpha_milli
    """,
)
def x_conformal_interval(spark: SparkSession, sf: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVAL (the distribution-free
    uncertainty wrapper modern ML serving uses: 'the true value falls
    within ŷ ± q with 90% coverage, no normality assumed'): per event
    type, an exact-integer OLS fit (`x_trend_slope`'s power sums, plus
    the intercept), per-row absolute residuals in milli-cents, and the
    conformal quantile = the ⌈0.9(n+1)⌉-th smallest residual — an ORDER
    STATISTIC, deterministic under ties because ranking by the value
    itself makes the k-th VALUE well-defined.  Scale shape: one
    power-sum aggregate, coefficient broadcast back, one per-group
    ranking window over residuals."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    pts = e.select(
        "event_type",
        (
            F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long")
            - 19723
        ).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    coef = sums.select(
        "event_type",
        "n",
        F.expr("((n * sxy - sx * sy) * 1000) DIV (n * sxx - sx * sx)").alias(
            "beta_milli"
        ),
        F.expr(
            "(sy * 1000 - (((n * sxy - sx * sy) * 1000)"
            " DIV (n * sxx - sx * sx)) * sx) DIV n"
        ).alias("alpha_milli"),
    )
    r = F.abs(
        F.col("y") * 1000 - (F.col("alpha_milli") + F.col("beta_milli") * F.col("x"))
    )
    wr = Window.partitionBy("event_type").orderBy(r.asc())
    resid = (
        pts.join(F.broadcast(coef), "event_type")
        .withColumn("r", r)
        .withColumn("rk", F.row_number().over(wr))
    )
    return resid.groupBy("event_type", "n", "beta_milli", "alpha_milli").agg(
        F.max(
            F.when(F.col("rk") == F.expr("(9 * (n + 1) + 9) DIV 10"), F.col("r"))
        )
        .cast("long")
        .alias("q90_residual_milli")
    )


@register(
    "x_changepoint",
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
    ), pre AS (
      SELECT nat, day, x,
             CAST(SUM(x) OVER w AS BIGINT) AS p,
             CAST(COUNT(*) OVER w AS BIGINT) AS k,
             CAST(SUM(x) OVER (PARTITION BY nat) AS BIGINT) AS tp,
             CAST(COUNT(*) OVER (PARTITION BY nat) AS BIGINT) AS n
      FROM daily
      WINDOW w AS (PARTITION BY nat ORDER BY day ROWS UNBOUNDED PRECEDING)
    ), scored AS (
      SELECT nat, day, k, n,
             CAST(FLOOR((CAST(p AS DOUBLE) * CAST(p AS DOUBLE)
                         / CAST(k AS DOUBLE)
                         + CAST(tp - p AS DOUBLE) * CAST(tp - p AS DOUBLE)
                           / CAST(n - k AS DOUBLE)) / 1000000.0) AS BIGINT)
               AS between_ss_micro
      FROM pre WHERE k < n
    ), ranked AS (
      SELECT nat, day, k, n, between_ss_micro,
             row_number() OVER (PARTITION BY nat
                                ORDER BY between_ss_micro DESC, day) AS rn
      FROM scored
    )
    SELECT nat AS n_name, day AS split_day,
           k AS n_left, n - k AS n_right, between_ss_micro
    FROM ranked WHERE rn = 1
    """,
)
def x_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """CHANGE-POINT DETECTION by binary segmentation (step 1 of the
    standard offline changepoint algorithm: the single split maximizing
    between-segment sum-of-squares — the mean-shift locator behind
    regression discontinuity and incident-start estimation; `x_cusum_drift`
    monitors online, this LOCATES offline): for every candidate split t
    of each nation's daily series, B(t) = P_t²/k + (P−P_t)²/(n−k) from
    prefix sums — every candidate scored in ONE window pass, no
    per-split rescan.  Inputs to the two divides are EXACT BIGINTs, the
    double chain is written identically in both engines (deterministic
    IEEE), floored to micro, argmax by (score, day) struct ranking.
    Scale shape: orders reduce to the daily series; one
    nation-partitioned window sort serves prefix sums and ranking."""
    from pyspark.sql import Window

    daily = _nation_daily_cents(spark, sf)
    wo = Window.partitionBy("nat").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy("nat")
    pre = (
        daily.withColumn("p", F.sum("x").over(wo).cast("long"))
        .withColumn("k", F.count(F.lit(1)).over(wo).cast("long"))
        .withColumn("tp", F.sum("x").over(wp).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(wp).cast("long"))
        .filter(F.col("k") < F.col("n"))
    )
    scored = pre.select(
        "nat",
        "day",
        "k",
        "n",
        F.expr(
            "CAST(FLOOR((CAST(p AS DOUBLE) * CAST(p AS DOUBLE) / CAST(k AS DOUBLE)"
            " + CAST(tp - p AS DOUBLE) * CAST(tp - p AS DOUBLE)"
            "   / CAST(n - k AS DOUBLE)) / 1000000.0) AS BIGINT)"
        ).alias("between_ss_micro"),
    )
    best = scored.groupBy("nat").agg(
        F.min(
            F.struct(
                (-F.col("between_ss_micro")).alias("neg"),
                F.col("day").alias("d"),
                F.col("k").alias("k"),
                F.col("n").alias("n"),
            )
        ).alias("m")
    )
    return best.select(
        F.col("nat").alias("n_name"),
        F.col("m.d").alias("split_day"),
        F.col("m.k").alias("n_left"),
        (F.col("m.n") - F.col("m.k")).alias("n_right"),
        (-F.col("m.neg")).alias("between_ss_micro"),
    )


@register(
    "x_audio_vad_segments",
    """
    WITH t AS (
      SELECT doc_id,
             unnest(generate_series(0, 256 + (doc_id % 7) * 64 - 1)) AS t
      FROM documents WHERE doc_id < 300
    ), s AS (
      SELECT doc_id, t,
             CASE WHEN (t // 64 + doc_id) % 3 = 0 THEN 0
                  ELSE (doc_id*31 + t*17) % 4001 - 2000 END AS v
      FROM t
    ), w AS (
      SELECT doc_id, t // 64 AS window_idx,
             CAST(SUM(v*v) AS BIGINT) AS energy
      FROM s GROUP BY doc_id, t // 64
    ), voiced AS (
      SELECT doc_id, window_idx, energy,
             window_idx - row_number() OVER (PARTITION BY doc_id
                                             ORDER BY window_idx) AS island
      FROM w WHERE energy > 1000000
    )
    SELECT doc_id AS asset_id,
           CAST(MIN(window_idx) AS INTEGER) AS seg_start,
           CAST(MAX(window_idx) AS INTEGER) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS seg_energy
    FROM voiced GROUP BY doc_id, island
    """,
)
def x_audio_vad_segments(spark: SparkSession, sf: str) -> DataFrame:
    """VOICE-ACTIVITY SEGMENTATION over real WAV audio (the
    silence-stripping pass of every speech-training pipeline — find the
    CONTIGUOUS speech runs, not just per-window features): deterministic
    PCM with every (window+id)%3==0 window muted is encoded as genuine
    RIFF/WAV, decoded back through `extract_audio_features`, windows
    above an energy threshold are voiced, and consecutive voiced windows
    merge into segments via the gaps-and-islands trick (window_idx −
    row_number).  The oracle recomputes energy from the sample formula —
    a pass certifies PCM round-trip AND the temporal merge.  Scale
    shape: decode fans out inside `mapInPandas`; the island window
    partitions per asset (state bounded by windows-per-asset)."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from pyspark.sql import Window
    from kafka_streaming_spark.functions.multimodal import (
        encode_wav,
        extract_audio_features,
    )
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id"
    )
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 256 + (d % 7) * 64
                t = np.arange(n, dtype=np.int64)
                s = (d * 31 + t * 17) % 4001 - 2000
                s = np.where((t // 64 + d) % 3 == 0, 0, s)
                payloads.append(encode_wav(s.astype(np.int16), sample_rate=8000))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    feats = extract_audio_features(
        ids.mapInPandas(gen, gen_schema), window_bytes=128
    )
    voiced = feats.filter(F.col("energy") > 1000000)
    wi = Window.partitionBy("asset_id").orderBy("window_idx")
    islands = voiced.withColumn(
        "island", F.col("window_idx") - F.row_number().over(wi)
    )
    return islands.groupBy("asset_id", "island").agg(
        F.min("window_idx").cast("int").alias("seg_start"),
        F.max("window_idx").cast("int").alias("seg_end"),
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("energy").cast("long").alias("seg_energy"),
    ).drop("island")


@register(
    "x_dict_encoding_advisor",
    """
    WITH stats AS (
      SELECT 'o_orderstatus' AS col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv,
             CAST(SUM(len(o_orderstatus)) AS BIGINT) AS raw_bytes
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
             CAST(SUM(len(o_orderpriority)) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'c_mktsegment', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
             CAST(SUM(len(c_mktsegment)) AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 'p_type', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT p_type) AS BIGINT),
             CAST(SUM(len(p_type)) AS BIGINT)
      FROM part
    )
    SELECT col, n, ndv, raw_bytes,
           ndv * (raw_bytes // n) + n * 2 AS dict_bytes_est,
           (raw_bytes - (ndv * (raw_bytes // n) + n * 2)) * 1000000
             // raw_bytes AS saving_micro,
           CAST(CASE WHEN ndv * 20 < n THEN 1 ELSE 0 END AS INTEGER)
             AS recommend_dict
    FROM stats
    """,
)
def x_dict_encoding_advisor(spark: SparkSession, sf: str) -> DataFrame:
    """DICTIONARY-ENCODING ADVISOR (the storage-layout decision parquet
    writers make implicitly, surfaced as a query: which string columns
    repay dictionary encoding?): per candidate column, row count, NDV,
    raw byte volume, the estimated dictionary layout cost (ndv ×
    avg_len + 2-byte codes), projected saving in micro-units, and a
    recommend flag at the 20× repetition threshold.  Exact integers.
    Scale shape: one count-distinct aggregate per column (two-phase,
    map-side partials) — the profile-then-decide loop every lakehouse
    table-maintenance service runs."""
    def stats_for(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(col).alias("ndv"),
            F.sum(F.length(col)).cast("long").alias("raw_bytes"),
        ).select(F.lit(col).alias("col"), "n", "ndv", "raw_bytes")

    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    p = load_table(spark, sf, "part")
    stats = (
        stats_for(o, "o_orderstatus")
        .unionAll(stats_for(o, "o_orderpriority"))
        .unionAll(stats_for(c, "c_mktsegment"))
        .unionAll(stats_for(p, "p_type"))
    )
    return stats.select(
        "col",
        "n",
        "ndv",
        "raw_bytes",
        F.expr("ndv * (raw_bytes DIV n) + n * 2").alias("dict_bytes_est"),
        F.expr(
            "(raw_bytes - (ndv * (raw_bytes DIV n) + n * 2)) * 1000000"
            " DIV raw_bytes"
        ).alias("saving_micro"),
        F.expr("CAST(CASE WHEN ndv * 20 < n THEN 1 ELSE 0 END AS INT)").alias(
            "recommend_dict"
        ),
    )


@register(
    "x_order_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
                  AS BIGINT) AS line_cents_q
      FROM lineitem GROUP BY l_orderkey
    ), j AS (
      SELECT o.o_orderstatus,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS header_cents,
             li.line_cents_q
      FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_cents_q IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_headerless,
           CAST(SUM(CASE WHEN line_cents_q IS NOT NULL
                          AND line_cents_q < header_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_below_header,
           CAST(SUM(header_cents) AS BIGINT) AS header_total_cents,
           CAST(SUM(COALESCE(line_cents_q, 0)) AS BIGINT)
             AS line_total_cents_q
    FROM j GROUP BY o_orderstatus
    """,
)
def x_order_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """CROSS-TABLE RECONCILIATION AUDIT (the header-vs-detail consistency
    check every finance pipeline runs nightly: do the lineitem details
    support the order header totals?): per order, the quantity-weighted
    line value vs the header total, rolled up per status — orders with
    NO details and orders whose details fall below the header are counted
    separately, and both grand totals are emitted so the books can be
    diffed exactly.  Pure BIGINT cents.  Scale shape: one detail-side
    aggregate (map-side partials), one LEFT join on the order key, one
    bounded rollup — the detail side pre-reduces so the join never sees
    raw line volume."""
    li = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                    " * CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("line_cents_q")
        )
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "header_cents"
        ),
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("line_cents_q").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_headerless"),
        F.sum(
            F.when(
                F.col("line_cents_q").isNotNull()
                & (F.col("line_cents_q") < F.col("header_cents")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_lines_below_header"),
        F.sum("header_cents").cast("long").alias("header_total_cents"),
        F.sum(F.coalesce("line_cents_q", F.lit(0)))
        .cast("long")
        .alias("line_total_cents_q"),
    )


@register(
    "x_sliced_eval",
    """
    WITH scored AS (
      SELECT lang, source,
             CASE WHEN len(regexp_extract_all(lower(text), '[aeiou]')) * 1000
                       >= GREATEST(n_chars, 1) * 300
                  THEN 'en' ELSE 'other' END AS pred,
             CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS actual
      FROM documents
    ), slices AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN pred = actual THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
      FROM scored GROUP BY lang, source
    )
    SELECT lang, source, n,
           CASE WHEN n >= 20 THEN n_correct * 1000000 // n ELSE NULL END
             AS accuracy_micro,
           CAST(CASE WHEN n < 20 THEN 1 ELSE 0 END AS INTEGER) AS suppressed
    FROM slices
    """,
)
def x_sliced_eval(spark: SparkSession, sf: str) -> DataFrame:
    """SLICED MODEL EVALUATION (the fairness/robustness practice of
    scoring a classifier PER SUBGROUP, not just overall — a 95% global
    accuracy can hide a 40% slice): the vowel-density language classifier
    evaluated on every (lang, source) slice, with small slices (n < 20)
    SUPPRESSED (NULL metric + flag) exactly like a k-anonymity release —
    per-slice metrics on tiny groups are noise AND a privacy leak.
    Integer micro accuracy.  Scale shape: one scan, one slice-keyed
    aggregate; slice cardinality bounds the output."""
    d = load_table(spark, sf, "documents")
    scored = spread(d).select(
        "lang",
        "source",
        F.when(
            F.expr("size(regexp_extract_all(lower(text), '[aeiou]', 0)) * 1000")
            >= F.expr("greatest(n_chars, 1) * 300"),
            "en",
        )
        .otherwise("other")
        .alias("pred"),
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("actual"),
    )
    slices = scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred") == F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    return slices.select(
        "lang",
        "source",
        "n",
        F.when(F.col("n") >= 20, F.expr("n_correct * 1000000 DIV n")).alias(
            "accuracy_micro"
        ),
        F.when(F.col("n") < 20, 1).otherwise(0).cast("int").alias("suppressed"),
    )


@register(
    "x_markov_next_event",
    """
    WITH seq AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), trans AS (
      SELECT event_type AS prev, next_type AS nxt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), best AS (
      SELECT prev, nxt AS predicted_next, c AS n_best, n_total
      FROM (
        SELECT prev, nxt, c,
               row_number() OVER (PARTITION BY prev
                                  ORDER BY c DESC, nxt) AS rn,
               CAST(SUM(c) OVER (PARTITION BY prev) AS BIGINT) AS n_total
        FROM trans
      ) WHERE rn = 1
    )
    SELECT prev AS event_type, predicted_next, n_best, n_total,
           n_best * 1000000 // n_total AS accuracy_micro
    FROM best
    """,
)
def x_markov_next_event(spark: SparkSession, sf: str) -> DataFrame:
    """MARKOV NEXT-EVENT MODEL, fit AND scored in-engine (the baseline
    every sequence model must beat: predict each user's next event as the
    modal transition from the current one): bigram transition counts from
    one lead() pass, the per-state argmax is the fitted model, and its
    training accuracy = the modal share — count-exact, no held-out split
    needed for the majority baseline.  Deterministic (count DESC, type)
    tiebreak.  Scale shape: one user-partitioned window for the lead, one
    transition aggregate (states² bounded output), one bounded window
    over the transition table."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("next_type", F.lead("event_type").over(wu)).filter(
        F.col("next_type").isNotNull()
    )
    trans = seq.groupBy(
        F.col("event_type").alias("prev"), F.col("next_type").alias("nxt")
    ).agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("prev")
    best = (
        trans.withColumn(
            "rn",
            F.row_number().over(wp.orderBy(F.col("c").desc(), F.col("nxt"))),
        )
        .withColumn("n_total", F.sum("c").over(wp).cast("long"))
        .filter(F.col("rn") == 1)
    )
    return best.select(
        F.col("prev").alias("event_type"),
        F.col("nxt").alias("predicted_next"),
        F.col("c").alias("n_best"),
        "n_total",
        F.expr("c * 1000000 DIV n_total").alias("accuracy_micro"),
    )


@register(
    "x_resource_allocation",
    """
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), cdeg AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY c
    ), scores AS (
      SELECT a.u AS u1, b.u AS u2,
             CAST(SUM(1000000 // cd.d) AS BIGINT) AS ra_micro,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors
      FROM edges a
      JOIN cdeg cd ON a.c = cd.c AND cd.d <= 50
      JOIN edges b ON a.c = b.c AND a.u < b.u
      GROUP BY a.u, b.u
    )
    SELECT u1, u2, common_neighbors, ra_micro
    FROM scores ORDER BY ra_micro DESC, u1, u2 LIMIT 25
    """,
)
def x_resource_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """RESOURCE-ALLOCATION LINK INDEX (Zhou-Lü-Zhang's RA — the
    degree-weighted link predictor that beats raw common-neighbor
    counts: a shared RARE customer is strong evidence, a shared hub
    customer is weak): each common neighbor z contributes 1/deg(z),
    summed in exact micro-units — the integer-native cousin of
    Adamic-Adar (whose log weighting the engine's no-transcendental
    policy replaces with RA's reciprocal, the standard alternative in
    the same paper).  Candidate pairs form WITHIN the shared-customer
    key (like `x_link_prediction`, which this extends with weighting),
    and the same ``PAIR_DEGREE_CAP`` (=50) hub bound applies: customers
    above the cap are dropped before pairing, bounding per-key work at
    C(50,2) regardless of data volume — consistent with RA's own logic,
    since a degree-10⁵ hub would contribute 10 micro-units per pair
    while costing 10¹⁰ reducer rows.  Weight attaches pre-pairing;
    bounded top-k."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    # Cached: the distinct edge list feeds THREE consumers (cdeg and
    # both sides of the pairing join) — same multi-consumer rule as
    # x_link_prediction (53.8s -> 35s at the 100x replica).
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("u"), F.col("o_custkey").alias("c"))
        .distinct()
        .cache()
    )
    cdeg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select("c", F.col("u").alias("u1"))
    b = edges.select("c", F.col("u").alias("u2"))
    # attach the neighbor weight BEFORE pairing: the 1e6/deg contribution
    # depends only on the shared customer, so the degree join touches
    # |edges| rows once instead of every candidate pair; cdeg is
    # SF-scaled (customer-bounded) so it carries NO broadcast hint — the
    # planner broadcasts it at test scale and falls back to a shuffle
    # join at 100 TB (broadcast policy, module docstring).  The degree
    # join doubles as the hub cap: keys above PAIR_DEGREE_CAP never
    # reach the pairing self-join.
    aw = (
        a.join(cdeg, "c")
        .filter(F.col("d") <= PAIR_DEGREE_CAP)
        .withColumn("w", F.expr("1000000 DIV d"))
    )
    scores = (
        aw.join(b, "c")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(
            F.sum("w").cast("long").alias("ra_micro"),
            F.count(F.lit(1)).alias("common_neighbors"),
        )
    )
    return (
        scores.select("u1", "u2", "common_neighbors", "ra_micro")
        .orderBy(F.col("ra_micro").desc(), "u1", "u2")
        .limit(25)
    )


@register(
    "t_stream_restart_recovery",
    """
    SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY 1
    """,
)
def t_stream_restart_recovery(spark: SparkSession, sf: str) -> DataFrame:
    """CHECKPOINT RESTART RECOVERY, witnessed by the driver (the
    exactly-once contract under the failure mode that matters: the query
    STOPS, new data lands, the query RESTARTS from its checkpoint): run 1
    drains the first arrival batch availableNow into a parquet sink;
    only THEN does the second batch land in the source; run 2 restarts
    from the SAME checkpoint and must process exactly the new files —
    no replay of batch 1 (which would double counts), no loss (which
    would drop cents).  The oracle is simply the batch aggregate over
    ALL events: the hash matches only if sink = union exactly once.
    Idempotent re-entry: further runs find no new files and append
    nothing.  Scale shape: file-source checkpointing tracks processed
    files in the offset log; the sink appends row-level, the final
    verification aggregate is one day-keyed reduce."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    ev = load_table(spark, sf, "events").select(
        "event_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_restart_{slug}"
    src, sink, ckpt = f"{base}/src", f"{base}/sink", f"{base}/ckpt"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        for i, df in enumerate(
            [
                ev.filter(F.col("event_id") % 3 != 0).select("ts", "cents"),
                ev.filter(F.col("event_id") % 3 == 0).select("ts", "cents"),
            ]
        ):
            df.coalesce(1).write.parquet(f"{build}/p{i}")
            part = glob.glob(f"{build}/p{i}/*.parquet")[0]
            shutil.copy(part, f"{build}/f{i}.parquet")
            shutil.rmtree(f"{build}/p{i}")
        # only batch 0 is visible to run 1; batch 1 is parked one level up
        shutil.move(f"{build}/f0.parquet", f"{build}/src/f0.parquet")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
            shutil.move(f"{build}/f1.parquet", f"{base}/f1_pending.parquet")
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("cents", LongType())]
    )

    def drain() -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # run 1: batch 0 only (or nothing new on re-entry)
    pending = f"{base}/f1_pending.parquet"
    if os.path.exists(pending):  # the "new data lands while stopped" step
        shutil.move(pending, f"{src}/f1.parquet")
    drain()  # run 2: restart from the same checkpoint, pick up batch 1
    out = spark.read.schema(schema).parquet(sink)
    return out.groupBy(
        F.expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "x_weighted_quantiles",
    """
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS w
      FROM lineitem
    ), g AS (
      SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
      FROM v GROUP BY flag, cents
    ), c AS (
      SELECT flag, cents, w,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
      FROM g
    )
    SELECT flag AS l_returnflag, q AS quantile_pct,
           CAST(MIN(cents) AS BIGINT) AS value_cents
    FROM c CROSS JOIN (SELECT unnest([10, 50, 90]) AS q)
    WHERE cw * 100 >= tw * q
    GROUP BY flag, q
    """,
)
def x_weighted_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """WEIGHTED QUANTILE GRID (P10/P50/P90 where each line counts by its
    QUANTITY — the shipped-unit price distribution, not the line-count
    one; extends `x_weighted_median` from one quantile to a grid in the
    SAME single pass): collapse to (group, value) with summed weights,
    one cumulative-weight window, then each requested quantile q selects
    the smallest value whose cumulative weight reaches q% of total —
    exact integer cross-multiplication (cw·100 ≥ tw·q), no
    interpolation ambiguity.  Scale shape: the window runs on the
    value-collapsed table (bounded by distinct prices per group); the
    3-row quantile spine is a broadcast cross join; selection is a
    min-aggregate, not a per-quantile rescan."""
    from pyspark.sql import Window

    v = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)").alias("w"),
    )
    g = v.groupBy("flag", "cents").agg(F.sum("w").cast("long").alias("w"))
    wo = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy("flag")
    c = g.withColumn("cw", F.sum("w").over(wo).cast("long")).withColumn(
        "tw", F.sum("w").over(wp).cast("long")
    )
    qs = spark.range(1).select(
        F.explode(F.expr("array(10, 50, 90)")).alias("q")
    )
    return (
        c.crossJoin(F.broadcast(qs))
        .filter(F.col("cw") * 100 >= F.col("tw") * F.col("q"))
        .groupBy(F.col("flag").alias("l_returnflag"), F.col("q").alias("quantile_pct"))
        .agg(F.min("cents").alias("value_cents"))
    )


@register(
    "x_fd_histogram",
    """
    WITH v AS (
      SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS cents FROM events
    ), g AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY cents
    ), cum AS (
      SELECT cents, c,
             CAST(SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cw,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM g
    ), q AS (
      SELECT MAX(n) AS n,
             MIN(CASE WHEN cw * 4 >= n THEN cents END) AS q1,
             MIN(CASE WHEN cw * 4 >= 3 * n THEN cents END) AS q3
      FROM cum
    ), cbrt AS (
      SELECT q.n, q.q1, q.q3, CAST(MAX(k) AS BIGINT) AS icbrt_n
      FROM q JOIN (SELECT unnest(generate_series(1, 2000)) AS k) s
        ON k * k * k <= q.n
      GROUP BY q.n, q.q1, q.q3
    ), params AS (
      SELECT n, q1, q3,
             GREATEST(2 * (q3 - q1) // icbrt_n, 1) AS bin_width
      FROM cbrt
    )
    SELECT v.cents // p.bin_width AS bin,
           CAST(v.cents // p.bin_width * p.bin_width AS BIGINT)
             AS bin_start_cents,
           CAST(p.bin_width AS BIGINT) AS bin_width,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM v CROSS JOIN params p
    GROUP BY 1, 2, 3
    """,
)
def x_fd_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """FREEDMAN-DIACONIS HISTOGRAM (the statistically-sized histogram —
    bin width 2·IQR/∛n — instead of `x_histogram`'s fixed bins, the rule
    dashboards and profilers use to avoid over/under-smoothing): exact
    integer quartiles from cumulative counts over the distinct-value
    spine, and the CUBE ROOT computed with NO transcendentals — the
    largest k in a 2,000-row spine with k³ ≤ n (exact for n ≤ 8×10⁹;
    widen the spine beyond).  Bin width floors at 1 cent.  Scale shape:
    one value-collapse aggregate, one bounded window over the distinct
    spine, a 1-row parameter broadcast back to the scan, one histogram
    aggregate."""
    from pyspark.sql import Window

    v = load_table(spark, sf, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    g = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = g.withColumn("cw", F.sum("c").over(wo).cast("long")).withColumn(
        "n", F.sum("c").over(wall).cast("long")
    )
    q = cum.agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cw") * 4 >= F.col("n"), F.col("cents"))).alias("q1"),
        F.min(F.when(F.col("cw") * 4 >= 3 * F.col("n"), F.col("cents"))).alias(
            "q3"
        ),
    )
    ks = spark.range(1, 2001).select(F.col("id").alias("k"))
    cbrt = (
        q.join(F.broadcast(ks), F.expr("k * k * k <= n"))
        .groupBy("n", "q1", "q3")
        .agg(F.max("k").alias("icbrt_n"))
    )
    params = cbrt.select(
        "n",
        "q1",
        "q3",
        F.greatest(F.expr("2 * (q3 - q1) DIV icbrt_n"), F.lit(1)).alias(
            "bin_width"
        ),
    )
    return (
        v.crossJoin(F.broadcast(params))
        .groupBy(
            F.expr("cents DIV bin_width").alias("bin"),
            F.expr("CAST(cents DIV bin_width * bin_width AS BIGINT)").alias(
                "bin_start_cents"
            ),
            F.col("bin_width").cast("long").alias("bin_width"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "x_bounce_rate",
    _SESSIONIZE_CTE.format(cmp=">")
    + """
    , per_sess AS (
      SELECT user_id, session_id,
             CAST(floor(epoch_ms(MIN(ts)) / 86400000.0) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_micro
    FROM per_sess GROUP BY day
    """,
)
def x_bounce_rate(spark: SparkSession, sf: str) -> DataFrame:
    """BOUNCE RATE by day (the web-analytics KPI: single-event sessions
    over total sessions, attributed to the session's START day): reuses
    the engine's gap-based sessionizer (`ops/sessionize.py`, 4-hour
    inactivity gap), rolls sessions up to their first-event day, and
    emits the exact micro-unit bounce share.  Scale shape: one
    user-partitioned sessionize window, one (user, session) reduce, one
    calendar-bounded day rollup."""
    e = load_table(spark, sf, "events").select("user_id", "ts")
    stats = session_stats(e, ["user_id"], "ts", gap=_SESSION_GAP)
    per_sess = stats.select(
        F.expr(
            "CAST(floor(session_start_ms / 86400000.0) AS BIGINT)"
        ).alias("day"),
        "n_events",
    )
    return per_sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
    ).select(
        "day",
        "n_sessions",
        "n_bounces",
        F.expr("n_bounces * 1000000 DIV n_sessions").alias("bounce_micro"),
    )


@register(
    "x_kfold_cv_ols",
    """
    WITH pts AS (
      SELECT CAST(concat('0x', substr(md5('cv' || CAST(event_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) % 5 AS fold,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) - 19723 AS x,
             CAST(ROUND(value * 100.0) AS BIGINT) AS y
      FROM events
    ), fsums AS (
      SELECT fold,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY fold
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
             CAST(SUM(sy) AS BIGINT) AS tsy,
             CAST(SUM(sxy) AS BIGINT) AS tsxy,
             CAST(SUM(sxx) AS BIGINT) AS tsxx
      FROM fsums
    ), coef AS (
      SELECT f.fold, t.tn - f.n AS n_train, f.n AS n_test,
             CAST((CAST(t.tn - f.n AS HUGEINT) * (t.tsxy - f.sxy)
              - CAST(t.tsx - f.sx AS HUGEINT) * (t.tsy - f.sy)) * 1000
             // (CAST(t.tn - f.n AS HUGEINT) * (t.tsxx - f.sxx)
                 - CAST(t.tsx - f.sx AS HUGEINT) * (t.tsx - f.sx))
               AS BIGINT) AS beta_milli
      FROM fsums f CROSS JOIN tot t
    ), coef2 AS (
      SELECT c.fold, c.n_train, c.n_test, c.beta_milli,
             ((t.tsy - f.sy) * 1000 - c.beta_milli * (t.tsx - f.sx))
               // (t.tn - f.n) AS alpha_milli
      FROM coef c
      JOIN fsums f ON c.fold = f.fold
      CROSS JOIN tot t
    )
    SELECT c.fold, c.n_train, c.n_test, c.beta_milli, c.alpha_milli,
           CAST(SUM(ABS(p.y * 1000 - (c.alpha_milli + c.beta_milli * p.x)))
                // c.n_test AS BIGINT) AS mae_milli
    FROM pts p JOIN coef2 c ON p.fold = c.fold
    GROUP BY c.fold, c.n_train, c.n_test, c.beta_milli, c.alpha_milli
    """,
)
def x_kfold_cv_ols(spark: SparkSession, sf: str) -> DataFrame:
    """K-FOLD CROSS-VALIDATED REGRESSION, fit and scored in-engine with
    NO per-fold rescan (the distributed CV trick: per-fold power sums
    computed ONCE, then leave-one-fold-out training sums are just totals
    minus the fold's — 5 models from one data pass): deterministic
    md5-hash folds, exact-integer OLS per held-out fold, and test MAE in
    milli-cents from the micro-coefficient residual chain.  Everything
    BIGINT (`x_trend_slope`'s arithmetic, generalized to CV).  Scale
    shape: one power-sum aggregate (5 rows), constant-size coefficient
    algebra, a 5-row coefficient broadcast back to the points for
    scoring — two passes total regardless of k."""
    pts = load_table(spark, sf, "events").select(
        (D.portable_hash60(F.concat(F.lit("cv"), F.col("event_id").cast("string"))) % 5).alias("fold"),
        (
            F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long")
            - 19723
        ).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    fsums = pts.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    tot = fsums.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    coef = (
        fsums.crossJoin(F.broadcast(tot))
        .select(
            "fold",
            (F.col("tn") - F.col("n")).alias("n_train"),
            F.col("n").alias("n_test"),
            # The covariance products reach ~1e20 at 100x event counts —
            # silent BIGINT wrap in non-ANSI Spark (ADVICE r5).  Widen to
            # DECIMAL(38,0) before multiplying (HUGEINT in the oracle);
            # DIV is integral divide on decimals too, truncating toward
            # zero exactly like DuckDB's // — output returns to BIGINT.
            F.expr(
                "CAST((CAST(tn - n AS DECIMAL(38,0)) * (tsxy - sxy)"
                " - CAST(tsx - sx AS DECIMAL(38,0)) * (tsy - sy)) * 1000"
                " DIV (CAST(tn - n AS DECIMAL(38,0)) * (tsxx - sxx)"
                " - CAST(tsx - sx AS DECIMAL(38,0)) * (tsx - sx)) AS BIGINT)"
            ).alias("beta_milli"),
            F.expr("tsy - sy").alias("__rsy"),
            F.expr("tsx - sx").alias("__rsx"),
        )
        .select(
            "fold",
            "n_train",
            "n_test",
            "beta_milli",
            F.expr(
                "(__rsy * 1000 - beta_milli * __rsx) DIV n_train"
            ).alias("alpha_milli"),
        )
    )
    scored = pts.join(F.broadcast(coef), "fold")
    return scored.groupBy(
        "fold", "n_train", "n_test", "beta_milli", "alpha_milli"
    ).agg(
        F.expr(
            "CAST(SUM(ABS(y * 1000 - (alpha_milli + beta_milli * x)))"
            " DIV n_test AS BIGINT)"
        ).alias("mae_milli")
    )


@register(
    "x_fano_factor",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days, s AS total_events,
           CAST((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) * 1000000
                // (CAST(s AS HUGEINT) * (n - 1)) AS BIGINT) AS fano_micro,
           CAST(CASE WHEN (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) * 1000
                          > CAST(s AS HUGEINT) * (n - 1) * 1500
                     THEN 1 ELSE 0 END AS INTEGER) AS overdispersed
    FROM sums WHERE n > 1 AND s > 0
    """,
)
def x_fano_factor(spark: SparkSession, sf: str) -> DataFrame:
    """FANO FACTOR / index of dispersion (the burstiness diagnostic:
    variance-to-mean of daily event counts — ≈1 for a steady Poisson
    process, ≫1 for bursty/clumped traffic; decides whether rate
    monitors can assume Poisson noise): per type, F = σ²/μ with the
    unbiased variance cross-multiplied into exact integers — fano_micro
    = (n·Σx² − S²)·10⁶ ÷ (S·(n−1)) since μ = S/n cancels — plus an
    over-dispersion flag at 1.5.  Scale shape: raw events reduce to the
    calendar-bounded (type, day) table, then one bounded aggregate —
    two shuffles total."""
    daily = (
        load_table(spark, sf, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)").alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    return (
        sums.filter((F.col("n") > 1) & (F.col("s") > 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("s").alias("total_events"),
            # n·q − s² scales with replication² (s ≈ 2·10⁴ per type at
            # sf0.1 → the ·10⁶ product nears int64 past ~1000×); the
            # DECIMAL(38,0) bridge mirrors the oracle's HUGEINT exactly
            # (numeric-policy overflow audit).
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * q"
                " - CAST(s AS DECIMAL(38,0)) * s) * 1000000"
                " DIV (CAST(s AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)"
            ).alias("fano_micro"),
            F.expr(
                "CAST(CASE WHEN (CAST(n AS DECIMAL(38,0)) * q"
                " - CAST(s AS DECIMAL(38,0)) * s) * 1000"
                " > CAST(s AS DECIMAL(38,0)) * (n - 1) * 1500"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("overdispersed"),
        )
    )


@register(
    "x_interarrival_quantiles",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts))
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
      FROM events
    ), g AS (
      SELECT event_type, gap_ms, CAST(COUNT(*) AS BIGINT) AS c
      FROM gaps WHERE gap_ms IS NOT NULL
      GROUP BY event_type, gap_ms
    ), cum AS (
      SELECT event_type, gap_ms, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY gap_ms
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tw
      FROM g
    )
    SELECT event_type, q AS quantile_pct,
           CAST(MIN(gap_ms) AS BIGINT) AS gap_ms
    FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS q)
    WHERE cw * 100 >= tw * q
    GROUP BY event_type, q
    """,
)
def x_interarrival_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """INTER-ARRIVAL TIME QUANTILES (P50/P90/P99 of the gap between
    consecutive events per type — the latency-distribution view of a
    stream: SLA tails, timer tuning, and the empirical input to
    watermark-delay choices): gaps from one ordered lag() pass, then the
    same exact cross-multiplied quantile selection as
    `x_weighted_quantiles` over the gap-collapsed spine.  Scale shape:
    one type-partitioned window on the stream, then everything runs on
    the ≤|distinct gaps| spine; quantile selection is a min-aggregate
    over the 3-row broadcast grid."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (
                F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(wt)
            ).alias("gap_ms"),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    g = gaps.groupBy("event_type", "gap_ms").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("gap_ms").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy("event_type")
    cum = g.withColumn("cw", F.sum("c").over(wo).cast("long")).withColumn(
        "tw", F.sum("c").over(wp).cast("long")
    )
    qs = spark.range(1).select(F.explode(F.expr("array(50, 90, 99)")).alias("q"))
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cw") * 100 >= F.col("tw") * F.col("q"))
        .groupBy("event_type", F.col("q").alias("quantile_pct"))
        .agg(F.min("gap_ms").cast("long").alias("gap_ms"))
    )


@register(
    "x_peak_detection",
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
    ), nb AS (
      SELECT nat, day, x,
             CAST(MAX(x) OVER (PARTITION BY nat ORDER BY day
                               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS max_before,
             CAST(MAX(x) OVER (PARTITION BY nat ORDER BY day
                               ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
                  AS BIGINT) AS max_after,
             COUNT(*) OVER (PARTITION BY nat ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS n_before,
             COUNT(*) OVER (PARTITION BY nat ORDER BY day
                            ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
               AS n_after
      FROM daily
    )
    SELECT nat AS n_name, day AS peak_day, x AS revenue_cents,
           max_before, max_after
    FROM nb
    WHERE n_before = 3 AND n_after = 3
      AND x > max_before AND x > max_after
    """,
)
def x_peak_detection(spark: SparkSession, sf: str) -> DataFrame:
    """LOCAL-PEAK DETECTION (strict local maxima over a ±3-row
    neighborhood — the spike finder behind alert screenshots and
    promo-impact analysis, stricter than `x_traffic_anomaly`'s
    baseline-ratio rule because a peak must beat its NEIGHBORS, not a
    mean): one window pass computes the neighborhood maxima on both
    sides (full neighborhoods only), and a row survives only if it
    strictly exceeds both.  Exact integers.  Scale shape: orders reduce
    to the calendar-bounded daily series; all four frames share one
    (nation)-partitioned sort."""
    from pyspark.sql import Window

    daily = _nation_daily_cents(spark, sf)
    wo = Window.partitionBy("nat").orderBy("day")
    nb = (
        daily.withColumn("max_before", F.max("x").over(wo.rowsBetween(-3, -1)).cast("long"))
        .withColumn("max_after", F.max("x").over(wo.rowsBetween(1, 3)).cast("long"))
        .withColumn("n_before", F.count(F.lit(1)).over(wo.rowsBetween(-3, -1)))
        .withColumn("n_after", F.count(F.lit(1)).over(wo.rowsBetween(1, 3)))
    )
    return (
        nb.filter(
            (F.col("n_before") == 3)
            & (F.col("n_after") == 3)
            & (F.col("x") > F.col("max_before"))
            & (F.col("x") > F.col("max_after"))
        )
        .select(
            F.col("nat").alias("n_name"),
            F.col("day").alias("peak_day"),
            F.col("x").alias("revenue_cents"),
            "max_before",
            "max_after",
        )
    )


@register(
    "x_join_fanout_audit",
    """
    WITH lf AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS fan
      FROM lineitem GROUP BY l_orderkey
    ), buckets AS (
      SELECT CASE WHEN fan <= 2 THEN '1-2'
                  WHEN fan <= 4 THEN '3-4'
                  WHEN fan <= 8 THEN '5-8'
                  ELSE '9+' END AS fanout_bucket,
             fan
      FROM lf
    )
    SELECT fanout_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(fan) AS BIGINT) AS join_output_rows,
           CAST(MAX(fan) AS BIGINT) AS max_fanout
    FROM buckets GROUP BY fanout_bucket
    """,
)
def x_join_fanout_audit(spark: SparkSession, sf: str) -> DataFrame:
    """JOIN FAN-OUT AUDIT (the pre-flight explosion check before a big
    join: how many rows does each key contribute, and which keys would
    blow up the output?): per join key, the match count distribution in
    log-ish buckets with the exact output-row total each bucket would
    generate against a 1-row-per-key side — `x_join_size_estimate`
    predicts the total by sampling, this PROFILES the shape exactly, the
    pair that tells you whether AQE skew handling or salting
    (`j_skew_salted_join`) is needed.  Scale shape: one key-grouped
    count (map-side combinable), one bounded bucket rollup."""
    lf = (
        load_table(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("fan"))
    )
    buckets = lf.select(
        F.when(F.col("fan") <= 2, "1-2")
        .when(F.col("fan") <= 4, "3-4")
        .when(F.col("fan") <= 8, "5-8")
        .otherwise("9+")
        .alias("fanout_bucket"),
        "fan",
    )
    return buckets.groupBy("fanout_bucket").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("fan").cast("long").alias("join_output_rows"),
        F.max("fan").alias("max_fanout"),
    )


@register(
    "x_als_item_step",
    """
    WITH r AS (
      SELECT o_custkey AS u, l_partkey % 100 AS item,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
                  AS BIGINT) AS rating
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), p AS (
      SELECT u, CAST(1000 AS BIGINT) AS p0,
             CAST(concat('0x', substr(md5('als' || CAST(u AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2001 - 1000 AS p1
      FROM (SELECT DISTINCT u FROM r)
    ), sums AS (
      SELECT r.item,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p.p0 * p.p0) AS BIGINT) AS a00,
             CAST(SUM(p.p0 * p.p1) AS BIGINT) AS a01,
             CAST(SUM(p.p1 * p.p1) AS BIGINT) AS a11,
             CAST(SUM(r.rating * p.p0) AS BIGINT) AS b0,
             CAST(SUM(r.rating * p.p1) AS BIGINT) AS b1
      FROM r JOIN p ON r.u = p.u
      GROUP BY r.item
    )
    SELECT item, n,
           CAST(FLOOR((CAST(b0 AS DOUBLE) * CAST(a11 AS DOUBLE)
                       - CAST(b1 AS DOUBLE) * CAST(a01 AS DOUBLE))
                      / (CAST(a00 AS DOUBLE) * CAST(a11 AS DOUBLE)
                         - CAST(a01 AS DOUBLE) * CAST(a01 AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS q0_micro,
           CAST(FLOOR((CAST(b1 AS DOUBLE) * CAST(a00 AS DOUBLE)
                       - CAST(b0 AS DOUBLE) * CAST(a01 AS DOUBLE))
                      / (CAST(a00 AS DOUBLE) * CAST(a11 AS DOUBLE)
                         - CAST(a01 AS DOUBLE) * CAST(a01 AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS q1_micro
    FROM sums WHERE n >= 2
    """,
)
def x_als_item_step(spark: SparkSession, sf: str) -> DataFrame:
    """ONE ALS HALF-STEP, in-engine (the alternating-least-squares
    recommender update: holding user factors fixed, solve each item's
    2-factor vector by least squares — the building block of matrix
    factorization at scale): deterministic hash-initialized user factors
    (p₀=1000, p₁ = portable-hash ∈ [−1000, 1000]), per-item normal
    equations from FIVE map-side-combinable sufficient sums, and the
    2×2 Cramer solve in the projection — `x_ols_normal_eq`'s machinery
    re-aimed at collaborative filtering.  All sums exact BIGINT; the
    solve is one fixed IEEE chain floored to micro.  Scale shape: one
    (user, item) rating reduce, one user-factor join (factors derive
    from the key — no table lookup), one item-keyed aggregate; a full
    ALS sweep is this same pass alternated, each solving millions of
    independent 2×2 systems with zero driver state."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    r = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("u"),
            (F.col("l_partkey") % 100).alias("item"),
        )
        .agg(
            F.sum(F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"))
            .cast("long")
            .alias("rating")
        )
    )
    withp = r.select(
        "item",
        "rating",
        F.lit(1000).cast("long").alias("p0"),
        (
            D.portable_hash60(F.concat(F.lit("als"), F.col("u").cast("string")))
            % 2001
            - 1000
        ).alias("p1"),
    )
    sums = withp.groupBy("item").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p0") * F.col("p0")).alias("a00"),
        F.sum(F.col("p0") * F.col("p1")).alias("a01"),
        F.sum(F.col("p1") * F.col("p1")).alias("a11"),
        F.sum(F.col("rating") * F.col("p0")).alias("b0"),
        F.sum(F.col("rating") * F.col("p1")).alias("b1"),
    )
    det = (
        "(CAST(a00 AS DOUBLE) * CAST(a11 AS DOUBLE)"
        " - CAST(a01 AS DOUBLE) * CAST(a01 AS DOUBLE))"
    )
    return sums.filter(F.col("n") >= 2).select(
        "item",
        "n",
        F.expr(
            "CAST(FLOOR((CAST(b0 AS DOUBLE) * CAST(a11 AS DOUBLE)"
            " - CAST(b1 AS DOUBLE) * CAST(a01 AS DOUBLE))"
            f" / {det} * 1000000.0) AS BIGINT)"
        ).alias("q0_micro"),
        F.expr(
            "CAST(FLOOR((CAST(b1 AS DOUBLE) * CAST(a00 AS DOUBLE)"
            " - CAST(b0 AS DOUBLE) * CAST(a01 AS DOUBLE))"
            f" / {det} * 1000000.0) AS BIGINT)"
        ).alias("q1_micro"),
    )


@register(
    "x_temporal_join_size",
    """
    WITH ev AS (
      SELECT l_suppkey AS s, o_custkey AS c,
             epoch_ms(o_orderdate) AS t
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_suppkey % 10 = 0
    )
    SELECT a.s AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS pairs_cross_customer
    FROM ev a JOIN ev b ON a.s = b.s AND a.t < b.t AND a.c <> b.c
    GROUP BY a.s
    """,
)
def x_temporal_join_size(spark: SparkSession, sf: str) -> DataFrame:
    """TEMPORAL-JOIN SIZE PREDICTION from counts alone (how many rows
    would the time-respecting self-join `a.t < b.t AND a.c <> b.c`
    produce per key? — the pre-flight for stream-stream and as-of joins
    that `x_join_fanout_audit` does for equi-joins): the exact answer
    comes from PURE COUNTING, never materializing a pair —
    #[t_a<t_b] = C(n,2) − Σ_t C(n_t,2), minus the same identity within
    each customer (inclusion-exclusion over ties).  The ORACLE is the
    brute-force theta join itself, so a pass certifies the combinatorial
    identity against real data, not a mirrored formula.  Scale shape:
    three grouped counts (by key, key×ts, key×cust, key×cust×ts) — all
    map-side-combinable; the quadratic join never runs."""
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_suppkey") % 10 == 0
    ).select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", F.unix_millis("o_orderdate").alias("t")
    )
    ev = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"), "t"
    ).cache()

    def ordered_pairs(df: DataFrame, keys: list[str]) -> DataFrame:
        """#{(a,b): t_a < t_b} within each key group = C(n,2) − Σ_t C(n_t,2)."""
        per_ts = df.groupBy(*keys, "t").agg(F.count(F.lit(1)).alias("nt"))
        # n*(n-1) - Σ nt*(nt-1) is always even, so integer DIV is exact at
        # any magnitude — float /2 would lose exactness past 2^53 (ADVICE r5)
        return per_ts.groupBy(*keys).agg(
            F.expr(
                "(sum(nt) * (sum(nt) - 1) - sum(nt * (nt - 1))) DIV 2"
            )
            .cast("long")
            .alias("pairs")
        )

    total = ordered_pairs(ev, ["s"]).withColumnRenamed("pairs", "all_pairs")
    same_c = (
        ordered_pairs(ev, ["s", "c"])
        .groupBy("s")
        .agg(F.sum("pairs").cast("long").alias("same_c_pairs"))
    )
    return (
        total.join(same_c, "s", "left")
        .select(
            F.col("s").alias("suppkey"),
            (
                F.col("all_pairs") - F.coalesce(F.col("same_c_pairs"), F.lit(0))
            ).alias("pairs_cross_customer"),
        )
        .filter(F.col("pairs_cross_customer") > 0)
    )


@register(
    "x_lag_features",
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
    ), f AS (
      SELECT nat, day, x,
             lag(x, 1) OVER w AS lag_1,
             lag(x, 7) OVER w AS lag_7,
             lag(x, 28) OVER w AS lag_28,
             CAST(SUM(x) OVER (PARTITION BY nat ORDER BY day
                               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) // 7 AS ma_7,
             COUNT(*) OVER (PARTITION BY nat ORDER BY day
                            ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING) AS n28
      FROM daily
      WINDOW w AS (PARTITION BY nat ORDER BY day)
    )
    SELECT nat AS n_name, day, x AS target_cents,
           lag_1, lag_7, lag_28, ma_7
    FROM f WHERE n28 = 28
    """,
)
def x_lag_features(spark: SparkSession, sf: str) -> DataFrame:
    """LAG-FEATURE MATRIX construction (the feature-engineering pass
    every forecasting model trains on: yesterday, last week, last month,
    and the trailing weekly mean as columns next to the target — built
    LEAK-FREE: every frame ends at 1 PRECEDING, so no feature ever sees
    the target row): rows emit only with a full 28-day history (the
    warm-up rule that keeps train/serve skew out).  Exact cents; the
    trailing mean uses truncating DIV.  Scale shape: orders reduce to
    the daily series; ALL lag/mean/count frames share one
    (nation)-partitioned sort — one shuffle past the reduce."""
    from pyspark.sql import Window

    daily = _nation_daily_cents(spark, sf)
    wo = Window.partitionBy("nat").orderBy("day")
    f = (
        daily.withColumn("lag_1", F.lag("x", 1).over(wo))
        .withColumn("lag_7", F.lag("x", 7).over(wo))
        .withColumn("lag_28", F.lag("x", 28).over(wo))
        .withColumn(
            "ma_7",
            F.expr("CAST(1 AS BIGINT)")
            * F.sum("x").over(wo.rowsBetween(-7, -1)),
        )
        .withColumn("n28", F.count(F.lit(1)).over(wo.rowsBetween(-28, -1)))
    )
    return f.filter(F.col("n28") == 28).select(
        F.col("nat").alias("n_name"),
        "day",
        F.col("x").alias("target_cents"),
        "lag_1",
        "lag_7",
        "lag_28",
        F.expr("ma_7 DIV 7").alias("ma_7"),
    )


@register(
    "x_share_of_total",
    """
    WITH rev AS (
      SELECT r_name, n_name,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, cents AS revenue_cents,
           cents * 1000000 // CAST(SUM(cents) OVER (PARTITION BY r_name)
                                   AS BIGINT) AS share_of_region_micro,
           cents * 1000000 // CAST(SUM(cents) OVER () AS BIGINT)
             AS share_of_world_micro,
           CAST(SUM(cents) OVER (PARTITION BY r_name) AS BIGINT) * 1000000
             // CAST(SUM(cents) OVER () AS BIGINT)
             AS region_share_of_world_micro
    FROM rev
    """,
)
def x_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """NESTED SHARE-OF-TOTAL (ratio-to-report at two hierarchy levels —
    the '% of region' and '% of world' columns every executive rollup
    carries, and the window formulation that replaces the classic
    join-back-to-totals anti-pattern): one aggregate to (region, nation),
    then three window shares over the ≤175-row rollup — the totals are
    never recomputed from raw data per level.  Exact micro division.
    Scale shape: the windows run on the dimension-bounded rollup, so
    their cost is constant at any SF."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            )
            .cast("long")
            .alias("cents")
        )
    )
    wr = Window.partitionBy("r_name")
    ww = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        F.col("cents").alias("revenue_cents"),
        F.expr("cents * 1000000").cast("long").alias("__cm"),
        F.sum("cents").over(wr).cast("long").alias("__rt"),
        F.sum("cents").over(ww).cast("long").alias("__wt"),
    ).select(
        "r_name",
        "n_name",
        "revenue_cents",
        F.expr("__cm DIV __rt").alias("share_of_region_micro"),
        F.expr("__cm DIV __wt").alias("share_of_world_micro"),
        F.expr("__rt * 1000000 DIV __wt").alias("region_share_of_world_micro"),
    )


@register(
    "x_budget_allocation",
    """
    WITH seg AS (
      SELECT c_mktsegment AS segment,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cap_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    ), tot AS (
      SELECT CAST(SUM(cap_cents) // 10 AS BIGINT) AS budget FROM seg
    ), ranked AS (
      SELECT segment, cap_cents,
             CAST(COALESCE(SUM(cap_cents) OVER (
                    ORDER BY cap_cents DESC, segment
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM seg
    )
    SELECT r.segment, r.cap_cents,
           GREATEST(LEAST(r.cap_cents, t.budget - r.cum_before), 0)
             AS allocated_cents,
           CAST(CASE WHEN t.budget - r.cum_before <= 0 THEN 1 ELSE 0 END
                AS INTEGER) AS starved
    FROM ranked r CROSS JOIN tot t
    """,
)
def x_budget_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """GREEDY CAPPED ALLOCATION in closed form (waterfall budgeting:
    fill segments in priority order, each up to its cap, until the pot
    runs dry — the sequential spill loop every FP&A sheet hides):
    allocated_i = clamp(budget − Σ caps before me, 0, cap_i) — the
    running-sum identity turns the loop into ONE window pass, exact to
    the cent, with starvation flags for tiers the budget never reaches.
    Priority = largest cap first (deterministic segment tiebreak); the
    pot = 10% of total revenue.  Scale shape: one aggregate to the
    segment rollup, one bounded window, a 1-row budget broadcast."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            )
            .cast("long")
            .alias("cap_cents")
        )
        .cache()
    )
    tot = seg.agg(F.expr("CAST(SUM(cap_cents) DIV 10 AS BIGINT)").alias("budget"))
    wo = Window.orderBy(F.col("cap_cents").desc(), "segment").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = seg.withColumn(
        "cum_before", F.coalesce(F.sum("cap_cents").over(wo), F.lit(0)).cast("long")
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "segment",
        "cap_cents",
        F.greatest(
            F.least(F.col("cap_cents"), F.col("budget") - F.col("cum_before")),
            F.lit(0),
        ).alias("allocated_cents"),
        F.when(F.col("budget") - F.col("cum_before") <= 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("starved"),
    )


@register(
    "x_pk_audit",
    """
    WITH stats AS (
      SELECT 'orders.o_orderkey' AS pk, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null
      FROM orders
      UNION ALL
      SELECT 'customer.c_custkey', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
             CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT l_orderkey * 100 + l_linenumber)
                  AS BIGINT),
             CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT doc_id) AS BIGINT),
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
    )
    SELECT pk, n_rows, n_distinct, n_null,
           n_rows - n_distinct AS dup_rows,
           CAST(CASE WHEN n_rows = n_distinct AND n_null = 0
                     THEN 1 ELSE 0 END AS INTEGER) AS pk_valid
    FROM stats
    """,
)
def x_pk_audit(spark: SparkSession, sf: str) -> DataFrame:
    """PRIMARY-KEY CONSTRAINT AUDIT (the uniqueness + non-null check
    lakehouse tables can't enforce and must therefore VERIFY — the
    nightly guard that catches double-loaded partitions): four declared
    keys (incl. one composite) audited for duplicates and nulls in one
    pass each, with a pass/fail flag per constraint.  Completes the DQ
    family: `x_data_contract` (values), `x_fk_integrity_audit`
    (references), `x_id_completeness_audit` (sequences), this (keys).
    Scale shape: one two-phase count-distinct per table; the composite
    key packs into one BIGINT (linenumber < 100) so no string concat on
    the hot path."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    li = load_table(spark, sf, "lineitem")
    d = load_table(spark, sf, "documents")

    def audit(df: DataFrame, label: str, key: Column, nullc: Column) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_distinct"),
            F.sum(F.when(nullc, 1).otherwise(0)).cast("long").alias("n_null"),
        ).select(F.lit(label).alias("pk"), "n_rows", "n_distinct", "n_null")

    stats = (
        audit(o, "orders.o_orderkey", F.col("o_orderkey"), F.col("o_orderkey").isNull())
        .unionAll(
            audit(
                c,
                "customer.c_custkey",
                F.col("c_custkey"),
                F.col("c_custkey").isNull(),
            )
        )
        .unionAll(
            audit(
                li,
                "lineitem.(l_orderkey,l_linenumber)",
                F.expr("l_orderkey * 100 + l_linenumber"),
                F.col("l_orderkey").isNull() | F.col("l_linenumber").isNull(),
            )
        )
        .unionAll(
            audit(d, "documents.doc_id", F.col("doc_id"), F.col("doc_id").isNull())
        )
    )
    return stats.select(
        "pk",
        "n_rows",
        "n_distinct",
        "n_null",
        (F.col("n_rows") - F.col("n_distinct")).alias("dup_rows"),
        F.when(
            (F.col("n_rows") == F.col("n_distinct")) & (F.col("n_null") == 0), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("pk_valid"),
    )


@register(
    "x_zonemap_audit",
    """
    WITH z AS (
      SELECT CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT)
               // 30 AS zone,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ), per_zone AS (
      SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(cents) AS BIGINT) AS min_cents,
             CAST(MAX(cents) AS BIGINT) AS max_cents
      FROM z GROUP BY zone
    ), g AS (
      SELECT CAST(MIN(min_cents) AS BIGINT) AS gmin,
             CAST(MAX(max_cents) AS BIGINT) AS gmax
      FROM per_zone
    )
    SELECT p.zone, p.n_rows, p.min_cents, p.max_cents,
           (p.max_cents - p.min_cents) * 1000000
             // GREATEST(g.gmax - g.gmin, 1) AS width_ratio_micro
    FROM per_zone p CROSS JOIN g
    """,
)
def x_zonemap_audit(spark: SparkSession, sf: str) -> DataFrame:
    """ZONE-MAP EFFECTIVENESS AUDIT (would min/max pruning actually skip
    anything? — the diagnostic BEHIND the layout decisions
    `ops/layout.py:zorder` and `x_zorder_scan` make): per 30-day zone,
    the price min/max envelope and its width as a fraction of the global
    range — a time-clustered table shows width_ratio ≈ 1 for an
    UNCORRELATED column (zone maps useless for price point-lookups ⇒
    Z-ORDER on (date, price) or re-sort), ≈ 1/zones for a correlated
    one.  Exact integers.  Scale shape: one zone-keyed min/max aggregate
    (map-side), a 1-row global envelope broadcast."""
    z = load_table(spark, sf, "orders").select(
        F.expr(
            "CAST(floor(unix_millis(o_orderdate) / 86400000.0) AS BIGINT) DIV 30"
        ).alias("zone"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    per_zone = z.groupBy("zone").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    g = per_zone.agg(
        F.min("min_cents").alias("gmin"), F.max("max_cents").alias("gmax")
    )
    return per_zone.crossJoin(F.broadcast(g)).select(
        "zone",
        "n_rows",
        "min_cents",
        "max_cents",
        F.expr(
            "(max_cents - min_cents) * 1000000 DIV greatest(gmax - gmin, 1)"
        ).alias("width_ratio_micro"),
    )


_TOPIC_WEIGHTS = (
    # (term, topic, weight_milli) — a tiny literal term-topic matrix; the
    # real pipeline would broadcast a learned one
    ("data", "tech", 900),
    ("model", "tech", 800),
    ("system", "tech", 600),
    ("market", "business", 900),
    ("price", "business", 800),
    ("order", "business", 500),
    ("game", "leisure", 900),
    ("music", "leisure", 700),
    ("travel", "leisure", 800),
    ("data", "business", 200),
    ("price", "tech", 100),
)


@register(
    "x_topic_scores",
    f"""
    WITH w(term, topic, wm) AS (
      VALUES {", ".join(f"('{t}', '{c}', {v})" for t, c, v in _TOPIC_WEIGHTS)}
    ), tok AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
      ) GROUP BY doc_id, tok
    ), scores AS (
      SELECT t.doc_id, w.topic,
             CAST(SUM(t.tf * w.wm) AS BIGINT) AS score_milli
      FROM tok t JOIN w ON t.tok = w.term
      GROUP BY t.doc_id, w.topic
    ), ranked AS (
      SELECT doc_id, topic, score_milli,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_milli DESC, topic) AS rn
      FROM scores
    )
    SELECT doc_id, topic AS top_topic, score_milli
    FROM ranked WHERE rn = 1
    """,
)
def x_topic_scores(spark: SparkSession, sf: str) -> DataFrame:
    """SPARSE MATRIX MULTIPLY as join-aggregate (doc-term counts × a
    term-topic weight matrix → doc-topic scores — the linear text
    classifier / topic scorer, and the general pattern for ANY sparse
    matmul on Spark: A⋈B on the contraction key, groupBy the output
    coordinates): term frequencies join the broadcast literal weight
    matrix, scores sum exactly in milli-units, and each document keeps
    its argmax topic (deterministic tiebreak).  Scale shape: the matmul
    is one equi-join on the term key against a constant-bounded
    broadcast + one (doc, topic) aggregate; the argmax is a per-doc
    struct ranking on the k-bounded score table."""
    d = load_table(spark, sf, "documents")
    w = spark.createDataFrame(
        list(_TOPIC_WEIGHTS), ["term", "topic", "wm"]
    ).withColumn("wm", F.col("wm").cast("long"))
    tok = (
        spread(d)
        .select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scores = (
        tok.join(F.broadcast(w), tok["tok"] == w["term"])
        .groupBy("doc_id", "topic")
        .agg(F.sum(F.col("tf") * F.col("wm")).cast("long").alias("score_milli"))
    )
    best = scores.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("score_milli")).alias("neg"),
                F.col("topic").alias("t"),
            )
        ).alias("m")
    )
    return best.select(
        "doc_id",
        F.col("m.t").alias("top_topic"),
        (-F.col("m.neg")).alias("score_milli"),
    )


@register(
    "x_holt_backtest",
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
    ), joined AS (
      SELECT h.nat, CAST(COUNT(*) AS BIGINT) AS n_forecasts,
             CAST(SUM(ABS(nxt.x - (h.l + h.b))) AS BIGINT) AS abs_err_sum,
             CAST(SUM(ABS(nxt.x - h.x)) AS BIGINT) AS naive_err_sum
      FROM h JOIN m nxt ON nxt.nat = h.nat AND nxt.rn = h.rn + 1
      GROUP BY h.nat
    )
    SELECT nat AS n_name, n_forecasts,
           abs_err_sum // n_forecasts AS holt_mae_cents,
           naive_err_sum // n_forecasts AS naive_mae_cents,
           CAST(CASE WHEN abs_err_sum < naive_err_sum THEN 1 ELSE 0 END
                AS INTEGER) AS beats_naive
    FROM joined
    """,
)
def x_holt_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """FORECAST BACKTESTING (the walk-forward evaluation every forecast
    needs before anyone trusts it: at each month, compare the 1-step
    Holt forecast lₜ+bₜ against month t+1's ACTUAL, next to the naive
    'tomorrow = today' baseline — a model that can't beat naive is
    noise): reuses `x_holt_linear`'s exact-integer fold, lead-joins the
    actuals, and reports per-nation MAE for both models plus the
    beats-naive verdict.  Scale shape: the fold and the lead join run on
    the calendar-bounded nation-month table; two shuffles past the
    orders reduce."""
    from pyspark.sql import Window

    # reuse the registered Holt query's output (same fold, same series)
    holt = REGISTRY["x_holt_linear"][0](spark, sf).select(
        F.col("n_name").alias("nat"),
        "mon",
        F.col("revenue_cents").alias("x"),
        F.col("forecast_cents").alias("f"),
    )
    wn = Window.partitionBy("nat").orderBy("mon")
    j = (
        holt.withColumn("next_x", F.lead("x").over(wn))
        .filter(F.col("next_x").isNotNull())
        .select(
            "nat",
            (F.abs(F.col("next_x") - F.col("f"))).alias("holt_err"),
            (F.abs(F.col("next_x") - F.col("x"))).alias("naive_err"),
        )
    )
    agg = j.groupBy("nat").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.sum("holt_err").cast("long").alias("abs_err_sum"),
        F.sum("naive_err").cast("long").alias("naive_err_sum"),
    )
    return agg.select(
        F.col("nat").alias("n_name"),
        "n_forecasts",
        F.expr("abs_err_sum DIV n_forecasts").alias("holt_mae_cents"),
        F.expr("naive_err_sum DIV n_forecasts").alias("naive_mae_cents"),
        F.when(F.col("abs_err_sum") < F.col("naive_err_sum"), 1)
        .otherwise(0)
        .cast("int")
        .alias("beats_naive"),
    )


@register(
    "x_holt_winters",
    """
    WITH RECURSIVE daily AS (
      SELECT n_name AS nat,
             CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT) >= 11355
      GROUP BY 1, 2
    ), m AS (
      SELECT nat, day, x,
             row_number() OVER (PARTITION BY nat ORDER BY day) AS rn
      FROM daily
    ), h AS (
      SELECT nat, day, rn, x, x AS l, CAST(0 AS BIGINT) AS b,
             [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS s
      FROM m WHERE rn = 1
      UNION ALL
      SELECT m.nat, m.day, m.rn, m.x,
             (2*(m.x - h.s[CAST(m.day % 7 + 1 AS INT)])
              + 8*(h.l + h.b)) // 10 AS l,
             ((((2*(m.x - h.s[CAST(m.day % 7 + 1 AS INT)])
                 + 8*(h.l + h.b)) // 10) - h.l) + 9*h.b) // 10 AS b,
             list_transform(generate_series(1, 7), j ->
               CASE WHEN j = CAST(m.day % 7 + 1 AS INT)
                    THEN (3*(m.x - ((2*(m.x - h.s[CAST(m.day % 7 + 1 AS INT)])
                              + 8*(h.l + h.b)) // 10))
                          + 7*h.s[j]) // 10
                    ELSE h.s[j] END) AS s
      FROM h JOIN m ON m.nat = h.nat AND m.rn = h.rn + 1
    )
    SELECT nat AS n_name, day, x AS revenue_cents,
           l AS level_cents, b AS trend_cents,
           s[CAST(day % 7 + 1 AS INT)] AS seasonal_cents
    FROM h
    """,
)
def x_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    """HOLT-WINTERS additive smoothing (the full triple-exponential
    forecaster: level + trend + a 7-slot WEEKDAY seasonal state — the
    model the EWMA → Holt ladder tops out at): lₜ = α(xₜ−s_{t−7}) +
    (1−α)(lₜ₋₁+bₜ₋₁), bₜ as in Holt, sₜ = γ(xₜ−lₜ) + (1−γ)s_{t−7}, with
    α=0.2 β=0.1 γ=0.3 rational and EVERY step truncating-integer — the
    fold accumulator carries the seasonal ARRAY through the `aggregate`
    higher-order function (seasonal slot = calendar day % 7, robust to
    gaps), and the oracle's recursive CTE carries the same LIST state
    bit-identically.  Scale shape: per-nation sequential, cross-nation
    parallel, fold state = 7 BIGINTs + 2 — no driver loop, no Python;
    one shuffle past the daily reduce.  The fold window is the trailing
    180 calendar days (epoch day ≥ 11355, a fixed literal shared with
    the oracle): the append accumulator copies itself per step, so the
    fold is O(steps²) in copy cost — 180 steps is cheap, the full
    7-year series was the round's slowest query (20s at sf0.1); at
    production scale run HW per bounded horizon exactly like this, or
    checkpoint level/trend/seasonal state between horizons."""
    daily = _nation_daily_cents(spark, sf).filter(F.col("day") >= 11355)
    arr = daily.groupBy("nat").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("arr")
    )
    folded = arr.select(
        "nat",
        F.expr(
            """
            aggregate(
              slice(arr, 2, greatest(size(arr) - 1, 0)),
              array(named_struct('day', arr[0].day, 'x', arr[0].x,
                    'l', arr[0].x, 'b', CAST(0 AS BIGINT),
                    's', array(CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0))),
              (acc, e) -> array_append(acc, named_struct(
                'day', e.day, 'x', e.x,
                'l', (2*(e.x - element_at(element_at(acc,-1).s,
                                          CAST(e.day % 7 + 1 AS INT)))
                      + 8*(element_at(acc,-1).l + element_at(acc,-1).b))
                     DIV 10,
                'b', ((((2*(e.x - element_at(element_at(acc,-1).s,
                                             CAST(e.day % 7 + 1 AS INT)))
                         + 8*(element_at(acc,-1).l + element_at(acc,-1).b))
                        DIV 10) - element_at(acc,-1).l)
                      + 9*element_at(acc,-1).b) DIV 10,
                's', transform(sequence(1, 7), j ->
                  CASE WHEN j = CAST(e.day % 7 + 1 AS INT)
                       THEN (3*(e.x
                               - ((2*(e.x - element_at(element_at(acc,-1).s,
                                      CAST(e.day % 7 + 1 AS INT)))
                                   + 8*(element_at(acc,-1).l
                                        + element_at(acc,-1).b)) DIV 10))
                             + 7*element_at(element_at(acc,-1).s, j)) DIV 10
                       ELSE element_at(element_at(acc,-1).s, j) END)))
            ) AS h
            """
        ),
    )
    return (
        folded.select("nat", F.explode("h").alias("st"))
        .select(
            F.col("nat").alias("n_name"),
            F.col("st.day").alias("day"),
            F.col("st.x").alias("revenue_cents"),
            F.col("st.l").alias("level_cents"),
            F.col("st.b").alias("trend_cents"),
            F.expr(
                "element_at(st.s, CAST(st.day % 7 + 1 AS INT))"
            ).alias("seasonal_cents"),
        )
    )


@register(
    "x_stratified_estimate",
    """
    WITH samp AS (
      SELECT c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(concat('0x', substr(md5('svy' || CAST(c_custkey AS VARCHAR)),
                                      1, 15)) AS BIGINT) % 8 = 0 AS in_sample
      FROM customer
    ), strata AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
               AS n_samp,
             CAST(SUM(CASE WHEN in_sample THEN cents ELSE 0 END) AS BIGINT)
               AS s_samp
      FROM samp GROUP BY c_nationkey
    ), keep AS (
      SELECT * FROM strata WHERE n_samp > 0
    )
    SELECT CAST(SUM(n_pop) AS BIGINT) AS n_population,
           CAST(SUM(n_samp) AS BIGINT) AS n_sampled,
           CAST(SUM(n_pop * (s_samp * 1000 // n_samp)) // SUM(n_pop)
                AS BIGINT) AS stratified_mean_millicents,
           CAST(SUM(s_samp) * 1000 // SUM(n_samp) AS BIGINT)
             AS naive_mean_millicents
    FROM keep
    """,
)
def x_stratified_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """STRATIFIED (post-stratification) ESTIMATION — the survey-weighting
    correction every sampled metric needs when strata are sampled
    unevenly: a deterministic 1/8 hash sample of customers, per-nation
    sample means re-weighted by the TRUE stratum sizes
    (Σ N_h·x̄_h / Σ N_h) next to the naive pooled sample mean — the two
    diverge exactly when sampling rates drift across strata, which is
    the bias this estimator removes.  Exact milli-cents throughout
    (per-stratum means floored once).  Scale shape: one stratum
    aggregate over the full table, then a ≤25-row reduce."""
    samp = load_table(spark, sf, "customer").select(
        "c_nationkey",
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        (
            D.portable_hash60(
                F.concat(F.lit("svy"), F.col("c_custkey").cast("string"))
            )
            % 8
            == 0
        ).alias("in_sample"),
    )
    strata = samp.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
        .cast("long")
        .alias("n_samp"),
        F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s_samp"),
    ).filter(F.col("n_samp") > 0)
    return strata.agg(
        F.sum("n_pop").cast("long").alias("n_population"),
        F.sum("n_samp").cast("long").alias("n_sampled"),
        F.expr(
            "CAST(SUM(n_pop * (s_samp * 1000 DIV n_samp)) DIV SUM(n_pop)"
            " AS BIGINT)"
        ).alias("stratified_mean_millicents"),
        F.expr("CAST(SUM(s_samp) * 1000 DIV SUM(n_samp) AS BIGINT)").alias(
            "naive_mean_millicents"
        ),
    )


@register(
    "x_hotspot_cells",
    """
    WITH pts AS (
      SELECT CAST(concat('0x', substr(md5('dbx' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100000 // 10000 AS cx,
             CAST(concat('0x', substr(md5('dby' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100000 // 10000 AS cy
      FROM customer
    ), cells AS (
      SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY cx, cy
    ), nb AS (
      SELECT a.cx, a.cy, a.n,
             CAST(SUM(b.n) AS BIGINT) AS neighbor_sum,
             CAST(COUNT(*) AS BIGINT) AS neighbor_cnt
      FROM cells a
      JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND NOT (a.cx = b.cx AND a.cy = b.cy)
      GROUP BY a.cx, a.cy, a.n
    )
    SELECT cx AS cell_x, cy AS cell_y, n AS n_points,
           neighbor_sum, neighbor_cnt,
           CAST(CASE WHEN n * neighbor_cnt > 2 * neighbor_sum
                     THEN 1 ELSE 0 END AS INTEGER) AS hotspot
    FROM nb
    """,
)
def x_hotspot_cells(spark: SparkSession, sf: str) -> DataFrame:
    """SPATIAL HOTSPOT DETECTION (Getis-Ord-style local density: a cell
    is hot when its count exceeds 2× its 8-neighborhood mean — crime
    maps, outage clusters, demand heat): points land in a 10×10 grid
    (portable md5 coordinates shared with `x_dbscan_clusters`), and the
    neighborhood statistic is a self-join of the CELL table on the
    |Δ|≤1 stencil — the join touches ≤ 100 cells × 8, never points,
    and edge cells normalize by their true neighbor count.  Exact
    integer comparison (n·cnt > 2·Σ).  Scale shape: one grid aggregate
    over the points, then constant-size stencil algebra — the
    cell-table twin of the point-level DBSCAN probe."""
    pts = load_table(spark, sf, "customer").select(
        (
            D.portable_hash60(
                F.concat(F.lit("dbx"), F.col("c_custkey").cast("string"))
            )
            % 100000
        ).alias("x"),
        (
            D.portable_hash60(
                F.concat(F.lit("dby"), F.col("c_custkey").cast("string"))
            )
            % 100000
        ).alias("y"),
    )
    cells = pts.select(
        F.expr("x DIV 10000").alias("cx"), F.expr("y DIV 10000").alias("cy")
    ).groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n")).cache()
    b = cells.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("n").alias("bn")
    )
    nb = (
        cells.join(
            F.broadcast(b),
            (F.abs(F.col("cx") - F.col("bx")) <= 1)
            & (F.abs(F.col("cy") - F.col("by")) <= 1)
            & ~((F.col("cx") == F.col("bx")) & (F.col("cy") == F.col("by"))),
        )
        .groupBy("cx", "cy", "n")
        .agg(
            F.sum("bn").cast("long").alias("neighbor_sum"),
            F.count(F.lit(1)).alias("neighbor_cnt"),
        )
    )
    return nb.select(
        F.col("cx").alias("cell_x"),
        F.col("cy").alias("cell_y"),
        F.col("n").alias("n_points"),
        "neighbor_sum",
        "neighbor_cnt",
        F.when(
            F.col("n") * F.col("neighbor_cnt") > 2 * F.col("neighbor_sum"), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("hotspot"),
    )


