"""misc batch pack, part 2 of 2 (q15 split, round 10 — VERDICT r9 ask
#4): streaks, k-core/graph trades, stats tests, fusion/ranking, OLS,
splits, audits, lateral/recursive SQL.  Mechanical move: query bodies
are verbatim; registration order is preserved by the import order in
``kafka_streaming_spark/queries/__init__.py``, so ``REGISTRY`` /
``DRIVER_PRIORITY`` iteration is unchanged."""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403

@register(
    "x_longest_streak",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day_num
      FROM events
    ), isl AS (
      SELECT user_id, day_num,
             day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
               AS grp
      FROM ud
    ), streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             CAST(MIN(day_num) AS BIGINT) AS streak_start
      FROM isl GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, len, streak_start,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, len AS longest_streak_days, streak_start
    FROM best WHERE rn = 1 AND user_id < 100
    """,
)
def x_longest_streak(spark: SparkSession, sf: str) -> DataFrame:
    """LONGEST CONSECUTIVE-DAY STREAK per user (the engagement/gamified
    metric): the discrete gaps-and-islands identity — consecutive days
    share a constant ``day - row_number`` — groups each run in one window
    pass, then a per-user argmax picks the longest (earliest start breaks
    ties).  The INTERVAL twin (`x_interval_merge`) coalesces overlapping
    time ranges; this is the integer-grid form.  Scale shape: events
    collapse to distinct user-days first, both windows partition on the
    user key (one shuffle, reused), output bounded to users < 100."""
    from pyspark.sql import Window

    ud = (
        load_table(spark, sf, "events")
        .select(
            "user_id",
            F.expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)").alias(
                "day_num"
            ),
        )
        .distinct()
    )
    wi = Window.partitionBy("user_id").orderBy("day_num")
    isl = ud.withColumn("grp", F.col("day_num") - F.row_number().over(wi))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("day_num").alias("streak_start")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter((F.col("rn") == 1) & (F.col("user_id") < 100))
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            "streak_start",
        )
    )


@register(
    "f_map_pack",
    """
    WITH arr AS (
      SELECT event_id, generate_series(1, 1 + event_id % 4) AS ks
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           CAST(len(ks) AS INTEGER) AS n_keys,
           CAST(COALESCE(list_aggregate(
             list_filter(list_transform(ks, k -> k * event_id + k),
                         x -> x % 2 = 0), 'sum'), 0) AS BIGINT) AS sum_even_vals,
           CAST(event_id AS BIGINT) AS lookup_1,
           CAST(len(ks) + 1 AS INTEGER) AS n_after_concat
    FROM arr
    """,
)
def f_map_pack(spark: SparkSession, sf: str) -> DataFrame:
    """MAP-typed column surface (§2.9 completion alongside the array
    `f_hof_pack`): ``map_from_arrays`` construction, ``transform_values``,
    ``map_filter``, ``map_values`` fold, ``element_at`` lookup, and
    ``map_concat`` — all JVM-side Catalyst map expressions, zero
    shuffles.  Outputs are scalars (maps never reach the checked schema),
    and the oracle recomputes them with plain list arithmetic — DuckDB
    needs no map type to certify the values."""
    e = load_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    ks = F.sequence(F.lit(1).cast("long"), 1 + F.col("event_id") % 4)
    m = F.map_from_arrays(ks, F.transform(ks, lambda k: k * F.col("event_id")))
    tv = F.transform_values(m, lambda k, v: v + k)
    mf = F.map_filter(tv, lambda k, v: v % 2 == 0)
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.aggregate(
            F.map_values(mf), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_even_vals"),
        F.element_at(m, F.lit(1).cast("long")).alias("lookup_1"),
        F.size(F.map_concat(m, F.create_map(F.lit(0).cast("long"), F.lit(7).cast("long")))).alias(
            "n_after_concat"
        ),
    )


@register(
    "x_pii_redact",
    """
    WITH enriched AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' see https://example.org/doc/' || CAST(doc_id AS VARCHAR) ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' call +1 (555) 123-4567' ELSE '' END AS text
      FROM documents
    ), red AS (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
               '\\+?[0-9][0-9()\\-. ]{7,}[0-9]', '<PHONE>', 'g') AS redacted
      FROM enriched
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(text, 'https?://[^\\s]+'))
                + len(regexp_extract_all(text, '\\+?[0-9][0-9()\\-. ]{7,}[0-9]'))
                AS BIGINT) AS n_redactions,
           md5(redacted) AS redacted_md5,
           CAST(length(redacted) AS BIGINT) AS n_chars_after
    FROM red
    WHERE text <> redacted
    """,
)
def x_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII REDACTION transform — the rewrite half of the governance pair
    (`x_pii_scan` is the triage half): plant deterministic email/URL/
    phone strings, then chain three global ``regexp_replace`` passes
    (email → URL → phone, fixed order so overlapping matches resolve
    identically everywhere) and emit the redaction count plus the md5 of
    the REDACTED text — the oracle recomputes the same replacements, so
    a hash match certifies byte-identical redacted output, not just
    matching counts.  Patterns are lookahead-free (Java regex ≡ RE2).
    Pure map-side column expressions; rows only for docs that changed."""
    d = load_table(spark, sf, "documents")
    text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" see https://example.org/doc/"), F.col("doc_id").cast("string")
            ),
        ).otherwise(""),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" call +1 (555) 123-4567")).otherwise(
            ""
        ),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url = r"https?://[^\s]+"
    phone = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
    e = d.select(F.col("doc_id"), text.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), url, "<URL>"
        ),
        phone,
        "<PHONE>",
    )
    n_red = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), 0))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(url), 0))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(phone), 0))
    )
    return (
        e.withColumn("redacted", redacted)
        .filter(F.col("text") != F.col("redacted"))
        .select(
            "doc_id",
            n_red.cast("long").alias("n_redactions"),
            F.md5("redacted").alias("redacted_md5"),
            F.length("redacted").cast("long").alias("n_chars_after"),
        )
    )


@register(
    "x_kcore_trade",
    """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey + 100000 AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL SELECT v, u FROM pairs
    ), kv AS (
      SELECT 1 + COUNT(*) // COUNT(DISTINCT src) AS k FROM edges
    ), d1 AS (
      SELECT src, COUNT(*) AS c FROM edges GROUP BY src
    ), keep1 AS (
      SELECT src FROM d1 CROSS JOIN kv WHERE c >= k
    ), e1 AS (
      SELECT e.src, e.dst FROM edges e
      JOIN keep1 a ON e.src = a.src JOIN keep1 b ON e.dst = b.src
    ), d2 AS (
      SELECT src, COUNT(*) AS c FROM e1 GROUP BY src
    ), keep2 AS (
      SELECT src FROM d2 CROSS JOIN kv WHERE c >= k
    ), e2 AS (
      SELECT e.src, e.dst FROM e1 e
      JOIN keep2 a ON e.src = a.src JOIN keep2 b ON e.dst = b.src
    )
    SELECT (SELECT CAST(k AS BIGINT) FROM kv) AS k,
           CAST(COUNT(DISTINCT src) AS BIGINT) AS n_core_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_core_edges,
           CAST(SUM(DISTINCT src) AS BIGINT) AS sum_node,
           CAST(MIN(src) AS BIGINT) AS min_node,
           CAST(MAX(src) AS BIGINT) AS max_node
    FROM e2
    """,
)
def x_kcore_trade(spark: SparkSession, sf: str) -> DataFrame:
    """K-CORE of the trade graph
    (:func:`kafka_streaming_spark.functions.graph.k_core`): two peeling
    rounds removing nodes below k = 1 + average degree — the dense-core
    extraction that strips marginal participants before community/
    influence analysis (the "remove the long tail, keep the engine room"
    operator).  k derives from the graph itself (integer mean degree), so
    the query stays non-vacuous at every scale factor even though
    absolute degrees grow ~linearly with SF.  Deterministic (degree
    thresholds have no tie ambiguity) ⇒ the peels unroll exactly into
    CTEs.  Completes the iterative-graph family: PageRank, label
    propagation, connected components, BFS, triangles, k-core.  One
    bounded scalar collect (the 1-row k), same policy as the CC round
    scalar."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 100000).alias("v"),
        )
        .distinct()
    )
    # cache: the distinct-pair build feeds BOTH the k scalar and round-1
    # peeling — without it the lineitem⋈orders distinct executes twice
    edges = G.undirect(pairs).cache()
    k = edges.agg(
        F.expr("1 + count(*) div count(DISTINCT src)").alias("k")
    ).collect()[0]["k"]
    core = G.k_core(edges, int(k), rounds=2)
    # k_core materializes each peeled shell (and now preserves caller
    # caches instead of evicting them — ADVICE r6), so the raw edge list
    # has served both its consumers; release it here or two full edge
    # lists stay pinned through the final aggregate.
    edges.unpersist()
    return core.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.countDistinct("src").alias("n_core_nodes"),
        F.count(F.lit(1)).alias("n_core_edges"),
        F.sum_distinct(F.col("src")).cast("long").alias("sum_node"),
        F.min("src").alias("min_node"),
        F.max("src").alias("max_node"),
    )


@register(
    "x_chi2_independence",
    """
    WITH base AS (
      SELECT c_mktsegment AS seg, n_name AS nat
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), obs AS (
      SELECT seg, nat, COUNT(*) AS o FROM base GROUP BY seg, nat
    ), rt AS (
      SELECT seg, COUNT(*) AS rtot FROM base GROUP BY seg
    ), ct AS (
      SELECT nat, COUNT(*) AS ctot FROM base GROUP BY nat
    ), tot AS (
      SELECT COUNT(*) AS nn FROM base
    ), grid AS (
      SELECT r.seg, c.nat, r.rtot, c.ctot, COALESCE(o.o, 0) AS o, t.nn
      FROM rt r CROSS JOIN ct c CROSS JOIN tot t
      LEFT JOIN obs o ON o.seg = r.seg AND o.nat = c.nat
    ), cells AS (
      SELECT seg, nat, nn,
             CAST(FLOOR(
               CAST(o * nn - rtot * ctot AS DOUBLE)
               * CAST(o * nn - rtot * ctot AS DOUBLE)
               / (CAST(nn AS DOUBLE) * CAST(rtot AS DOUBLE)
                  * CAST(ctot AS DOUBLE))
               * 1000000.0) AS BIGINT) AS cell_micro
      FROM grid
    ), agg AS (
      SELECT MAX(nn) AS n_obs,
             COUNT(DISTINCT seg) AS r_levels,
             COUNT(DISTINCT nat) AS c_levels,
             CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro
      FROM cells
    )
    SELECT CAST(n_obs AS BIGINT) AS n_obs,
           CAST(r_levels AS BIGINT) AS r_levels,
           CAST(c_levels AS BIGINT) AS c_levels,
           CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
           chi2_micro,
           CAST(FLOOR(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
                           / (CAST(n_obs AS DOUBLE)
                              * CAST(LEAST(r_levels - 1, c_levels - 1)
                                     AS DOUBLE)))
                      * 1000000.0) AS BIGINT) AS cramers_v_micro
    FROM agg
    """,
)
def x_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE TEST between two categorical columns
    (market segment × nation over customers) — the categorical-association
    screen of feature selection and drift audits, with Cramér's V as the
    normalized effect size.  Numeric policy: every per-cell term
    ``(O·N − R·C)² / (N·R·C)`` is computed from EXACT BIGINT factors
    through a fixed chain of IEEE-deterministic double ops (multiply /
    divide / sqrt are correctly rounded, identical across engines), then
    floored to a per-cell micro BIGINT — so the SUM is order-independent
    integer arithmetic and hash-stable, the same trick the other micro
    queries use but extended to a two-sided expected-counts grid.  The
    grid is the cross join of the two marginal tables (≤ r×c = 125 rows,
    CONSTANT at every SF — the only cross join), left-joined against
    observed cells so zero-observed cells still contribute their
    expected-count mass.  Scale shape: raw rows reduce to three marginal
    aggregates + one contingency groupBy, everything after is
    constant-size."""
    c = load_table(spark, sf, "customer").select("c_mktsegment", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    base = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat"))
        .cache()
    )
    obs = base.groupBy("seg", "nat").agg(F.count(F.lit(1)).alias("o"))
    rt = base.groupBy("seg").agg(F.count(F.lit(1)).alias("rtot"))
    ct = base.groupBy("nat").agg(F.count(F.lit(1)).alias("ctot"))
    tot = base.agg(F.count(F.lit(1)).alias("nn"))
    grid = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["seg", "nat"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    d = F.col("o") * F.col("nn") - F.col("rtot") * F.col("ctot")
    cells = grid.select(
        "seg",
        "nat",
        "nn",
        F.floor(
            d.cast("double")
            * d.cast("double")
            / (
                F.col("nn").cast("double")
                * F.col("rtot").cast("double")
                * F.col("ctot").cast("double")
            )
            * F.lit(1000000.0)
        ).alias("cell_micro"),
    )
    agg = cells.agg(
        F.max("nn").alias("n_obs"),
        F.countDistinct("seg").alias("r_levels"),
        F.countDistinct("nat").alias("c_levels"),
        F.sum("cell_micro").cast("long").alias("chi2_micro"),
    )
    return agg.select(
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("r_levels").cast("long").alias("r_levels"),
        F.col("c_levels").cast("long").alias("c_levels"),
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
        .cast("long")
        .alias("dof"),
        "chi2_micro",
        F.floor(
            F.sqrt(
                (F.col("chi2_micro").cast("double") / F.lit(1000000.0))
                / (
                    F.col("n_obs").cast("double")
                    * F.least(F.col("r_levels") - 1, F.col("c_levels") - 1).cast(
                        "double"
                    )
                )
            )
            * F.lit(1000000.0)
        ).alias("cramers_v_micro"),
    )


@register(
    "x_grid_nearest_join",
    """
    WITH sg AS (
      SELECT s_suppkey,
             CAST(concat('0x', substr(md5('xs' || CAST(s_suppkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS sx,
             CAST(concat('0x', substr(md5('ys' || CAST(s_suppkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS sy
      FROM supplier
    ), qg AS (
      SELECT c_custkey,
             CAST(concat('0x', substr(md5('xc' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS cx,
             CAST(concat('0x', substr(md5('yc' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS cy
      FROM customer WHERE c_custkey <= 500
    ), cand AS (
      SELECT q.c_custkey, s.s_suppkey,
             (s.sx - q.cx) * (s.sx - q.cx)
             + (s.sy - q.cy) * (s.sy - q.cy) AS dist2
      FROM qg q
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
      JOIN sg s ON s.sx // 20000 = q.cx // 20000 + ox.dx
              AND s.sy // 20000 = q.cy // 20000 + oy.dy
    ), ranked AS (
      SELECT c_custkey, s_suppkey, dist2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist2, s_suppkey) AS rn
      FROM cand
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(s_suppkey AS BIGINT) AS nearest_suppkey,
           CAST(dist2 AS BIGINT) AS dist2
    FROM ranked WHERE rn = 1
    """,
)
def x_grid_nearest_join(spark: SparkSession, sf: str) -> DataFrame:
    """GRID-BLOCKED SPATIAL NEAREST-NEIGHBOR JOIN — the geohash/grid-cell
    blocking pattern for spatial joins at scale: points land in fixed
    cells (coord ÷ 20000 on a 1M×1M integer plane → 50×50 grid), each
    query probes only its 3×3 cell neighborhood (a 9-way key-offset
    equi-join — never a distance cross join), and the nearest candidate
    wins by exact integer squared distance with key tiebreak.  The same
    shape serves geo point-of-interest lookup, sensor-to-station
    assignment, and any metric-space blocking where a cell bound on the
    search radius holds.  Coordinates derive from the cross-engine md5
    hash family (:func:`~kafka_streaming_spark.functions.dedup.portable_hash60`)
    so both engines see identical geometry; the query side is a bounded
    key range (≤500), candidates per query are bounded by cell density.
    Matched-only semantics: a query with an empty neighborhood is
    correctly absent (the blocked form's contract — widen the grid, not
    the join, to lower the miss rate).  Nearest-per-query is a struct-min
    AGGREGATE (not a window sort) on the Spark side; the oracle's
    row_number form is the same argmin."""
    sup = load_table(spark, sf, "supplier").select(
        "s_suppkey",
        F.pmod(
            D.portable_hash60(F.concat(F.lit("xs"), F.col("s_suppkey").cast("string"))),
            F.lit(1000000),
        ).alias("sx"),
        F.pmod(
            D.portable_hash60(F.concat(F.lit("ys"), F.col("s_suppkey").cast("string"))),
            F.lit(1000000),
        ).alias("sy"),
    )
    qry = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.pmod(
                D.portable_hash60(
                    F.concat(F.lit("xc"), F.col("c_custkey").cast("string"))
                ),
                F.lit(1000000),
            ).alias("cx"),
            F.pmod(
                D.portable_hash60(
                    F.concat(F.lit("yc"), F.col("c_custkey").cast("string"))
                ),
                F.lit(1000000),
            ).alias("cy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    )
    cand = qry.join(
        sup,
        (F.expr("sx DIV 20000") == F.expr("cx DIV 20000") + F.col("dx"))
        & (F.expr("sy DIV 20000") == F.expr("cy DIV 20000") + F.col("dy")),
    ).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("sx") - F.col("cx")) * (F.col("sx") - F.col("cx"))
            + (F.col("sy") - F.col("cy")) * (F.col("sy") - F.col("cy"))
        ).alias("dist2"),
    )
    return (
        cand.groupBy("c_custkey")
        .agg(
            F.min(
                F.struct(F.col("dist2").alias("d"), F.col("s_suppkey").alias("k"))
            ).alias("m")
        )
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("m.k").cast("long").alias("nearest_suppkey"),
            F.col("m.d").cast("long").alias("dist2"),
        )
    )


def _nation_daily_cents(spark: SparkSession, sf: str) -> DataFrame:
    """Shared series builder for the per-nation time-series operators
    (`x_acf_lag`, `x_sax_symbols`, `x_rolling_median`): one row per
    (nation, day) with exact revenue cents — raw orders reduce here
    FIRST, so every downstream window runs on the ~nation×2400-row
    series, never on order volume."""
    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(unix_millis(o_orderdate) / 86400000.0) AS BIGINT)").alias(
            "day"
        ),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nat"), "day")
        .agg(F.sum("cents").cast("long").alias("x"))
    )


@register(
    "x_acf_lag",
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
    ), lagged AS (
      SELECT nat, day, x,
             lag(x, 1) OVER (PARTITION BY nat ORDER BY day) AS x1,
             lag(x, 7) OVER (PARTITION BY nat ORDER BY day) AS x7
      FROM daily
    ), stats AS (
      SELECT nat, day, x, x1, x7,
             COUNT(*) OVER (PARTITION BY nat) AS nn,
             CAST(SUM(x) OVER (PARTITION BY nat) AS BIGINT) AS s
      FROM lagged
    ), terms AS (
      SELECT nat, nn,
             CAST(FLOOR(CAST(nn * x - s AS DOUBLE)
                        * CAST(nn * x - s AS DOUBLE)
                        / 10000000000000.0) AS BIGINT) AS den_t,
             CASE WHEN x1 IS NULL THEN NULL ELSE
               CAST(FLOOR(CAST(nn * x - s AS DOUBLE)
                          * CAST(nn * x1 - s AS DOUBLE)
                          / 10000000000000.0) AS BIGINT) END AS num1_t,
             CASE WHEN x7 IS NULL THEN NULL ELSE
               CAST(FLOOR(CAST(nn * x - s AS DOUBLE)
                          * CAST(nn * x7 - s AS DOUBLE)
                          / 10000000000000.0) AS BIGINT) END AS num7_t
      FROM stats
    ), byn AS (
      SELECT nat, MAX(nn) AS n_days,
             CAST(SUM(den_t) AS BIGINT) AS den,
             CAST(SUM(num1_t) AS BIGINT) AS num1,
             CAST(SUM(num7_t) AS BIGINT) AS num7
      FROM terms GROUP BY nat
    )
    SELECT nat AS n_name, CAST(lag_k AS BIGINT) AS lag_k,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(ROUND(CAST(num AS DOUBLE) * 1000000.0
                      / CAST(den AS DOUBLE), 0) AS BIGINT) AS acf_micro
    FROM (
      SELECT nat, n_days, den, 1 AS lag_k, num1 AS num FROM byn
      UNION ALL
      SELECT nat, n_days, den, 7 AS lag_k, num7 AS num FROM byn
    )
    """,
)
def x_acf_lag(spark: SparkSession, sf: str) -> DataFrame:
    """LAG-k AUTOCORRELATION (sample ACF at lags 1 and 7) of each
    nation's daily revenue series — the time-series diagnostic behind
    seasonality detection and forecast-model selection (`x_seasonal_baseline`
    asserts a weekly profile; this MEASURES whether one exists).  Mean
    centering is cross-multiplied into integers (``n·xₜ − S``) so no
    float mean ever forms; each lag product flows through one fixed
    IEEE-deterministic double multiply and a 1e13-scaled floor to a
    per-row micro BIGINT, making both sums order-independent exact
    integers (overflow-safe through a 100× replica: |n·x−S| ≲ 1e13 ⇒
    term ≲ 1e13, ×2400 days ≪ 2⁶³).  Scale shape: raw orders reduce to
    one row per (nation, day) FIRST; the lag/stat windows and the final
    fold run on the ~nation×2400-row daily table, one partition-key
    shuffle end-to-end.  Row-lag semantics over observed days (standard
    sparse-series ACF); denominator spans all n terms, numerator the
    n−k overlapped pairs."""
    daily = _nation_daily_cents(spark, sf)
    from pyspark.sql.window import Window

    wo = Window.partitionBy("nat").orderBy("day")
    wp = Window.partitionBy("nat")
    stats = (
        daily.withColumn("x1", F.lag("x", 1).over(wo))
        .withColumn("x7", F.lag("x", 7).over(wo))
        .withColumn("nn", F.count(F.lit(1)).over(wp))
        .withColumn("s", F.sum("x").over(wp).cast("long"))
    )
    dev = (F.col("nn") * F.col("x") - F.col("s")).cast("double")
    scale = F.lit(10000000000000.0)

    def _lag_term(col: str) -> Column:
        lagdev = (F.col("nn") * F.col(col) - F.col("s")).cast("double")
        return F.when(
            F.col(col).isNull(), F.lit(None).cast("long")
        ).otherwise(F.floor(dev * lagdev / scale))

    terms = stats.select(
        "nat",
        "nn",
        F.floor(dev * dev / scale).alias("den_t"),
        _lag_term("x1").alias("num1_t"),
        _lag_term("x7").alias("num7_t"),
    )
    byn = terms.groupBy("nat").agg(
        F.max("nn").alias("n_days"),
        F.sum("den_t").cast("long").alias("den"),
        F.sum("num1_t").cast("long").alias("num1"),
        F.sum("num7_t").cast("long").alias("num7"),
    )
    unioned = byn.select(
        "nat", "n_days", "den", F.lit(1).alias("lag_k"), F.col("num1").alias("num")
    ).unionAll(
        byn.select(
            "nat", "n_days", "den", F.lit(7).alias("lag_k"), F.col("num7").alias("num")
        )
    )
    return unioned.select(
        F.col("nat").alias("n_name"),
        F.col("lag_k").cast("long").alias("lag_k"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("num").cast("double") * F.lit(1000000.0) / F.col("den").cast("double"), 0)
        .cast("long")
        .alias("acf_micro"),
    )


@register(
    "x_bitmap_rollup",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day
      FROM events
    ), mn AS (
      SELECT MIN(day) AS min_day FROM e
    ), slots AS (
      SELECT user_id, event_type, day - min_day AS slot
      FROM e CROSS JOIN mn WHERE day - min_day < 63
    ), masks AS (
      SELECT user_id, event_type,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(slot AS INTEGER)) AS BIGINT)
               AS mask
      FROM slots GROUP BY user_id, event_type
    ), j AS (
      SELECT a.user_id, a.mask AS ma, b.mask AS mb
      FROM (SELECT user_id, mask FROM masks WHERE event_type = 'click') a
      JOIN (SELECT user_id, mask FROM masks WHERE event_type = 'purchase') b
        ON a.user_id = b.user_id
    )
    SELECT CAST(bit_count(ma & mb) AS BIGINT) AS overlap_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(bit_count(ma | mb)) AS BIGINT) AS sum_union_days,
           CAST(SUM(bit_count(ma)) AS BIGINT) AS sum_click_days
    FROM j GROUP BY 1
    """,
)
def x_bitmap_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """BITMAP-INDEX ACTIVITY ROLLUP — the roaring-bitmap/audience-segment
    pattern in pure engine integers: each user's active days over a
    63-day window collapse into ONE BIGINT bitset (``bit_or`` of
    ``1 << slot``), after which audience intersections are bitwise AND +
    popcount on 8-byte values instead of day-level joins.  Here: users
    active in BOTH 'click' and 'purchase', histogrammed by number of
    co-active days, with union/click-day mass per bucket.  This is the
    compose-without-rescanning property for set-membership — segment
    overlap matrices at 100 TB become k² mask joins on pre-reduced
    per-user rows, never k² event scans.  The 63-slot bound keeps the
    bitset inside a signed BIGINT (no sign-bit aliasing); the only
    collect-free scalar is the 1-row min-day broadcast.  Output ≤ 64
    histogram rows."""
    e = load_table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)").alias("day"),
    )
    mn = e.agg(F.min("day").alias("min_day"))
    slots = (
        e.crossJoin(F.broadcast(mn))
        .withColumn("slot", F.col("day") - F.col("min_day"))
        .filter(F.col("slot") < 63)
    )
    masks = (
        slots.groupBy("user_id", "event_type")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(slot AS INT)))"
            ).alias("mask")
        )
        .cache()  # feeds both audience filters — one event scan, not two
    )
    a = masks.filter(F.col("event_type") == "click").select(
        "user_id", F.col("mask").alias("ma")
    )
    b = masks.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("mask").alias("mb")
    )
    j = a.join(b, "user_id")
    return (
        j.groupBy(
            F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
            .cast("long")
            .alias("overlap_days")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.bit_count(F.col("ma").bitwiseOR(F.col("mb"))))
            .cast("long")
            .alias("sum_union_days"),
            F.sum(F.bit_count(F.col("ma"))).cast("long").alias("sum_click_days"),
        )
    )


@register(
    "x_golden_record",
    """
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(concat('0x', substr(md5(substr(text, 1, 40)), 1, 15))
                  AS BIGINT) AS ck
      FROM documents
    ), sizes AS (
      SELECT ck, COUNT(*) AS n_members FROM d GROUP BY ck HAVING COUNT(*) > 1
    ), m AS (
      SELECT d.* FROM d JOIN sizes USING (ck)
    ), lang_rank AS (
      SELECT ck, lang, ROW_NUMBER() OVER (
        PARTITION BY ck ORDER BY COUNT(*) DESC, lang) AS rn
      FROM m GROUP BY ck, lang
    ), src_rank AS (
      SELECT ck, source, ROW_NUMBER() OVER (
        PARTITION BY ck ORDER BY COUNT(*) DESC, source) AS rn
      FROM m GROUP BY ck, source
    ), base AS (
      SELECT ck, CAST(MIN(doc_id) AS BIGINT) AS golden_id,
             CAST(MAX(n_chars) AS BIGINT) AS best_n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM m GROUP BY ck
    )
    SELECT b.ck, b.golden_id, b.best_n_chars, b.n_members,
           l.lang AS modal_lang, s.source AS modal_source
    FROM base b
    JOIN (SELECT ck, lang FROM lang_rank WHERE rn = 1) l USING (ck)
    JOIN (SELECT ck, source FROM src_rank WHERE rn = 1) s USING (ck)
    """,
)
def x_golden_record(spark: SparkSession, sf: str) -> DataFrame:
    """GOLDEN-RECORD CONSOLIDATION — the survivorship step after entity
    blocking: records blocked into candidate-duplicate clusters (here the
    40-char text prefix through the cross-engine md5 hash — the blocking
    key under which the corpus's planted near-dup variants collide at
    every SF) are merged into ONE canonical row per cluster: modal lang
    and modal source (most frequent wins, lexicographic tiebreak), the
    longest variant's n_chars, the smallest doc_id as the surviving key.
    Mode-per-group is a count-then-struct-MIN aggregate (``min((-cnt,
    val))``) — two key-partitioned aggregations, never a per-cluster
    window sort over members; all three per-cluster branches join back
    on the cluster key (co-partitioned, AQE-coalesced).  Singleton
    blocks are excluded — consolidation output is exactly the clusters
    where a merge decision existed."""
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        D.portable_hash60(F.substring(F.col("text"), 1, 40)).alias("ck"),
    )
    sizes = (
        d.groupBy("ck")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
    )
    m = d.join(sizes.select("ck"), "ck", "left_semi").cache()

    def _mode(col: str, out: str) -> DataFrame:
        return (
            m.groupBy("ck", col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("ck")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("neg"), F.col(col).alias("v"))
                ).alias("mm")
            )
            .select("ck", F.col("mm.v").alias(out))
        )

    base = m.groupBy("ck").agg(
        F.min("doc_id").cast("long").alias("golden_id"),
        F.max("n_chars").cast("long").alias("best_n_chars"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        base.join(_mode("lang", "modal_lang"), "ck")
        .join(_mode("source", "modal_source"), "ck")
        .select(
            "ck",
            "golden_id",
            "best_n_chars",
            "n_members",
            "modal_lang",
            "modal_source",
        )
    )


@register(
    "x_decile_lift",
    """
    WITH hist AS (
      SELECT n_chars AS score, COUNT(*) AS n,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
      FROM documents GROUP BY n_chars
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_n,
             CAST(SUM(pos) AS BIGINT) AS total_pos
      FROM hist
    ), cum AS (
      SELECT score, n, pos,
             COALESCE(CAST(SUM(n) OVER (ORDER BY score DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS cum_before
      FROM hist
    ), dec AS (
      SELECT 1 + 10 * cum_before // total_n AS decile,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM cum CROSS JOIN tot
      GROUP BY 1
    ), folded AS (
      SELECT decile, n_rows, n_pos,
             CAST(SUM(n_rows) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
             CAST(SUM(n_pos) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
      FROM dec
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_rows, n_pos,
           CAST(n_pos * 1000000 // n_rows AS BIGINT) AS rate_micro,
           cum_n, cum_pos,
           CAST(cum_pos * total_n * 1000000 // (cum_n * total_pos)
                AS BIGINT) AS cum_lift_micro
    FROM folded CROSS JOIN tot
    """,
)
def x_decile_lift(spark: SparkSession, sf: str) -> DataFrame:
    """DECILE LIFT / GAINS TABLE — the model-evaluation ranking audit
    (here: does the n_chars 'score' concentrate English docs in its top
    deciles?): rows ranked by score, cut into population deciles, each
    reporting positive rate and cumulative lift vs the base rate.  The
    100 TB shape is the whole point: NO global row sort or ntile —
    scores first collapse to a bounded value histogram (distinct
    n_chars, constant-order cardinality), deciles derive from cumulative
    counts over that histogram (``1 + 10·cum_before ÷ N``), and the two
    ordered windows run over the histogram (~300 rows) and the decile
    table (≤10 rows).  Ties share a decile (cut points never split a
    score value — documented gains-table semantics).  All ratios are
    nonneg integer micro-units; lift cross-multiplies
    ``cum_pos·N / (cum_n·P)`` exactly (overflow-safe through 100×:
    cum_pos·N·1e6 ≲ 2.5e17 ≪ 2⁶³)."""
    d = load_table(spark, sf, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("is_pos"),
    )
    hist = d.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_pos").cast("long").alias("pos")
    )
    tot = hist.agg(
        F.sum("n").cast("long").alias("total_n"),
        F.sum("pos").cast("long").alias("total_pos"),
    )
    from pyspark.sql.window import Window

    wdesc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(wdesc).cast("long"), F.lit(0))
    )
    dec = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(
            (F.lit(1) + F.expr("10 * cum_before DIV total_n")).alias("decile")
        )
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    folded = dec.withColumn(
        "cum_n", F.sum("n_rows").over(wcum).cast("long")
    ).withColumn("cum_pos", F.sum("n_pos").over(wcum).cast("long"))
    return folded.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("long").alias("decile"),
        "n_rows",
        "n_pos",
        F.expr("n_pos * 1000000 DIV n_rows").cast("long").alias("rate_micro"),
        "cum_n",
        "cum_pos",
        F.expr("cum_pos * total_n * 1000000 DIV (cum_n * total_pos)")
        .cast("long")
        .alias("cum_lift_micro"),
    )


@register(
    "x_rrf_fusion",
    """
    WITH cand AS (
      SELECT term, doc_id, n_chars,
             (length(text) - length(replace(text, term, '')))
               // length(term) AS tf
      FROM documents
      CROSS JOIN (SELECT unnest(['data', 'stream', 'batch']) AS term) t
    ), hits AS (
      SELECT term, doc_id, n_chars, tf FROM cand WHERE tf > 0
    ), ra AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rk
      FROM hits
    ), rb AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM hits
    ), fused AS (
      SELECT COALESCE(a.term, b.term) AS term,
             COALESCE(a.doc_id, b.doc_id) AS doc_id,
             a.rk AS rank_tf, b.rk AS rank_len,
             COALESCE(1000000 // (60 + a.rk), 0)
             + COALESCE(1000000 // (60 + b.rk), 0) AS rrf_micro
      FROM (SELECT * FROM ra WHERE rk <= 20) a
      FULL OUTER JOIN (SELECT * FROM rb WHERE rk <= 20) b
        ON a.term = b.term AND a.doc_id = b.doc_id
    )
    SELECT term, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(rank_tf, 0) AS BIGINT) AS rank_tf,
           CAST(COALESCE(rank_len, 0) AS BIGINT) AS rank_len,
           CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(rk AS BIGINT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                                   ORDER BY rrf_micro DESC, doc_id) AS rk
      FROM fused
    ) WHERE rk <= 10
    """,
)
def x_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """RECIPROCAL RANK FUSION — the standard hybrid-retrieval combiner
    (keyword + semantic lists merged by ``Σ 1/(60+rank)``, here in exact
    integer micro units): per query term, candidates rank once by term
    frequency and once by a second signal (length prior standing in for
    the dense-retriever score — the fusion algebra is the operator),
    top-20 of each list full-outer-merge, fused top-10 wins.  Absent
    ranks contribute 0 (the defining RRF property — presence in both
    lists compounds).  Scale shape: the per-term candidate set prunes to
    tf>0 BEFORE any window (postings, not corpus), both rank windows
    push the small-k top-k limit below their sorts, the merge join is
    two ≤20-row lists per term.  Determinism: doc_id tiebreaks at every
    rank; tf from replace-length arithmetic (no regex, no tokenizer
    divergence)."""
    terms = F.array(F.lit("data"), F.lit("stream"), F.lit("batch"))
    d = (
        load_table(spark, sf, "documents")
        .select("doc_id", "n_chars", "text", F.explode(terms).alias("term"))
        .withColumn(
            "tf",
            (
                (F.length("text") - F.length(F.expr("replace(text, term, '')")))
                / F.length("term")
            ).cast("long"),
        )
        .filter(F.col("tf") > 0)
        .select("term", "doc_id", "n_chars", "tf")
        .cache()
    )
    ra = top_k_per_group(
        d, ["term"], [F.col("tf").desc(), F.col("doc_id").asc()], 20, "rank_tf"
    ).select("term", "doc_id", "rank_tf")
    rb = top_k_per_group(
        d, ["term"], [F.col("n_chars").desc(), F.col("doc_id").asc()], 20, "rank_len"
    ).select("term", "doc_id", "rank_len")
    fused = (
        ra.join(rb, ["term", "doc_id"], "full_outer")
        .withColumn(
            "rrf_micro",
            F.coalesce(
                F.expr("1000000 DIV (60 + rank_tf)").cast("long"), F.lit(0)
            )
            + F.coalesce(
                F.expr("1000000 DIV (60 + rank_len)").cast("long"), F.lit(0)
            ),
        )
        .withColumn("rank_tf", F.coalesce(F.col("rank_tf"), F.lit(0)))
        .withColumn("rank_len", F.coalesce(F.col("rank_len"), F.lit(0)))
    )
    return top_k_per_group(
        fused,
        ["term"],
        [F.col("rrf_micro").desc(), F.col("doc_id").asc()],
        10,
        "fused_rank",
    ).select(
        "term",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank_tf").cast("long").alias("rank_tf"),
        F.col("rank_len").cast("long").alias("rank_len"),
        F.col("rrf_micro").cast("long").alias("rrf_micro"),
        F.col("fused_rank").cast("long").alias("fused_rank"),
    )


@register(
    "x_sax_symbols",
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
    ), framed AS (
      SELECT nat,
             (day - MIN(day) OVER (PARTITION BY nat)) // 30 AS frame,
             x
      FROM daily
    ), paa AS (
      SELECT nat, frame,
             CAST(SUM(x) // COUNT(*) AS BIGINT) AS mean_cents
      FROM framed GROUP BY nat, frame
    ), sym AS (
      SELECT nat, frame,
             substr('abcd',
                    CAST(NTILE(4) OVER (PARTITION BY nat
                                        ORDER BY mean_cents, frame)
                         AS INTEGER), 1) AS s
      FROM paa
    )
    SELECT nat AS n_name,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           string_agg(s, '' ORDER BY frame) AS sax
    FROM sym GROUP BY nat
    """,
)
def x_sax_symbols(spark: SparkSession, sf: str) -> DataFrame:
    """SAX SYMBOLIZATION (Symbolic Aggregate approXimation) of each
    nation's daily revenue series — the time-series indexing/motif-mining
    front end: Piecewise Aggregate Approximation over 30-day frames
    (integer mean cents, exact ``sum ÷ n``), then each frame quantized
    to a 4-letter alphabet by ITS nation's own distribution (NTILE over
    the per-nation frame means, frame-id tiebreak → fully deterministic
    without the Gaussian-breakpoint float table), concatenated in frame
    order into one motif string per nation.  Downstream, equal substrings
    = candidate motifs and string distance lower-bounds series distance —
    the classic reason to symbolize at 100 TB.  Scale shape: raw orders
    reduce to (nation, day) FIRST, frames reduce again (~80 per nation),
    every window runs on the reduced tables along the nation
    partitioning; the ordered concat is an array_sort fold, not a
    driver collect."""
    daily = _nation_daily_cents(spark, sf)
    from pyspark.sql.window import Window

    wp = Window.partitionBy("nat")
    framed = daily.select(
        "nat",
        ((F.col("day") - F.min("day").over(wp)) / 30).cast("long").alias("frame"),
        "x",
    )
    paa = framed.groupBy("nat", "frame").agg(
        F.expr("CAST(SUM(x) DIV COUNT(*) AS BIGINT)").alias("mean_cents")
    )
    wq = Window.partitionBy("nat").orderBy("mean_cents", "frame")
    sym = paa.select(
        "nat",
        "frame",
        F.substring(F.lit("abcd"), F.ntile(4).over(wq), 1).alias("s"),
    )
    return (
        sym.groupBy("nat")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(frame, s))),"
                " p -> p.s), '')"
            ).alias("sax"),
        )
        .select(F.col("nat").alias("n_name"), "n_frames", "sax")
    )


@register(
    "x_ols_normal_eq",
    """
    WITH raw AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
             CAST(SUM(x2 * x2) AS BIGINT) AS sx2x2,
             CAST(SUM(x1 * x2) AS BIGINT) AS sx1x2,
             CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
             CAST(SUM(x2 * y) AS BIGINT) AS sx2y
      FROM raw GROUP BY flag
    ), m AS (
      SELECT flag, n, sx1, sx2, sy,
             CAST(n AS DOUBLE) * CAST(sx1x1 AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) AS a11,
             CAST(n AS DOUBLE) * CAST(sx1x2 AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS a12,
             CAST(n AS DOUBLE) * CAST(sx2x2 AS DOUBLE)
               - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS a22,
             CAST(n AS DOUBLE) * CAST(sx1y AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) AS b1,
             CAST(n AS DOUBLE) * CAST(sx2y AS DOUBLE)
               - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) AS b2
      FROM s
    ), fit AS (
      SELECT flag, n, sx1, sx2, sy, a11, a12, a22, b1, b2,
             a11 * a22 - a12 * a12 AS det
      FROM m
    )
    SELECT flag AS l_returnflag, n,
           CAST(ROUND((b1 * a22 - b2 * a12) / det * 1000000.0, 0)
                AS BIGINT) AS beta_qty_micro,
           CAST(ROUND((b2 * a11 - b1 * a12) / det * 1000000.0, 0)
                AS BIGINT) AS beta_disc_micro,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (b1 * a22 - b2 * a12) / det * CAST(sx1 AS DOUBLE)
                       - (b2 * a11 - b1 * a12) / det * CAST(sx2 AS DOUBLE))
                      / CAST(n AS DOUBLE), 0) AS BIGINT) AS intercept_cents
    FROM fit
    """,
)
def x_ols_normal_eq(spark: SparkSession, sf: str) -> DataFrame:
    """CLOSED-FORM 2-FEATURE OLS via the normal equations — in-engine
    model fitting as ONE aggregation pass: per return-flag group, regress
    line price (cents) on quantity and discount from the nine sufficient
    statistics (n, Σx, Σxx, Σxy), then solve the centered 2×2 system by
    Cramer's rule.  This is how regression actually runs at 100 TB — the
    sufficient statistics are a map-side-combinable aggregate (the model
    'trains' in the same shuffle an AVG would take), and the solve is
    O(1) per group.  Determinism: every Σ is an exact BIGINT; the solve
    is a FIXED chain of IEEE double ops (±,×,÷ are correctly rounded and
    engine-identical) from those integers, emitted through the
    round-half-away micro fixed point — bit-identical cross-engine
    without any iterative fitter.  Degenerate groups (singular det) do
    not occur on this data (both regressors vary within every flag)."""
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x2"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "y"
        ),
    )
    s = li.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("sx2y"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    m = s.select(
        "flag",
        "n",
        "sx1",
        "sx2",
        "sy",
        (dd("n") * dd("sx1x1") - dd("sx1") * dd("sx1")).alias("a11"),
        (dd("n") * dd("sx1x2") - dd("sx1") * dd("sx2")).alias("a12"),
        (dd("n") * dd("sx2x2") - dd("sx2") * dd("sx2")).alias("a22"),
        (dd("n") * dd("sx1y") - dd("sx1") * dd("sy")).alias("b1"),
        (dd("n") * dd("sx2y") - dd("sx2") * dd("sy")).alias("b2"),
    )
    fit = m.withColumn("det", F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"))
    beta1 = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / F.col("det")
    beta2 = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / F.col("det")
    return fit.select(
        F.col("flag").alias("l_returnflag"),
        "n",
        F.round(beta1 * F.lit(1000000.0), 0).cast("long").alias("beta_qty_micro"),
        F.round(beta2 * F.lit(1000000.0), 0).cast("long").alias("beta_disc_micro"),
        F.round(
            (dd("sy") - beta1 * dd("sx1") - beta2 * dd("sx2")) / dd("n"), 0
        )
        .cast("long")
        .alias("intercept_cents"),
    )


@register(
    "x_preference_pairs",
    """
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(concat('0x', substr(md5(substr(text, 1, 40)), 1, 15))
                  AS BIGINT) AS blk
      FROM documents
    ), multi AS (
      SELECT blk FROM d GROUP BY blk HAVING COUNT(*) > 1
    ), m AS (
      SELECT d.* FROM d JOIN multi USING (blk)
    ), ranked AS (
      SELECT blk, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY blk
                                ORDER BY n_chars DESC, doc_id) AS rb,
             ROW_NUMBER() OVER (PARTITION BY blk
                                ORDER BY n_chars ASC, doc_id DESC) AS rw
      FROM m
    ), counts AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM m GROUP BY blk
    )
    SELECT b.blk,
           CAST(b.doc_id AS BIGINT) AS chosen_id,
           CAST(w.doc_id AS BIGINT) AS rejected_id,
           CAST(b.n_chars AS BIGINT) AS chosen_score,
           CAST(w.n_chars AS BIGINT) AS rejected_score,
           CAST(b.n_chars - w.n_chars AS BIGINT) AS margin,
           c.n_candidates
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (blk)
    JOIN counts c USING (blk)
    WHERE b.n_chars > w.n_chars
    """,
)
def x_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """PREFERENCE-PAIR MINING — contrastive (chosen, rejected) pair
    construction for preference/reward training: within each prompt
    block (the 40-char-prefix near-dup family, same blocking as
    `x_golden_record`), the highest-scoring variant becomes `chosen`,
    the lowest `rejected`, with the score margin attached (pairs with
    zero margin are dropped — no learning signal).  The score is the
    deterministic n_chars stand-in; swap in any quality column and the
    shape holds.  Both extremes come from ONE aggregate over the
    members (struct-min with sign tricks: ``min((-score, id))`` is the
    argmax with min-id tiebreak, ``min((score, -id))`` the argmin with
    max-id tiebreak) — never a per-block window sort, so pair mining
    stays a two-shuffle groupBy at 100 TB (the oracle's window form is
    the same argmin/argmax with matching tiebreaks)."""
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        "n_chars",
        D.portable_hash60(F.substring(F.col("text"), 1, 40)).alias("blk"),
    )
    multi = (
        d.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("blk")
    )
    m = d.join(multi, "blk", "left_semi")
    ranked = m.groupBy("blk").agg(
        F.min(
            F.struct((-F.col("n_chars")).alias("ns"), F.col("doc_id").alias("id"))
        ).alias("best"),
        F.min(
            F.struct(F.col("n_chars").alias("s"), (-F.col("doc_id")).alias("nid"))
        ).alias("worst"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        ranked.filter(-F.col("best.ns") > F.col("worst.s"))
        .select(
            "blk",
            F.col("best.id").cast("long").alias("chosen_id"),
            (-F.col("worst.nid")).cast("long").alias("rejected_id"),
            (-F.col("best.ns")).cast("long").alias("chosen_score"),
            F.col("worst.s").cast("long").alias("rejected_score"),
            (-F.col("best.ns") - F.col("worst.s")).cast("long").alias("margin"),
            "n_candidates",
        )
    )


@register(
    "x_leakage_safe_split",
    """
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(concat('0x', substr(md5(substr(text, 1, 40)), 1, 15))
                  AS BIGINT) AS blk
      FROM documents
    ), anchors AS (
      SELECT blk, MIN(doc_id) AS anchor FROM d GROUP BY blk
    ), assigned AS (
      SELECT d.doc_id, d.n_chars, d.blk,
             CASE WHEN CAST(concat('0x', substr(md5('split'
                        || CAST(a.anchor AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 10 < 8
                  THEN 'train' ELSE 'test' END AS split
      FROM d JOIN anchors a USING (blk)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT blk) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM assigned GROUP BY split
    """,
)
def x_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """LEAKAGE-SAFE TRAIN/TEST SPLIT — the contamination-proof
    alternative to row-level splitting: every document inherits the
    split of its NEAR-DUP CLUSTER (40-char-prefix block), decided by
    hashing the cluster's anchor (min doc_id), so two near-identical
    variants can never land on opposite sides of the split — the
    train-on-test-paraphrase leak that row hashing
    (`x_doc_split`) permits by construction.  80/20 via the
    cross-engine md5 hash of the anchor; deterministic, retry-stable,
    engine-identical.  Scale shape: one groupBy for anchors, one
    key-partitioned join back, one final fold — the anchor join stays
    on the block key end-to-end.  By construction
    ``n_clusters('train') + n_clusters('test') = total distinct
    blocks`` (no straddling cluster — the audited invariant)."""
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        "n_chars",
        D.portable_hash60(F.substring(F.col("text"), 1, 40)).alias("blk"),
    )
    anchors = d.groupBy("blk").agg(F.min("doc_id").alias("anchor"))
    assigned = d.join(anchors, "blk").withColumn(
        "split",
        F.when(
            F.pmod(
                D.portable_hash60(
                    F.concat(F.lit("split"), F.col("anchor").cast("string"))
                ),
                F.lit(10),
            )
            < 8,
            F.lit("train"),
        ).otherwise(F.lit("test")),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("blk").alias("n_clusters"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )


@register(
    "x_rolling_median",
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
    ), win AS (
      SELECT nat, day, x,
             list(x) OVER (PARTITION BY nat ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
      FROM daily
    )
    SELECT nat AS n_name, day, x,
           CAST(len(w) AS BIGINT) AS w_size,
           CAST(list_sort(w)[CAST((len(w) + 1) // 2 AS INTEGER)]
                AS BIGINT) AS med7_cents
    FROM win
    """,
)
def x_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLING MEDIAN (trailing 7-day window) of each nation's daily
    revenue — the robust smoother that survives the outlier days a
    rolling MEAN chases (`w_moving_avg` is the mean twin; `x_ewma_smooth`
    the exponential one).  Exact small-frame median: the 7-element frame
    materializes as an array (collect over a ROWS frame), sorts, and
    takes the lower median — O(k log k) per row with k bounded by the
    frame, the right exact-median shape when the frame is small and the
    series is long (quantile sketches are for the transposed case).
    Scale shape: raw orders reduce to (nation, day) FIRST; the window
    runs on the reduced series along the nation partitioning.  All
    integer cents — array_sort and 1-based indexing agree across
    engines."""
    daily = _nation_daily_cents(spark, sf)
    from pyspark.sql.window import Window

    w = Window.partitionBy("nat").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        F.col("nat").alias("n_name"),
        "day",
        "x",
        F.size(F.collect_list("x").over(w)).cast("long").alias("w_size"),
        F.element_at(
            F.array_sort(F.collect_list("x").over(w)),
            ((F.size(F.collect_list("x").over(w)) + 1) / 2).cast("int"),
        )
        .cast("long")
        .alias("med7_cents"),
    )


@register(
    "x_id_completeness_audit",
    """
    WITH feeds AS (
      SELECT 'raw' AS feed, o_orderkey AS id FROM orders
      UNION ALL
      SELECT 'after_loss', o_orderkey FROM orders
      WHERE CAST(concat('0x', substr(md5('loss'
                 || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 97 <> 0
    ), b AS (
      SELECT feed, id // 4096 AS bucket,
             COUNT(*) AS present,
             MIN(id) AS lo,
             MAX(id) AS hi
      FROM feeds GROUP BY feed, bucket
    )
    SELECT feed,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * 4096 AS BIGINT) AS bucket_start,
           CAST(present AS BIGINT) AS present,
           CAST(4096 - present AS BIGINT) AS missing,
           CAST(lo AS BIGINT) AS first_present,
           CAST(hi AS BIGINT) AS last_present
    FROM b WHERE present < 4096
    """,
)
def x_id_completeness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """ID-SPACE COMPLETENESS AUDIT — the CDC/backfill integrity check
    ("did every sequence number arrive?") in its SCALABLE form: instead
    of a global lead()-over-everything window (a single-partition sort at
    100 TB), the id space folds into fixed 4096-wide buckets with ONE
    groupBy; a bucket holding fewer than 4096 ids has gaps, and only
    those buckets are reported (present/missing counts + the observed id
    range to steer a targeted re-pull).  Two feeds run through the audit
    side by side: the intact id stream (orderkeys are dense, so only the
    ragged tail bucket reports — the all-clear answer) and a
    deterministically damaged copy (~1% of ids dropped by hash), where
    EVERY bucket reports its loss — the detection-power witness.  One
    shuffle, output bounded by 2 × id-range/4096."""
    o = load_table(spark, sf, "orders").select(F.col("o_orderkey").alias("id"))
    damaged = o.filter(
        F.pmod(
            D.portable_hash60(F.concat(F.lit("loss"), F.col("id").cast("string"))),
            F.lit(97),
        )
        != 0
    )
    feeds = o.withColumn("feed", F.lit("raw")).unionAll(
        damaged.withColumn("feed", F.lit("after_loss"))
    )
    b = feeds.groupBy("feed", F.expr("id DIV 4096").alias("bucket")).agg(
        F.count(F.lit(1)).alias("present"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )
    return b.filter(F.col("present") < 4096).select(
        "feed",
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") * 4096).cast("long").alias("bucket_start"),
        F.col("present").cast("long").alias("present"),
        (F.lit(4096) - F.col("present")).cast("long").alias("missing"),
        F.col("lo").cast("long").alias("first_present"),
        F.col("hi").cast("long").alias("last_present"),
    )


_LATERAL_TOPK_SQL = """
    SELECT n.n_name, t.c_custkey, t.bal_cents
    FROM nation n,
    LATERAL (SELECT c_custkey,
                    CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bal_cents
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY bal_cents DESC, c_custkey LIMIT 2) t
"""


@register("f_lateral_topk", _LATERAL_TOPK_SQL)
def f_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated-subquery witness (the SQL-2016 lateral join,
    Spark 3.2+): per-nation top-2 customers by balance expressed as a
    correlated ORDER BY…LIMIT subquery — the declarative twin of the
    window-based `w_topk_per_group`, and the form ad-hoc SQL users reach
    for first.  The same SQL text runs on both engines.  Catalyst
    DECORRELATES the lateral into a join + per-key limit rather than
    re-executing the inner query per outer row — which is exactly why
    the construct stays usable at 100 TB (a true nested-loop lateral
    would be |nation| scans of customer)."""
    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_TOPK_SQL)


_RECURSIVE_BOM_SQL = """
    WITH RECURSIVE anc(node, anc) AS (
      SELECT p_partkey, p_partkey FROM part
      UNION ALL
      SELECT a.node, a.anc // 10 FROM anc a WHERE a.anc >= 10
    )
    SELECT anc.anc AS ancestor,
           CAST(COUNT(*) AS BIGINT) AS n_descendants,
           CAST(SUM(CAST(ROUND(p.p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM anc JOIN part p ON anc.node = p.p_partkey
    WHERE anc.anc < 100
    GROUP BY anc.anc
"""


@register("x_recursive_bom", _RECURSIVE_BOM_SQL)
def x_recursive_bom(spark: SparkSession, sf: str) -> DataFrame:
    """RECURSIVE CTE witness (Spark 4 `WITH RECURSIVE`, the SQL-surface
    feature classic warehouse engines gate hierarchy work on): a
    bill-of-materials-style rollup over the implicit digit-chopping part
    hierarchy (parent = key/10) — each part's revenue accrues to every
    ancestor, computed by a genuinely recursive ancestor expansion, NOT a
    hand-unrolled union.  The recursion step is monotonically decreasing
    (`anc/10`), so it terminates at the hierarchy depth (≤5 levels) with
    linear row expansion — the safe recursive shape; cyclic graphs need
    the hop-capped form (`x_bfs_hops` is the iterative equivalent).
    Identical SQL text runs on both engines via the `spark.sql`
    front-end; integer division and cent arithmetic keep it
    bit-identical.  Output bounded to 2-digit ancestors."""
    part = load_table(spark, sf, "part")
    part.createOrReplaceTempView("part")
    # One divergence in SQL dialect: integer floor division is `//` in
    # DuckDB (plain `/` promotes to DOUBLE there) and `DIV` in Spark —
    # the only token swapped between the two texts.
    return spark.sql(_RECURSIVE_BOM_SQL.replace("a.anc // 10", "a.anc DIV 10"))


