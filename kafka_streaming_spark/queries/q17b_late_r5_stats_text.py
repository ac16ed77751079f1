"""round-5+ batch, part 2 of the q17 split (round 10; VERDICT r9 ask
#4 — the r9 monolith split left q17 at 6,846 lines): survival/series
analysis, keyword extraction, clustering, multimodal histograms, scan
formats, ML-ish folds.  Mechanical move: query bodies are verbatim;
registration order is preserved by the import order in
``kafka_streaming_spark/queries/__init__.py``, so ``REGISTRY`` /
``DRIVER_PRIORITY`` iteration is unchanged."""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries.q15b_misc_graph_part2 import (  # noqa: F401
    _nation_daily_cents,
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
    Ŝ(t) = Π over event times ≤ t of (1 − dᵢ/nᵢ); the ordered product is
    a per-priority ``np.cumprod`` in an Arrow grouped-map pass — the SAME
    left-to-right sequence of one correctly-rounded IEEE divide +
    multiply per event time from exact BIGINT (d, n), bit-identical to
    the oracle's recursive-CTE unroll, emitted as a floored nano-unit
    integer.  (r12: this replaced an array-``aggregate`` fold whose
    per-step ``array_append`` rebuilt the accumulator — O(k²) copies for
    k≈3,300 event times per priority, 3s of the 4.7s query; the
    grouped-map pass is O(k) and reuses the window's partitioning.)
    Scale shape: order volume reduces to per-(priority, day) counts in
    two shuffles; the at-risk window and the cumprod run on the
    ≤ priorities × duration-range rows (calendar-bounded constant)."""
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

    def _km_fold(pdf):
        import numpy as np

        pdf = pdf.sort_values("t")
        n = pdf["n"].to_numpy()
        d = pdf["d"].to_numpy()
        # (n - d) / n: int64 true-divide = cast-to-double + one IEEE
        # divide per element, exactly the oracle's per-step expression;
        # cumprod is the same left-to-right one-multiply-per-step chain
        # as the recursive CTE (cumulative ops have no pairwise variant —
        # every prefix is emitted, so the rounding sequence is forced).
        pdf["s"] = np.cumprod((n - d) / n)
        return pdf

    km = risk.groupBy("prio").applyInPandas(
        _km_fold, "prio string, t bigint, d bigint, n bigint, s double"
    )
    return km.select(
        F.col("prio").alias("o_orderpriority"),
        F.col("t").alias("duration_days"),
        F.col("n").alias("n_at_risk"),
        F.col("d").alias("d_events"),
        F.expr("CAST(FLOOR(s * 1000000000.0) AS BIGINT)").alias("survival_nano"),
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


