"""round-5 late batch: eval, privacy, graph stats, embeddings — split from the monolithic queries.py (round 9,
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
# Round-5 late batch: classification evaluation, privacy l-diversity, graph
# statistics, embedding diagnostics
# ===========================================================================


@register(
    "x_langid_confusion",
    """
    WITH h AS (
      SELECT lang AS actual,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) AS h_en,
             len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein)\\b')) AS h_de,
             len(regexp_extract_all(lower(text), '\\b(el|la|los|que|de)\\b')) AS h_es,
             len(regexp_extract_all(lower(text), '\\b(le|la|les|et|des)\\b')) AS h_fr
      FROM documents
    ), p AS (
      SELECT actual,
             CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                  WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
                  WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                  ELSE 'fr' END AS pred
      FROM h
    ), a AS (
      SELECT actual AS lang, COUNT(*) AS n_actual,
             SUM(CASE WHEN actual = pred THEN 1 ELSE 0 END) AS tp
      FROM p GROUP BY actual
    ), pr AS (
      SELECT pred AS lang, COUNT(*) AS n_pred FROM p GROUP BY pred
    )
    SELECT COALESCE(a.lang, pr.lang) AS lang,
           CAST(COALESCE(n_actual, 0) AS BIGINT) AS n_actual,
           CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
           CAST(COALESCE(tp, 0) AS BIGINT) AS tp,
           CAST(CASE WHEN COALESCE(n_pred, 0) = 0 THEN 0
                     ELSE COALESCE(tp, 0) * 1000000 // n_pred END AS BIGINT)
             AS precision_micro,
           CAST(CASE WHEN COALESCE(n_actual, 0) = 0 THEN 0
                     ELSE COALESCE(tp, 0) * 1000000 // n_actual END AS BIGINT)
             AS recall_micro,
           CAST(COALESCE(tp, 0) * 2000000
                // (COALESCE(n_actual, 0) + COALESCE(n_pred, 0)) AS BIGINT)
             AS f1_micro
    FROM a FULL JOIN pr ON a.lang = pr.lang
    """,
)
def x_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """CLASSIFIER EVALUATION (new family): per-class confusion-matrix
    metrics for the heuristic language identifier (`x_doc_lang_id`)
    scored against the documents table's ground-truth ``lang`` column —
    precision / recall / F1 in integer micro-units per class.  The
    corpus contains a class (`zh`) the 4-language marker heuristic can
    never predict, so the matrix exercises the zero-predicted edge
    (precision guard) as well as the never-actual edge (`und`, recall
    guard).  Shape: one pass computes (actual, pred) per doc; two
    class-keyed aggregates (cached common input) meet in a tiny full
    outer join — the per-class metric derivation touches |classes|
    rows, never |docs|, so the eval costs one scan + two bounded
    shuffles at any corpus size."""
    d = load_table(spark, sf, "documents").select(
        F.col("lang").alias("actual"), T.lang_id(F.col("text")).alias("pred")
    )
    p = d.cache()  # feeds both class-keyed aggregates
    a = p.groupBy(F.col("actual").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_actual"),
        F.sum((F.col("actual") == F.col("pred")).cast("long")).alias("tp"),
    )
    pr = p.groupBy(F.col("pred").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return a.join(pr, "lang", "full").selectExpr(
        "lang",
        "CAST(coalesce(n_actual, 0) AS BIGINT) AS n_actual",
        "CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred",
        "CAST(coalesce(tp, 0) AS BIGINT) AS tp",
        "CAST(CASE WHEN coalesce(n_pred, 0) = 0 THEN 0"
        "     ELSE coalesce(tp, 0) * 1000000 DIV n_pred END AS BIGINT)"
        " AS precision_micro",
        "CAST(CASE WHEN coalesce(n_actual, 0) = 0 THEN 0"
        "     ELSE coalesce(tp, 0) * 1000000 DIV n_actual END AS BIGINT)"
        " AS recall_micro",
        "CAST(coalesce(tp, 0) * 2000000"
        "     DIV (coalesce(n_actual, 0) + coalesce(n_pred, 0)) AS BIGINT)"
        " AS f1_micro",
    )


@register(
    "x_gini_impurity",
    """
    WITH s AS (
      SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
    ), c AS (
      SELECT column_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM s GROUP BY column_name, v
    )
    SELECT column_name,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST((SUM(cnt) * SUM(cnt) - SUM(cnt * cnt)) * 1000000
                // (SUM(cnt) * SUM(cnt)) AS BIGINT) AS impurity_micro
    FROM c GROUP BY column_name
    """,
)
def x_gini_impurity(spark: SparkSession, sf: str) -> DataFrame:
    """DATA-PROFILING Gini impurity per categorical column — the
    class-balance diagnostic (1 - Σp²) behind decision-tree splits and
    label-skew audits, in integer micro-units: ``(N² - Σc²)·10⁶ // N²``
    over exact class counts (no floats anywhere).  Distinct from
    `x_gini` (Lorenz wealth concentration): impurity measures categorical
    balance, not numeric inequality.  One unpivoted scan over the three
    profiled columns, one count-per-class shuffle, one per-column
    reduce; output bounded by the column count.  Numeric headroom: the
    N² and Σc² moments accumulate in DECIMAL(38,0) and the final ratio
    uses exact decimal DIV (mirroring the oracle's HUGEINT ``//``), so
    the bound is ~1e38 on N²·10⁶ — N up to ~1e16 rows per column, far
    past any real corpus (DuckDB side is HUGEINT-exact already)."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = (
        o.select(F.lit("o_orderstatus").alias("column_name"), F.col("o_orderstatus").alias("v"))
        .unionAll(o.select(F.lit("o_orderpriority"), F.col("o_orderpriority")))
        .unionAll(c.select(F.lit("c_mktsegment"), F.col("c_mktsegment")))
    )
    cnt = s.groupBy("column_name", "v").agg(F.count(F.lit(1)).alias("cnt"))
    # DECIMAL(38,0) moments + EXACT integral division: the old int64 path
    # ((n2-Σcnt²)·1e6 as bigint) wrapped near 10x (n = orders grain →
    # 1.5e7 rows at 100×, n2 = 2.25e14, ×1e6 = 2.25e20), and the old
    # double-divide could in principle truncate 1-off against the
    # oracle's exact HUGEINT `//` whenever the true ratio sits within a
    # double ulp of an integer — decimal DIV mirrors `//` exactly at
    # every scale.
    n2 = F.sum("cnt").cast("decimal(38,0)") * F.sum("cnt").cast("decimal(38,0)")
    ssq = F.sum((F.col("cnt") * F.col("cnt")).cast("decimal(38,0)"))
    g = cnt.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("cnt").alias("n_rows"),
        (n2 - ssq).alias("__num"),
        n2.alias("__n2"),
    )
    return g.select(
        "column_name",
        "n_classes",
        "n_rows",
        F.expr("CAST((__num * 1000000) DIV __n2 AS BIGINT)").alias("impurity_micro"),
    )


@register(
    "x_l_diversity",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS sens
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT sens) AS BIGINT) AS distinct_sensitive,
           CAST(CASE WHEN COUNT(DISTINCT sens) >= 3 THEN 1 ELSE 0 END AS BIGINT)
             AS l_diverse
    FROM s GROUP BY c_nationkey, c_mktsegment
    """,
)
def x_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """L-DIVERSITY audit (l=3) — the privacy check k-anonymity
    (`x_k_anonymity`) famously misses: a quasi-identifier group can be
    k-large yet leak the sensitive attribute if every member shares one
    value.  Per QI group (nation × segment): size, number of distinct
    sensitive values (bucketed account balance), and the l-diversity
    flag.  One groupBy with a distinct-count; output bounded by the QI
    domain product at any scale."""
    c = load_table(spark, sf, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    n_sens = F.countDistinct("sens")
    return (
        c.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            n_sens.alias("distinct_sensitive"),
            (n_sens >= 3).cast("long").alias("l_diverse"),
        )
    )


@register(
    "x_degree_histogram",
    """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey + 100000 AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), ends AS (
      SELECT u AS src FROM pairs UNION ALL SELECT v FROM pairs
    ), deg AS (
      SELECT src, COUNT(*) AS degree FROM ends GROUP BY src
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(src) AS BIGINT) AS sum_node
    FROM deg GROUP BY degree
    """,
)
def x_degree_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """DEGREE DISTRIBUTION of the supplier-customer trade graph — the
    first diagnostic run before any graph algorithm (it decides salting,
    k-core thresholds, and whether pagerank needs skew handling).  Edge
    endpoints → count per node → count per degree; `sum_node` makes the
    node partition a value-checked witness, not just a count.  Two
    key-hashed shuffles after the distinct edge build; output bounded by
    the max degree."""
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
    ends = pairs.select(F.col("u").alias("src")).unionAll(
        pairs.select(F.col("v").alias("src"))
    )
    deg = ends.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("src").alias("sum_node"),
    )


@register(
    "x_assortativity",
    """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey + 100000 AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT u AS src, v AS dst FROM pairs UNION ALL SELECT v, u FROM pairs
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), j AS (
      SELECT a.d AS x, b.d AS y
      FROM edges e JOIN deg a ON e.src = a.src JOIN deg b ON e.dst = b.src
    ), sums AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS assortativity_micro
    FROM sums
    """,
)
def x_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """DEGREE ASSORTATIVITY of the trade graph: Pearson correlation of
    endpoint degrees over all directed edges — do hubs trade with hubs
    (positive) or with the periphery (negative, the expected sign for a
    bipartite supplier-customer graph)?  All six moment sums accumulate
    EXACTLY (Spark decimal(38,0) / DuckDB HUGEINT — int64 would overflow
    n·Σxy past sf≈1), then one fixed chain of IEEE double ops (two
    casts, mul, sqrt, div, round) produces a bit-identical micro-unit
    result, the same float-determinism discipline as `x_ols_normal_eq`.
    Cost: the degree build plus ONE pairs⋈deg⋈deg co-keyed join — the
    bipartite u/v namespaces are disjoint, so each direction's moment
    sums are the mirror of the other's and the physical join runs over
    the |pairs| distinct edges, not the 2·|pairs| doubled edge list the
    oracle (and the semantics) describe: n = 2·cnt, Σx = Σy =
    Σ(dᵤ+dᵥ), Σxy doubles, Σx² = Σy² = Σ(dᵤ²+dᵥ²)."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 100000).alias("v"),
        )
        .distinct()
        .cache()  # feeds both degree builds AND the pair join
    )
    deg_u = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("x"))
    deg_v = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("y"))
    j = pairs.join(deg_u, "u").join(deg_v, "v").select("x", "y")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    half = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"),
        F.sum(dec(F.col("x") + F.col("y"))).alias("s1"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("s11"),
        F.sum(dec(F.col("x") * F.col("x") + F.col("y") * F.col("y"))).alias("s2"),
    )
    sums = half.select(
        (F.col("cnt") * 2).alias("n"),
        F.col("s1").alias("sx"),
        F.col("s1").alias("sy"),
        (F.col("s11") * 2).alias("sxy"),
        F.col("s2").alias("sxx"),
        F.col("s2").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(num / F.sqrt(varx * vary) * 1000000.0, 0)
        .cast("long")
        .alias("assortativity_micro"),
    )


@register(
    "x_pair_distance_hist",
    """
    WITH v AS (
      SELECT vec_id, vec_id % 25 AS blk,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, 64),
                   i -> (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i]))),
               (acc, x) -> acc + x) AS dist2
      FROM v a JOIN v b ON a.blk = b.blk AND a.vec_id < b.vec_id
    )
    SELECT CAST(floor(CAST(ROUND(dist2 * 1000000.0) AS BIGINT) / 1000000.0 * 4.0)
                AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(id_a + id_b) AS BIGINT) AS sum_ids
    FROM pairs GROUP BY bin
    """,
)
def x_pair_distance_hist(spark: SparkSession, sf: str) -> DataFrame:
    """EMBEDDING-SPACE DIAGNOSTIC: histogram of pairwise squared-L2
    distances over block-sampled pairs — the curve you read before
    picking an ANN/SemDedup threshold (for L2-normalized vectors dist²
    ∈ [0,4]; bin width 0.25).  Pair sampling is BLOCKED, not all-pairs:
    vectors pair only within `vec_id % B` blocks, so pair count is
    B·(N/B)² — B is the sampling-rate knob and scales with N to hold
    expected pairs-per-block constant on a 100 TB corpus.  The per-pair
    fold is a left-to-right `zip_with`/`aggregate` chain, bit-identical
    to the DuckDB `list_reduce` replica; 6-digit rounding before binning
    keeps bucket edges engine-stable."""
    emb = load_table(spark, sf, "embeddings")
    # cached: the projected vectors feed both sides of the blocked pair
    # join — uncached, the array decode runs twice
    v = emb.select(
        "vec_id",
        (F.col("vec_id") % 25).alias("blk"),
        S.as_double(F.col("embedding")).alias("vec"),
    ).cache()
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("blk"), F.col("vec").alias("va")
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("blk"), F.col("vec").alias("vb")
    )
    pairs = a.join(b, ["blk"]).filter(F.col("id_a") < F.col("id_b"))
    dist2 = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    binned = pairs.select(
        "id_a",
        "id_b",
        F.floor(_round_fixed(dist2, 6) * 4.0).cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("sum_ids"),
    )


@register(
    "x_trade_flow_imbalance",
    """
    WITH flow AS (
      SELECT cn.n_name AS from_nation, sn.n_name AS to_nation,
             SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)))
               // 10000 AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
    )
    SELECT least(from_nation, to_nation) AS nation_a,
           greatest(from_nation, to_nation) AS nation_b,
           CAST(SUM(CASE WHEN from_nation < to_nation THEN rev ELSE 0 END)
                AS BIGINT) AS flow_ab,
           CAST(SUM(CASE WHEN from_nation > to_nation THEN rev ELSE 0 END)
                AS BIGINT) AS flow_ba,
           CAST(abs(SUM(CASE WHEN from_nation < to_nation THEN rev ELSE 0 END)
                    - SUM(CASE WHEN from_nation > to_nation THEN rev ELSE 0 END))
                * 1000000
                // (SUM(CASE WHEN from_nation < to_nation THEN rev ELSE 0 END)
                    + SUM(CASE WHEN from_nation > to_nation THEN rev ELSE 0 END))
                AS BIGINT) AS imbalance_micro
    FROM flow
    WHERE from_nation <> to_nation
    GROUP BY 1, 2
    """,
)
def x_trade_flow_imbalance(spark: SparkSession, sf: str) -> DataFrame:
    """TRADE-FLOW IMBALANCE MATRIX: directed customer-nation → supplier-
    nation revenue flows folded into unordered pairs with a micro-unit
    imbalance ratio |f_ab − f_ba| / (f_ab + f_ba) — the bilateral-
    imbalance analysis q7 computes for ONE nation pair, generalized to
    the full matrix in a single pass (no flow self-join: least/greatest
    pair folding inside one groupBy).  Revenue is discounted exact
    integer arithmetic (cent·percent units) truncated to whole dollars
    BEFORE the ratio, so the 10⁶ product stays far inside int64 at any
    realistic scale.  The two nation joins broadcast (constant 25-row
    dims); the fact-side joins shuffle on their keys; output is bounded
    by the nation-pair domain (≤300 rows) forever."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    rev_term = F.round(F.col("l_extendedprice") * 100.0, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100.0, 0).cast("long")
    )
    flow = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("from_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("to_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy("from_nation", "to_nation")
        .agg(F.sum(rev_term).alias("rev_raw"))
        .selectExpr("from_nation", "to_nation", "rev_raw DIV 10000 AS rev")
        .filter(F.col("from_nation") != F.col("to_nation"))
    )
    ab = F.sum(F.when(F.col("from_nation") < F.col("to_nation"), F.col("rev")).otherwise(F.lit(0)))
    ba = F.sum(F.when(F.col("from_nation") > F.col("to_nation"), F.col("rev")).otherwise(F.lit(0)))
    folded = (
        flow.groupBy(
            F.least("from_nation", "to_nation").alias("nation_a"),
            F.greatest("from_nation", "to_nation").alias("nation_b"),
        )
        .agg(ab.alias("flow_ab"), ba.alias("flow_ba"))
    )
    return folded.selectExpr(
        "nation_a",
        "nation_b",
        "CAST(flow_ab AS BIGINT) AS flow_ab",
        "CAST(flow_ba AS BIGINT) AS flow_ba",
        "CAST(abs(flow_ab - flow_ba) * 1000000 DIV (flow_ab + flow_ba) AS BIGINT)"
        " AS imbalance_micro",
    )


@register(
    "x_weighted_shortest_path",
    """
    WITH pairs AS (
      SELECT l_suppkey AS u, o_custkey + 100000 AS v,
             MIN(CAST(floor(epoch_ms(l_shipdate) / 86400000.0) AS BIGINT)
                 - CAST(floor(epoch_ms(o_orderdate) / 86400000.0) AS BIGINT)) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT u AS src, v AS dst, w FROM pairs
      UNION ALL SELECT v, u, w FROM pairs
    ), d0 AS (
      SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
      FROM edges WHERE src < 3
    ), d1 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT * FROM d0
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM edges e JOIN d0 d ON e.src = d.node
      ) GROUP BY node
    ), d2 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT * FROM d1
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM edges e JOIN d1 d ON e.src = d.node
      ) GROUP BY node
    ), d3 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT * FROM d2
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM edges e JOIN d2 d ON e.src = d.node
      ) GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d3 WHERE node < 100000
    """,
)
def x_weighted_shortest_path(spark: SparkSession, sf: str) -> DataFrame:
    """WEIGHTED SHORTEST PATHS (3-round Bellman-Ford,
    :func:`kafka_streaming_spark.functions.graph.bellman_ford`): trade-
    graph distances from the two lowest-key suppliers, edge weight =
    minimum order→ship latency in whole days between a supplier and a
    customer — "how quickly can goods flow from these suppliers to any
    peer through shared customers".  Output restricted to supplier-side
    nodes, which PROVABLY settle by round 2 on a bipartite graph with
    supplier seeds (round 3 relaxes supplier←customer edges against
    customer distances that round 2 could not have changed: customers
    only improve via non-seed suppliers, which round 1 never reaches) —
    so the engine runs TWO relaxations while the oracle's three-round
    unroll certifies the fixpoint equality.  The argument is structural
    (which side each round can touch), NOT sign-dependent — it survives
    the negative edge weights this synthetic data actually contains
    (ship-before-order rows); customer-side nodes do NOT settle, which
    is why the output boundary strictly excludes them.  Bounded by
    |suppliers|.
    Completes the shortest-path family: BFS counts hops, this relaxes
    true weights — every round one edges⋈dist equi-join + one
    min-groupBy, both node-key-partitioned, no driver state."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    day = lambda col: F.floor(F.unix_millis(col) / 86400000.0).cast("long")  # noqa: E731
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 100000).alias("v"),
        )
        .agg(F.min(day(F.col("l_shipdate")) - day(F.col("o_orderdate"))).alias("w"))
    )
    edges = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(pairs.select(F.col("v"), F.col("u"), F.col("w")))
    seeds = edges.filter(F.col("src") < 3).select(F.col("src").alias("node"))
    dist = G.bellman_ford(edges, seeds, rounds=2)
    return dist.filter(F.col("node") < 100000).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


@register(
    "x_feature_hashing",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) % 64
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok GROUP BY doc_id, bucket
    """,
)
def x_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """HASHING-TRICK FEATURIZATION: tokens hashed into a fixed 64-bucket
    vocabulary-free feature space, emitted as sparse (doc, bucket,
    count) rows — the classic featurizer for linear models / similarity
    sketches when a vocabulary pass is too expensive (no collect, no
    fit step, stable across corpus growth).  Uses the cross-engine
    md5-derived `portable_hash60` family so bucket assignment is
    bit-identical in the oracle; production would swap in `xxhash64`
    (one JVM intrinsic per token).  One explode + one groupBy whose key
    space is bounded by docs × 64; the doc_id bound keeps the CHECKED
    output small while the shape is corpus-size-linear."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    return tok.groupBy(
        "doc_id",
        (D.portable_hash60(F.col("token")) % 64).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "x_modularity",
    """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs
    ), lab AS (
      SELECT p.u, p.c, s.s_nationkey AS cu, cust.c_nationkey AS cc
      FROM pairs p
      JOIN supplier s ON p.u = s.s_suppkey
      JOIN customer cust ON p.c = cust.c_custkey
    ), internal AS (
      SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS n_internal_edges
      FROM lab WHERE cu = cc GROUP BY cu
    ), du AS (
      SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS d FROM lab GROUP BY cu
    ), dc AS (
      SELECT cc AS community, CAST(COUNT(*) AS BIGINT) AS d FROM lab GROUP BY cc
    ), degsum AS (
      SELECT community, CAST(SUM(d) AS BIGINT) AS degree_sum
      FROM (SELECT * FROM du UNION ALL SELECT * FROM dc) GROUP BY community
    )
    SELECT n.n_name AS community,
           CAST(COALESCE(i.n_internal_edges, 0) AS BIGINT) AS n_internal_edges,
           g.degree_sum,
           CAST(4 * m.m * COALESCE(i.n_internal_edges, 0)
                - g.degree_sum * g.degree_sum AS BIGINT) AS term_num,
           CAST(4 * m.m * m.m AS BIGINT) AS term_den
    FROM degsum g
    CROSS JOIN m
    LEFT JOIN internal i ON g.community = i.community
    JOIN nation n ON g.community = n.n_nationkey
    """,
)
def x_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """GRAPH MODULARITY terms for the nation partition of the trade graph
    — the community-quality score Q = Σ_c [e_c/m − (d_c/2m)²] that
    grades clusterings like `x_label_propagation`'s.  Emitted as EXACT
    per-community integers (internal-edge count, degree sum, and the
    common-denominator term 4m·e_c − d_c² over 4m²) — no division
    anywhere, so no negative-truncation hazard (terms are signed) and
    the reader sums terms/4m² for Q.  Shape: one distinct edge build
    (cached — it feeds the m scalar and the labeling), two bounded
    dimension joins to label endpoints, then community-keyed counts;
    the 1-row m joins in as a broadcast.  Output bounded by |nations|."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("u"), F.col("o_custkey").alias("c"))
        .distinct()
        .cache()  # feeds the m scalar AND the endpoint labeling
    )
    m = pairs.agg(F.count(F.lit(1)).alias("m"))
    lab = (
        pairs.join(s, F.col("u") == F.col("s_suppkey"))
        .join(cust, F.col("c") == F.col("c_custkey"))
        .select(F.col("s_nationkey").alias("cu"), F.col("c_nationkey").alias("cc"))
    )
    internal = (
        lab.filter(F.col("cu") == F.col("cc"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_internal_edges"))
    )
    du = lab.groupBy(F.col("cu").alias("community")).agg(F.count(F.lit(1)).alias("d"))
    dc = lab.groupBy(F.col("cc").alias("community")).agg(F.count(F.lit(1)).alias("d"))
    degsum = (
        du.unionAll(dc)
        .groupBy("community")
        .agg(F.sum("d").alias("degree_sum"))
    )
    out = (
        degsum.crossJoin(F.broadcast(m))
        .join(internal, "community", "left")
        .join(F.broadcast(n), F.col("community") == F.col("n_nationkey"))
    )
    e_c = F.coalesce(F.col("n_internal_edges"), F.lit(0))
    return out.select(
        F.col("n_name").alias("community"),
        e_c.cast("long").alias("n_internal_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        (4 * F.col("m") * e_c - F.col("degree_sum") * F.col("degree_sum"))
        .cast("long")
        .alias("term_num"),
        (4 * F.col("m") * F.col("m")).cast("long").alias("term_den"),
    )


@register(
    "x_zscore_normalize",
    """
    WITH x AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS cents
      FROM customer
    ), st AS (
      -- s and q stay HUGEINT (no BIGINT downcast): n*q - s*s wraps
      -- int64 already at the 10x replica; the Spark side accumulates in
      -- DECIMAL(38,0) for the same headroom.  Only the z_micro OUTPUT
      -- is BIGINT.
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS s,
             SUM(cents * cents) AS q
      FROM x GROUP BY c_nationkey
    )
    SELECT x.c_custkey,
           x.c_nationkey,
           CAST(ROUND(CAST(st.n * x.cents - st.s AS DOUBLE)
                      / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS z_micro
    FROM x JOIN st ON x.c_nationkey = st.c_nationkey
    """,
)
def x_zscore_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Z-SCORE STANDARDIZATION per group — the classic feature scaler,
    beside `x_quantile_normalize`'s rank form: every customer's account
    balance standardized against its nation's population mean/stddev as
    (n·x − S)/√(nQ − S²) in micro-units.  The three moment sums are
    exact integers (cents) accumulated in DECIMAL(38,0) — n·Q wraps
    int64 already at the 10x customer replica, the oracle's HUGEINT
    sums carry the same headroom — then
    ONE fixed IEEE chain (sub, sqrt, div, round) per row — transcendental-
    free and bit-identical cross-engine.  One groupBy to ≤25 stat rows,
    explicitly broadcast back (constant-bounded dimension) — the scan is
    the only data-sized pass."""
    x = load_table(spark, sf, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    # DECIMAL(38,0) accumulation: per-row cents² fits int64 (≤1.2e12) but
    # n·q ≈ n²·avg(cents²) wraps int64 already at the 10x customer replica
    # (n ≈ 6000/nation → 1.4e19 > 2^63); the oracle's HUGEINT sums need
    # this headroom mirrored.  Same doubles out at every non-wrapping
    # scale (the cast-to-double chain is unchanged).
    st = x.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("q"),
    )
    j = x.join(F.broadcast(st), "c_nationkey")
    num = (F.col("n") * F.col("cents") - F.col("s")).cast("double")
    den = F.sqrt((F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double"))
    return j.select(
        "c_custkey",
        "c_nationkey",
        F.round(num / den * 1000000.0, 0).cast("long").alias("z_micro"),
    )


@register(
    "t_stream_late_drop",
    """
    WITH wm AS (
      SELECT MAX(epoch_ms(ts)) - 172800000 AS wm FROM events
    ), a AS (
      SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      FROM events WHERE event_id % 5 != 0
    ), g AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM a GROUP BY day
    )
    SELECT CAST(day * 86400000 AS BIGINT) AS window_start_ms,
           n_events,
           CAST(s AS DOUBLE) AS sum_cents
    FROM g CROSS JOIN wm WHERE (day + 1) * 86400000 <= wm
    """,
)
def t_stream_late_drop(spark: SparkSession, sf: str) -> DataFrame:
    """WATERMARK LATE-DATA DROP, witnessed by the driver: the events
    table is staged into THREE arrival batches — (0) all on-time rows
    (event_id % 5 != 0), (1) a single watermark-advancer (the latest
    straggler), (2) every remaining straggler — and drained availableNow
    with ``maxFilesPerTrigger=1`` through a 2-day watermark + 1-day
    tumbling aggregate in APPEND mode.  Batch 0 sets the watermark,
    batch 1's commit evicts-and-emits every closed window, so batch 2's
    stragglers arrive at evicted state and are DROPPED (verified:
    ``numRowsDroppedByWatermark > 0`` in the query progress; drop this
    stage and the sums include straggler cents, failing the hash).  The
    oracle computes the exact fixpoint analytically: on-time rows only,
    over windows whose end ≤ max(event time) − 2 days — the append-mode
    emission rule.  The streaming-witness family's missing semantics:
    tumbling/sliding/session/dedup/interval-join showed the engine
    AGGREGATES like batch; this shows it DISCARDS like the contract
    says.  Day-grain windows + integer cents keep state bounded and
    sums order-free."""
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
    base = f"/root/repo/.tmp/t_stream_late_drop_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        ontime = ev.filter(F.col("event_id") % 5 != 0).select("ts", "cents")
        stragglers = ev.filter(F.col("event_id") % 5 == 0)
        advancer = stragglers.orderBy(
            F.col("ts").desc(), F.col("event_id").asc()
        ).limit(1)
        rest = stragglers.join(
            advancer.select("event_id"), "event_id", "left_anti"
        )
        for i, df in enumerate(
            [ontime, advancer.select("ts", "cents"), rest.select("ts", "cents")]
        ):
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
    agg = (
        raw.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("__s"))
    )
    sink = f"t_stream_late_drop_{uuid.uuid4().hex[:8]}"
    with _tiny_stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
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
    "x_roc_auc",
    """
    WITH sc AS (
      SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
      FROM events
    ), g AS (
      SELECT s, CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(1 - p) AS BIGINT) AS nn
      FROM sc GROUP BY s
    ), w AS (
      SELECT s, np, nn,
             SUM(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nn
               AS cum_nn_prev
      FROM g
    ), t AS (
      SELECT CAST(SUM(np * (2 * cum_nn_prev + nn)) AS HUGEINT) AS u2,
             CAST(SUM(np) AS HUGEINT) AS npos,
             CAST(SUM(nn) AS HUGEINT) AS nneg
      FROM w
    )
    SELECT CAST(npos AS BIGINT) AS npos,
           CAST(nneg AS BIGINT) AS nneg,
           CAST(u2 AS BIGINT) AS u2,
           CAST(u2 * 1000000 // (2 * npos * nneg) AS BIGINT) AS auc_micro
    FROM t
    """,
)
def x_roc_auc(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank identity — the binary-
    classifier evaluation metric, computed with NO per-pair work and NO
    floats: AUC = U/(n₊n₋) where 2U = Σ over distinct scores of
    n₊(s)·(2·[negatives strictly below s] + [negatives at s]) — the
    tie-aware (½-credit) form, doubled to stay integer.  Label =
    purchase events, score = integer cents.  Scale shape: one grouped
    reduction to ≤|distinct scores| rows, ONE global running-sum window
    over that bounded spine (never over raw events), one scalar reduce;
    the 10⁶ product runs in decimal(38,0)/HUGEINT so n₊n₋ can exceed
    int64/10⁶ safely.  Completes the eval family: confusion matrix
    (classification), decile lift (ranking), AUC (discrimination)."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    sc = e.select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
    )
    g = sc.groupBy("s").agg(
        F.sum("p").alias("np"), F.sum(1 - F.col("p")).alias("nn")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine = g.select(
        "np",
        "nn",
        (F.sum("nn").over(w) - F.col("nn")).alias("cum_nn_prev"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    t = spine.agg(
        dec(F.sum(F.col("np") * (2 * F.col("cum_nn_prev") + F.col("nn")))).alias("u2"),
        dec(F.sum("np")).alias("npos"),
        dec(F.sum("nn")).alias("nneg"),
    )
    # exact long DIV for the final ratio: Spark decimal division ROUNDS at
    # its result scale while DuckDB `//` truncates — long arithmetic keeps
    # both engines on truncation (u2·10⁶ fits int64 through n₊n₋ ≲ 4.6e12)
    return t.selectExpr(
        "CAST(npos AS BIGINT) AS npos",
        "CAST(nneg AS BIGINT) AS nneg",
        "CAST(u2 AS BIGINT) AS u2",
        "CAST(CAST(u2 AS BIGINT) * 1000000"
        "     DIV (2 * CAST(npos AS BIGINT) * CAST(nneg AS BIGINT)) AS BIGINT)"
        " AS auc_micro",
    )


@register(
    "x_regression_metrics",
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
    ), fit AS (
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM sums
    ), res AS (
      SELECT p.event_type, f.n, f.b,
             CAST(y AS DOUBLE) - (f.b * CAST(x AS DOUBLE) + f.a) AS e
      FROM pts p JOIN fit f ON p.event_type = f.event_type
    ), acc AS (
      SELECT event_type, n, b,
             CAST(SUM(CAST(floor(abs(e) * 1000000.0) AS BIGINT)) AS BIGINT)
               AS sae_u,
             CAST(SUM(CAST(floor(e * e * 100.0) AS BIGINT)) AS BIGINT) AS sse_c
      FROM res GROUP BY event_type, n, b
    )
    SELECT event_type,
           n,
           CAST(ROUND(b * 1000000.0) AS BIGINT) AS slope_micro,
           CAST(sae_u // n AS BIGINT) AS mae_micro,
           CAST(ROUND(sqrt(CAST(sse_c AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
                      * 1000000.0) AS BIGINT) AS rmse_micro
    FROM acc
    """,
)
def x_regression_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """REGRESSION EVALUATION (MAE / RMSE / slope) for the per-group OLS
    fit of value-over-time — the residual-diagnostics half
    `x_trend_slope` stops short of.  Determinism discipline: the fit
    (b, a) comes from exact integer power sums through one fixed IEEE
    chain; each residual e = y − (b·x + a) is the same fixed chain per
    row, then FLOORED to integer units (micro for |e|, centi for e²) so
    the per-group SUM is order-independent — the chi²/ACF trick.  MAE is
    pure integer division; RMSE is one final sqrt chain on the exact
    centi-sum.  Shape: one stats pass (5 rows, broadcast back), one
    residual pass, no window; e²·100 keeps the sum under int64 through
    ~10⁸ rows per group."""
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
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    fit = sums.select(
        "event_type",
        "n",
        b.alias("b"),
        (
            (F.col("sy").cast("double") - b * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    res = pts.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "n",
        "b",
        (
            F.col("y").cast("double")
            - (F.col("b") * F.col("x").cast("double") + F.col("a"))
        ).alias("e"),
    )
    acc = res.groupBy("event_type", "n", "b").agg(
        F.sum(F.floor(F.abs(F.col("e")) * 1000000.0).cast("long")).alias("sae_u"),
        F.sum(F.floor(F.col("e") * F.col("e") * 100.0).cast("long")).alias("sse_c"),
    )
    return acc.select(
        "event_type",
        "n",
        F.round(F.col("b") * 1000000.0, 0).cast("long").alias("slope_micro"),
        F.expr("sae_u DIV n").cast("long").alias("mae_micro"),
        F.round(
            F.sqrt(F.col("sse_c").cast("double") / F.col("n").cast("double") / 100.0)
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("rmse_micro"),
    )


@register(
    "x_knn_classify",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS true_label, vec AS qv
      FROM v WHERE vec_id < 30
    ), c AS (
      SELECT vec_id AS neighbor_id, label AS n_label, vec AS cv
      FROM v WHERE vec_id >= 30
    ), scored AS (
      SELECT query_id, true_label, neighbor_id, n_label,
             CAST(ROUND(list_dot_product(qv, cv)
                        / (sqrt(list_dot_product(qv, qv))
                           * sqrt(list_dot_product(cv, cv)))
                        * 1000000.0) AS BIGINT) AS cos_u
      FROM q, c
    ), topk AS (
      SELECT query_id, true_label, n_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_u DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ), votes AS (
      SELECT query_id, true_label, n_label, COUNT(*) AS cnt
      FROM topk GROUP BY query_id, true_label, n_label
    )
    SELECT query_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(n_label AS BIGINT) AS pred_label,
           CAST(CASE WHEN n_label = true_label THEN 1 ELSE 0 END AS BIGINT)
             AS correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cnt DESC, n_label) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def x_knn_classify(spark: SparkSession, sf: str) -> DataFrame:
    """K-NN CLASSIFICATION (k=5, majority vote): the bounded query set
    (vec_id < 30) classified against the held-out corpus by cosine
    neighbors' labels — the eval harness that grades an embedding
    space's label coherence (and, swapped onto an ANN index, the
    production retrieval-classify pattern; this registered form uses
    the exact broadcast baseline).  Vote argmax is an aggregate (max of
    (count, −label) struct — highest count, smallest label on ties),
    not a second window.  Ranking uses micro-rounded cosine with
    neighbor-id tiebreak so top-5 membership is engine-stable."""
    emb = load_table(spark, sf, "embeddings")
    v = emb.select("vec_id", "label", S.as_double(F.col("embedding")).alias("vec"))
    q = v.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("vec").alias("qv"),
    )
    c = v.filter(F.col("vec_id") >= 30).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("vec").alias("cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "neighbor_id",
        "n_label",
        (_round_fixed(S.cosine(F.col("qv"), F.col("cv")), 6) * 1000000.0)
        .cast("long")
        .alias("cos_u"),
    )
    topk = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_u").desc(), F.col("neighbor_id").asc()],
        k=5,
        rank_col="__rn",
    )
    votes = topk.groupBy("query_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = votes.groupBy("query_id", "true_label").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("n_label")).alias("neg_label"))).alias(
            "__b"
        )
    )
    return best.select(
        "query_id",
        F.col("true_label").cast("long").alias("true_label"),
        (-F.col("__b.neg_label")).cast("long").alias("pred_label"),
        (F.col("__b.neg_label") == -F.col("true_label"))
        .cast("long")
        .alias("correct"),
    )


#: Literal nDCG position discounts round(10⁶/log₂(i+1)), i = 1..10 — the
#: Benford treatment: the only transcendental is a compile-time constant,
#: identical in both engines' query texts.
_NDCG_DISCOUNT_MICRO = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)


def _ndcg_case(rank_col: str) -> str:
    return (
        "CASE " + " ".join(
            f"WHEN {rank_col} = {i + 1} THEN {d}"
            for i, d in enumerate(_NDCG_DISCOUNT_MICRO)
        ) + " ELSE 0 END"
    )


@register(
    "x_ndcg_eval",
    f"""
    WITH terms AS (
      SELECT unnest(['the', 'data', 'model']) AS term
    ), scored AS (
      SELECT t.term, d.doc_id,
             len(regexp_extract_all(lower(d.text),
                                    concat('\\b', t.term, '\\b'))) AS tf,
             len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_tokens
      FROM documents d CROSS JOIN terms t
    ), graded AS (
      SELECT term, doc_id,
             CAST(tf AS BIGINT) * 1000000 // n_tokens AS score,
             least(tf, 3) AS rel
      FROM scored WHERE tf > 0
    ), ranked AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term
                                ORDER BY score DESC, doc_id) AS rn
      FROM graded
    ), ideal AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term
                                ORDER BY rel DESC, doc_id) AS rn
      FROM graded
    ), dcg AS (
      SELECT term, CAST(SUM(rel * ({_ndcg_case('rn')})) AS BIGINT) AS dcg_micro
      FROM ranked WHERE rn <= 10 GROUP BY term
    ), idcg AS (
      SELECT term, CAST(SUM(rel * ({_ndcg_case('rn')})) AS BIGINT) AS idcg_micro
      FROM ideal WHERE rn <= 10 GROUP BY term
    )
    SELECT d.term, d.dcg_micro, i.idcg_micro,
           CAST(d.dcg_micro * 1000000 // i.idcg_micro AS BIGINT) AS ndcg_micro
    FROM dcg d JOIN idcg i ON d.term = i.term
    """,
)
def x_ndcg_eval(spark: SparkSession, sf: str) -> DataFrame:
    """RANKING EVALUATION: nDCG@10 of a length-normalized-TF retrieval
    ranking against raw-TF graded relevance (capped at 3) for three
    query terms — the IR metric that grades `x_bm25_search`-style
    rankers.  The log₂ position discounts are COMPILE-TIME micro
    literals in both query texts (the Benford treatment — no runtime
    transcendental), so DCG/IDCG are exact integer dot products and
    nDCG one integer division.  Shape: one corpus scan per term set
    (3-row broadcast), two per-term top-10 windows over the tf>0
    postings (pruned before ranking — never the full corpus), bounded
    output.  Completes the eval suite: classification, discrimination,
    regression, ranking."""
    d = load_table(spark, sf, "documents")
    terms = spark.createDataFrame([("the",), ("data",), ("model",)], ["term"])
    scored = d.crossJoin(F.broadcast(terms)).select(
        "term",
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")),
                F.concat(F.lit("\\b"), F.col("term"), F.lit("\\b")),
                F.lit(0),
            )
        ).alias("tf"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    graded = scored.filter(F.col("tf") > 0).select(
        "term",
        "doc_id",
        F.expr("CAST(tf AS BIGINT) * 1000000 DIV n_tokens").alias("score"),
        F.least(F.col("tf"), F.lit(3)).alias("rel"),
    )
    ranked = top_k_per_group(
        graded, ["term"], [F.col("score").desc(), F.col("doc_id").asc()],
        k=10, rank_col="rn",
    )
    ideal = top_k_per_group(
        graded, ["term"], [F.col("rel").desc(), F.col("doc_id").asc()],
        k=10, rank_col="rn",
    )
    disc = F.expr(_ndcg_case("rn"))
    dcg = ranked.groupBy("term").agg(
        F.sum(F.col("rel") * disc).alias("dcg_micro")
    )
    idcg = ideal.groupBy("term").agg(
        F.sum(F.col("rel") * disc).alias("idcg_micro")
    )
    return (
        dcg.join(idcg, "term")
        .selectExpr(
            "term",
            "CAST(dcg_micro AS BIGINT) AS dcg_micro",
            "CAST(idcg_micro AS BIGINT) AS idcg_micro",
            "CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT) AS ndcg_micro",
        )
    )


@register(
    "x_silhouette",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), e AS (
      SELECT label, i AS dim, vec[i] AS x
      FROM v, unnest(generate_series(1, 64)) AS t(i)
    ), cd AS (
      SELECT label, dim,
             CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) // COUNT(*)
                  AS BIGINT) / 1000000.0 AS cv
      FROM e GROUP BY label, dim
    ), cents AS (
      SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
      FROM cd GROUP BY label
    ), d AS (
      SELECT v.vec_id, v.label, c.clabel,
             CAST(ROUND(list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, 64),
                   i -> (v.vec[i] - c.cvec[i]) * (v.vec[i] - c.cvec[i]))),
               (acc, x) -> acc + x) * 1000000.0) AS BIGINT) / 1000000.0 AS d2
      FROM v CROSS JOIN cents c
    ), ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN d2 END) AS a,
             MIN(CASE WHEN clabel <> label THEN d2 END) AS b
      FROM d GROUP BY vec_id, label
    )
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           CAST(CASE WHEN greatest(a, b) = 0 THEN 0
                     ELSE ROUND((b - a) / greatest(a, b) * 1000000.0)
                END AS BIGINT) AS silhouette_micro
    FROM ab
    """,
)
def x_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """CLUSTERING EVALUATION: simplified (centroid-based) silhouette of
    the ground-truth label partition of the embedding space — per
    vector, a = squared L2 to the OWN label centroid, b = to the nearest
    OTHER centroid, silhouette = (b−a)/max(a,b) in micro-units.  The
    quality score that grades `x_kmeans_embeddings` / `x_semdedup`
    partitions without the O(N²) pairwise form (Lloyd's-scale cost: one
    dimension-exploded centroid pass + one k-row broadcast scoring
    pass).  Centroid means use the k-means portability contract —
    per-dimension exact integer-micro accumulation with truncating
    division — and distances the rounded-fold discipline, so every
    decision is bit-identical cross-engine."""
    emb = load_table(spark, sf, "embeddings")
    v = emb.select("vec_id", "label", S.as_double(F.col("embedding")).alias("vec"))
    dims = v.select(
        "label",
        F.transform(
            "vec", lambda x: F.round(x * 1_000_000.0, 0).cast("long")
        ).alias("__m"),
    ).selectExpr("label", "posexplode(__m) AS (dim, micro)")
    cd = (
        dims.groupBy("label", "dim")
        .agg(F.sum("micro").alias("__s"), F.count(F.lit(1)).alias("__n"))
        .select(
            "label",
            "dim",
            (F.expr("__s DIV __n").cast("double") / F.lit(1_000_000.0)).alias("cv"),
        )
    )
    cents = cd.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda s: s["cv"],
        ).alias("cvec")
    )
    d2 = _round_fixed(
        F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    d = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias("b"),
    )
    sil = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        F.round((F.col("b") - F.col("a")) / F.greatest("a", "b") * 1_000_000.0, 0)
    )
    return ab.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        sil.cast("long").alias("silhouette_micro"),
    )


@register(
    "x_ks_test",
    """
    WITH sc AS (
      SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
      FROM events
    ), g AS (
      SELECT s, CAST(SUM(p) AS BIGINT) AS na_i, CAST(SUM(1 - p) AS BIGINT) AS nb_i
      FROM sc GROUP BY s
    ), w AS (
      SELECT s,
             SUM(na_i) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(nb_i) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cb
      FROM g
    ), tot AS (
      SELECT CAST(SUM(na_i) AS BIGINT) AS na, CAST(SUM(nb_i) AS BIGINT) AS nb
      FROM g
    ), dev AS (
      SELECT w.s, abs(w.ca * t.nb - w.cb * t.na) AS dev, t.na, t.nb
      FROM w CROSS JOIN tot t
    )
    SELECT na, nb,
           CAST(MIN(CASE WHEN dev = md THEN s END) AS BIGINT) AS argmax_cents,
           CAST(CAST(md AS HUGEINT) * 1000000 // (CAST(na AS HUGEINT) * nb)
                AS BIGINT) AS d_micro
    FROM (SELECT *, MAX(dev) OVER () AS md FROM dev)
    GROUP BY na, nb, md
    """,
)
def x_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV statistic, exactly: D = max over the
    merged value spine of |ECDF₁ − ECDF₂|, kept integer by cross-
    multiplying the cumulative counts (|c₁·n₂ − c₂·n₁|, divided out to
    micro only at the end, decimal/HUGEINT headroom) — the
    distribution-shift test completing the drift family next to
    `x_distribution_drift` (categorical) and `x_chi2_independence`
    (contingency).  Samples: purchase vs non-purchase value
    distributions.  The argmax location (smallest cents hitting the max
    deviation) makes the witness value-specific, not just the scalar.
    Shape: one grouped reduction to the distinct-cents spine, one
    running-sum window + one scalar max over that bounded spine, never
    raw events."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    sc = e.select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
    )
    g = sc.groupBy("s").agg(
        F.sum("p").alias("na_i"), F.sum(1 - F.col("p")).alias("nb_i")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "s",
        F.sum("na_i").over(w).alias("ca"),
        F.sum("nb_i").over(w).alias("cb"),
    )
    tot = g.agg(F.sum("na_i").alias("na"), F.sum("nb_i").alias("nb"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("dev"),
    )
    md = dev.select(F.col("s"), F.col("na"), F.col("nb"), F.col("dev"),
                    F.max("dev").over(Window.partitionBy()).alias("md"))
    return (
        md.groupBy("na", "nb", "md")
        .agg(F.min(F.when(F.col("dev") == F.col("md"), F.col("s"))).alias("argmax_cents"))
        .select(
            "na",
            "nb",
            F.col("argmax_cents").cast("long").alias("argmax_cents"),
            # exact DIV with DECIMAL(38,0) headroom (truncation matches
            # DuckDB's HUGEINT `//` in the oracle): md ≤ n₁·n₂, so
            # md·10⁶ leaves int64 already at n₁·n₂ ≳ 9·10¹² (~the 100×
            # replica of sf0.1) — the decimal bridge keeps the product
            # exact to 10³⁸ (numeric-policy overflow audit).
            F.expr(
                "CAST(CAST(md AS DECIMAL(38,0)) * 1000000"
                " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("d_micro"),
        )
    )


@register(
    "x_theil_sen",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) - 19723 AS x,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             (b.y - a.y) * 1000 // (b.x - a.x) AS slope_milli
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.x < b.x
    ), ranked AS (
      SELECT event_type, slope_milli,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope_milli) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(slope_milli AS BIGINT) AS theil_sen_milli
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def x_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """THEIL-SEN ROBUST TREND: the median of all pairwise slopes of the
    per-group DAILY series — the outlier-proof alternative to the OLS
    `x_trend_slope` (one wild day cannot move it).  The critical scale
    move: events reduce to the (group, day) grain FIRST, so the pairwise
    slope join is over the bounded calendar spine (≤31 points → ≤465
    pairs per group), never raw rows — the same pre-reduction discipline
    as `x_rolling_median`.  Slopes are exact integer milli-cents/day
    (truncating division, identical both engines); the lower median by
    deterministic rank."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long")
            - 19723
        ).alias("x"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    # cached: the daily series feeds both sides of the slope pair join —
    # uncached, the events reduce runs twice
    daily = daily.cache()
    a = daily.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select("event_type", F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            "event_type",
            F.expr("((yb - ya) * 1000) DIV (xb - xa)").alias("slope_milli"),
        )
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("event_type").orderBy("slope_milli")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope_milli",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.col("slope_milli").cast("long").alias("theil_sen_milli"),
    )


@register(
    "x_collocations",
    """
    WITH toks AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    ), bc AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY bigram
    ), t AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM bc
    ), lc AS (
      SELECT split_part(bigram, ' ', 1) AS w, CAST(SUM(c) AS BIGINT) AS c
      FROM bc GROUP BY 1
    ), rc AS (
      SELECT split_part(bigram, ' ', 2) AS w, CAST(SUM(c) AS BIGINT) AS c
      FROM bc GROUP BY 1
    )
    SELECT b.bigram, b.c AS cnt,
           CAST(CAST(b.c AS HUGEINT) * t.n * 1000000
                // (CAST(l.c AS HUGEINT) * r.c) AS BIGINT) AS lift_micro
    FROM bc b
    CROSS JOIN t
    JOIN lc l ON l.w = split_part(b.bigram, ' ', 1)
    JOIN rc r ON r.w = split_part(b.bigram, ' ', 2)
    WHERE b.c >= 5
    ORDER BY lift_micro DESC, b.bigram LIMIT 20
    """,
)
def x_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """COLLOCATION MINING: the top word pairs by LIFT — P(ab) /
    (P(a as left)·P(b as right)) over bigram occurrences, the PMI
    ranking in exact integer form (lift ∝ exp(PMI), order-identical, so
    no log is ever taken; min support 5 suppresses the rare-pair noise
    PMI is notorious for).  The multiword-expression extractor of an
    NLP pipeline (phrase vocabularies, tokenizer merges, stopword-pair
    screens).  Shape: one bigram explode, then everything operates on
    the bigram COUNT table — the left/right marginals are two more
    vocab-bounded aggregates joined back, and the top-20 is a partial
    TakeOrdered.  c·N·10⁶ needs headroom past ~10¹² bigrams — switch
    the product to decimal(38,0)/HUGEINT there."""
    d = spread(load_table(spark, sf, "documents"))
    bc = (
        d.select(F.explode(T.bigrams(F.col("text"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bc = bc.cache()  # feeds total, both marginals, and the scored join
    t = bc.agg(F.sum("c").alias("n"))
    lc = bc.groupBy(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w")).agg(
        F.sum("c").alias("lc")
    )
    rc = bc.groupBy(F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w")).agg(
        F.sum("c").alias("rc")
    )
    scored = (
        bc.filter(F.col("c") >= 5)
        .crossJoin(F.broadcast(t))
        .join(lc, F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == lc["w"])
        .join(rc, F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)) == rc["w"])
        .select(
            "bigram",
            F.col("c").alias("cnt"),
            # c·N·10⁶ nears int64 past ~1000× corpus replication —
            # DECIMAL(38,0) bridge, mirroring the oracle's HUGEINT
            # (numeric-policy overflow audit).
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * n * 1000000"
                " DIV (CAST(lc AS DECIMAL(38,0)) * rc) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )
    return scored.orderBy(F.col("lift_micro").desc(), F.col("bigram").asc()).limit(20)


@register(
    "f_schema_merge_scan",
    """
    SELECT event_id, value,
           CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type
    FROM events WHERE event_id < 2000
    """,
)
def f_schema_merge_scan(spark: SparkSession, sf: str) -> DataFrame:
    """SCHEMA-EVOLUTION SCAN (`mergeSchema`): two parquet generations of
    the same table — v1 written before an `event_type` column existed
    (even ids), v2 after (odd ids) — read back as ONE unified relation
    with NULLs filling the missing column, the day-one ingestion
    reality every long-lived lake table hits.  The staged generations
    are content-deterministic (rebuilt from the events table, reused
    across runs); the oracle states the unified result analytically.
    Completes the source-format family: csv, jsonl, orc, bucketed
    parquet, and now heterogeneous-schema parquet."""
    import glob
    import os
    import re
    import shutil
    import uuid

    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/f_schema_merge_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
        v2 = ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "value", "event_type"
        )
        for i, df in enumerate([v1, v2]):
            df.coalesce(1).write.parquet(f"{build}/p{i}")
            part = glob.glob(f"{build}/p{i}/*.parquet")[0]
            shutil.copy(part, f"{build}/src/gen{i}.parquet")
            shutil.rmtree(f"{build}/p{i}")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename
        shutil.rmtree(build, ignore_errors=True)
    return spark.read.option("mergeSchema", "true").parquet(src).select(
        "event_id", "value", "event_type"
    )


@register(
    "x_hits_rank",
    """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), a1 AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS a FROM pairs GROUP BY c
    ), a1m AS (
      SELECT MAX(a) AS m FROM a1
    ), a1n AS (
      SELECT c, a * 1000000 // m AS an FROM a1 CROSS JOIN a1m
    ), h1 AS (
      SELECT p.s, CAST(SUM(n.an) AS BIGINT) AS h
      FROM pairs p JOIN a1n n ON p.c = n.c GROUP BY p.s
    ), h1m AS (
      SELECT MAX(h) AS m FROM h1
    ), h1n AS (
      SELECT s, h * 1000000 // m AS hn FROM h1 CROSS JOIN h1m
    ), a2 AS (
      SELECT p.c, CAST(SUM(n.hn) AS BIGINT) AS a
      FROM pairs p JOIN h1n n ON p.s = n.s GROUP BY p.c
    ), a2m AS (
      SELECT MAX(a) AS m FROM a2
    ), a2n AS (
      SELECT c, a * 1000000 // m AS an FROM a2 CROSS JOIN a2m
    ), h2 AS (
      SELECT p.s, CAST(SUM(n.an) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM pairs p JOIN a2n n ON p.c = n.c GROUP BY p.s
    ), h2m AS (
      SELECT MAX(h) AS m FROM h2
    )
    SELECT CAST(s AS BIGINT) AS supplier,
           CAST(h * 1000000 // m AS BIGINT) AS hub_micro,
           n_customers
    FROM h2 CROSS JOIN h2m
    ORDER BY hub_micro DESC, supplier LIMIT 20
    """,
)
def x_hits_rank(spark: SparkSession, sf: str) -> DataFrame:
    """HITS HUBS-AND-AUTHORITIES on the bipartite trade graph (2
    synchronous rounds): suppliers are hubs, customers authorities —
    a hub is strong when its customers are strong authorities and vice
    versa, the mutual-reinforcement ranking that separates "many weak
    buyers" from "few influential buyers" where raw degree (and even
    PageRank's single score) cannot.  Normalization divides by the
    1-row max (broadcast, the k-core-k pattern) instead of the L2 norm,
    keeping every iterate an exact integer micro value — order-
    independent and overflow-safe (h ≤ max_degree·10⁶).  Per round: one
    pairs⋈scores co-keyed join + one groupBy; the distinct pair list is
    cached across all four half-rounds.  Output: top-20 hubs via
    partial TakeOrdered.  Second member of the iterative-ranking family
    beside `x_pagerank_trade` (which it complements: PageRank is
    endorsement flow, HITS is role duality)."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .cache()  # feeds all four half-rounds
    )

    def normalize(df: DataFrame, key: str, val: str) -> DataFrame:
        # CACHE each node-bounded score table: it feeds BOTH the 1-row max
        # branch and the normalized output — uncached, every level's max
        # re-executes its whole upstream subtree and the pair list gets
        # scanned 2^rounds times (measured: 9-24s → ~1s at sf0.1)
        df = df.cache()
        m = df.agg(F.max(val).alias("m"))
        return df.crossJoin(F.broadcast(m)).selectExpr(
            key, f"{val} * 1000000 DIV m AS {val}n"
        )

    # r12: BROADCAST each per-round score join — the score tables are
    # node-bounded (one row per customer/supplier), the same "node table
    # fits an executor" lever as pagerank's broadcast_ranks /
    # label_propagation's broadcast_labels; without the hint the planner
    # SortMergeJoined the cached pair list against every level (3 SMJs +
    # 6 Sorts + a pair-list shuffle per half-round in the r11 plan;
    # AQE undid most of that at runtime, so the interleaved win is small
    # — 3.90s → 3.79s — but the static plan is now shuffle-free on the
    # pair side and deterministic).
    _bc = F.broadcast

    a1 = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("a"))
    a1n = normalize(a1, "c", "a")
    h1 = (
        pairs.join(_bc(a1n), "c")
        .groupBy("s")
        .agg(F.sum("an").alias("h"))
    )
    h1n = normalize(h1, "s", "h")
    a2 = (
        pairs.join(_bc(h1n), "s")
        .groupBy("c")
        .agg(F.sum("hn").alias("a"))
    )
    a2n = normalize(a2, "c", "a")
    h2 = (
        pairs.join(_bc(a2n), "c")
        .groupBy("s")
        .agg(F.sum("an").alias("h"), F.count(F.lit(1)).alias("n_customers"))
        .cache()  # same two-consumer shape as the normalize levels
    )
    m2 = h2.agg(F.max("h").alias("m"))
    out = h2.crossJoin(F.broadcast(m2)).selectExpr(
        "CAST(s AS BIGINT) AS supplier",
        "CAST(h * 1000000 DIV m AS BIGINT) AS hub_micro",
        "CAST(n_customers AS BIGINT) AS n_customers",
    )
    return out.orderBy(F.col("hub_micro").desc(), F.col("supplier").asc()).limit(20)


#: Binomial(8, 1/8) ≈ Poisson(1) resample weight from 24 hash bits: 8
#: trials, each succeeding when its 3-bit slice is 0.  Shared text-builder
#: so Spark and DuckDB evaluate the IDENTICAL expression over the portable
#: 60-bit hash column `h`.
_POISSON_W = " + ".join(
    f"(CASE WHEN (h >> {3 * t}) & 7 = 0 THEN 1 ELSE 0 END)" for t in range(8)
)


@register(
    "x_bootstrap_ci",
    f"""
    WITH x AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      FROM events
    ), r AS (
      SELECT event_type, cents, b,
             CAST(concat('0x', substr(md5(concat(CAST(event_id AS VARCHAR),
                                                 '_', CAST(b AS VARCHAR))),
                                      1, 15)) AS BIGINT) AS h
      FROM x, unnest(generate_series(0, 31)) AS t(b)
    ), w AS (
      SELECT event_type, b, cents, {_POISSON_W} AS wt FROM r
    ), means AS (
      SELECT event_type, b,
             CAST(SUM(wt * cents) * 1000000 // SUM(wt) AS BIGINT) AS mean_b
      FROM w GROUP BY event_type, b
    ), ranked AS (
      SELECT event_type, mean_b,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mean_b, b) AS rn
      FROM means
    ), pt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS mean_micro
      FROM x GROUP BY event_type
    )
    SELECT p.event_type, p.n, p.mean_micro,
           CAST(MIN(CASE WHEN rn = 2 THEN mean_b END) AS BIGINT) AS ci_lo_micro,
           CAST(MIN(CASE WHEN rn = 31 THEN mean_b END) AS BIGINT) AS ci_hi_micro
    FROM pt p JOIN ranked k ON p.event_type = k.event_type
    GROUP BY p.event_type, p.n, p.mean_micro
    """,
)
def x_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the per-group mean — the
    distributed-bootstrap construction (each of 32 resamples weights
    every row by an independent ~Poisson(1) count, so no resample ever
    materializes or shuffles the data twice), made DETERMINISTIC by
    deriving each weight from 24 bits of the portable hash of
    (row id, resample id): Binomial(8, 1/8), mean 1, the classic
    Poisson approximation.  CI = the 2nd/31st order statistics of the
    32 resample means (~93.75% coverage).  The uncertainty-
    quantification operator the eval suite reports around: a mean
    without an interval is not a measurement.  Shape: one ×32 explode
    (map-side), one (group, b) reduction, one rank window over the
    32-row-per-group spine, exact integer micro arithmetic throughout."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    x = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    r = x.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        "event_id",
    ).select(
        "event_type",
        "cents",
        "b",
        D.portable_hash60(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("_"),
                F.col("b").cast("string"),
            )
        ).alias("h"),
    )
    w = r.withColumn("wt", F.expr(_POISSON_W))
    means = w.groupBy("event_type", "b").agg(
        F.expr("CAST(SUM(wt * cents) * 1000000 DIV SUM(wt) AS BIGINT)").alias(
            "mean_b"
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("mean_b", "b")
    )
    ranked = means.select("event_type", "mean_b", rn.alias("rn"))
    pt = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(cents) * 1000000 DIV COUNT(*) AS BIGINT)").alias(
            "mean_micro"
        ),
    )
    return (
        pt.join(ranked, "event_type")
        .groupBy("event_type", "n", "mean_micro")
        .agg(
            F.min(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("ci_lo_micro"),
            F.min(F.when(F.col("rn") == 31, F.col("mean_b"))).alias("ci_hi_micro"),
        )
    )


