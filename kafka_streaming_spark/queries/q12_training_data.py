"""training-data assembly: sampling/splits/mixing/packing — split from the monolithic queries.py (round 9,
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

# ===========================================================================
# Training-data assembly: deterministic sampling / splits / mixing / packing
# ===========================================================================


@register(
    "x_doc_sample_uniform",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
    """,
)
def x_doc_sample_uniform(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic Bernoulli(0.25) corpus sample keyed on doc_id — no
    rand(), so stage retries and engine swaps reproduce the exact sample
    (the retry-safety property ``sample()``-based pipelines lack)."""
    d = load_table(spark, sf, "documents")
    return SP.uniform_sample(d, "doc_id", 0.25).select("doc_id", "lang", "source")


@register(
    "x_doc_sample_stratified",
    """
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE source WHEN 'src0' THEN '2000' WHEN 'src1' THEN '8000'
                      WHEN 'src2' THEN 'ffff' ELSE '0000' END
    """,
)
def x_doc_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified per-source sampling (corpus rebalancing: downsample src0
    to 1/8, src1 to 1/2, keep src2 whole) as one narrow predicate."""
    d = load_table(spark, sf, "documents")
    return SP.stratified_sample(
        d, "doc_id", "source", {"src0": 0.125, "src1": 0.5, "src2": 0.9999847412109375}
    ).select("doc_id", "source")


@register(
    "x_doc_split",
    """
    SELECT split, COUNT(*) AS n_docs
    FROM (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd' THEN 'val'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '199a' THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def x_doc_split(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test hash-range split (5%/5%/90%), stable under corpus
    growth — a doc's assignment never changes when other docs are added."""
    d = load_table(spark, sf, "documents")
    return SP.hash_split(d, "doc_id", 0.05, 0.05).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "x_dataset_mix",
    """
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE source WHEN 'src0' THEN '4000' WHEN 'src1' THEN 'ffff'
                      WHEN 'src2' THEN 'b333' ELSE '0000' END
    GROUP BY source
    """,
)
def x_dataset_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted source mixing ("0.25 of src0, all of src1, 0.7 of src2")
    with per-source doc/char budgets — the dataset-recipe operator."""
    d = load_table(spark, sf, "documents")
    mixed = SP.weighted_mix(
        d, "doc_id", "source", {"src0": 0.25, "src1": 0.9999847412109375, "src2": 0.7}
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "x_token_pack",
    """
    WITH toks AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / 512.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY pack_id
    """,
)
def x_token_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window packing: docs (in doc_id order) assigned to ~512-token
    packs via one window prefix-sum, then per-pack budgets.  The prefix-sum
    decomposes exactly across range partitions at scale (see
    functions.sampling.pack_sequential)."""
    d = load_table(spark, sf, "documents")
    with_tokens = d.select("doc_id", T.token_count(F.col("text")).alias("n_tokens"))
    packed = SP.pack_sequential(with_tokens, "doc_id", "n_tokens", budget=512)
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("pack_tokens")
    )


@register(
    "x_epoch_shuffle",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY md5('ep0:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS epoch_pos
    FROM documents
    """,
)
def x_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch shuffle: reproducible random training order as
    rank under md5(seed || doc_id) — rerun-stable where rand() is not, and
    a new independent permutation per seed.  The exact global rank is
    computed via 256 hash-prefix ranges + offset stitching (one 256-row
    collect), NEVER a single-partition window — plan-gated in
    tests/test_plan_quality.py."""
    d = load_table(spark, sf, "documents").select("doc_id")
    return SP.epoch_shuffle(d, "doc_id", seed="ep0").select("doc_id", "epoch_pos")


@register(
    "x_quality_funnel",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN n_chars >= 180 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_len_ok,
           CAST(SUM(CASE WHEN n_chars >= 180
                      AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10000
                          >= length(text) * 5500
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_ok,
           CAST(SUM(CASE WHEN n_chars >= 180
                      AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10000
                          >= length(text) * 5500
                      AND len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) * 100
                          >= len(regexp_split_to_array(trim(text), '\\s+')) * 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_stopword_ok
    FROM documents
    GROUP BY source
    """,
)
def x_quality_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-filter funnel report: per source, how many docs survive each
    successive filter stage (length floor → alpha density → stopword
    density) — the per-stage drop accounting every production filtering
    pipeline publishes.  One pass, conditional aggregation, exact integer
    threshold arithmetic (functions.text.funnel_flags)."""
    d = load_table(spark, sf, "documents")
    c1, c2, c3 = T.funnel_flags(F.col("text"), F.col("n_chars"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(c1.cast("long")).alias("n_len_ok"),
        F.sum(c2.cast("long")).alias("n_alpha_ok"),
        F.sum(c3.cast("long")).alias("n_stopword_ok"),
    )


@register(
    "x_topk_bigrams",
    """
    WITH toks AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def x_topk_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram statistics (the n-gram-LM / contamination-check
    primitive): explode word bigrams, count, top-20 with a total order.
    One explode + one shuffle; the ORDER/LIMIT is a partial top-k
    (TakeOrderedAndProject), never a full sort of the counts.  ``spread``
    unpins the CPU-heavy tokenize+explode from the single-file local scan
    (no-op on a real multi-split table)."""
    d = spread(load_table(spark, sf, "documents"))
    bg = d.select(F.explode(T.bigrams(F.col("text"))).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "x_pii_scan",
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
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_urls,
           len(regexp_extract_all(text, '\\+?[0-9][0-9()\\-. ]{7,}[0-9]')) AS n_phones
    FROM enriched
    WHERE len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(text, 'https?://[^\\s]+'))
          + len(regexp_extract_all(text, '\\+?[0-9][0-9()\\-. ]{7,}[0-9]')) > 0
    """,
)
def x_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII triage: per-doc email/URL/phone-like match counts, rows only for
    docs with at least one hit (the redaction work queue).  The synthetic
    corpus is PII-free, so the query deterministically plants email/URL/
    phone strings on doc_id residue classes first — the detectors are
    exercised against real positive AND negative rows.  Pure regex Column
    expressions; the redaction rewrite is the same patterns through
    ``regexp_replace``."""
    d = load_table(spark, sf, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" see https://example.org/doc/"), F.col("doc_id").cast("string")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" call +1 (555) 123-4567")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    emails, urls, phones = T.pii_counts(F.col("text"))
    scored = planted.select(
        "doc_id",
        emails.cast("long").alias("n_emails"),
        urls.cast("long").alias("n_urls"),
        phones.cast("long").alias("n_phones"),
    )
    return scored.filter(
        (F.col("n_emails") + F.col("n_urls") + F.col("n_phones")) > 0
    )


_ZORDER_READY: set[str] = set()
_BUCKETED_READY: set[str] = set()


def ensure_bucketed_tables(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Once-per-session setup for :func:`j_bucketed_join`: write orders and
    customer as 16-bucket hash-bucketed catalog tables on the customer key
    (``ops.layout.write_bucketed``) under ``.tmp``.  Bucketing is the
    pre-paid shuffle — at 100 TB you pay it once per ingest, and every
    later equi-join on the key plans with no Exchange; here the write is
    the once-per-session analog, so the registered query measures the
    co-located JOIN, not its own setup."""
    import os as _os

    tag = _os.path.basename(sf.rstrip("/")).replace(".", "_")
    to, tc = f"bj_orders_{tag}", f"bj_customer_{tag}"
    if tag in _BUCKETED_READY:
        return to, tc
    from kafka_streaming_spark.ops.layout import write_bucketed

    base = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".tmp",
        f"bucketed_{tag}",
    )
    write_bucketed(
        load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        to, 16, ["o_custkey"], path=f"{base}/orders",
    )
    write_bucketed(
        load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
        tc, 16, ["c_custkey"], path=f"{base}/customer",
    )
    _BUCKETED_READY.add(tag)
    return to, tc


@register(
    "j_bucketed_join",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-free co-located join on pre-bucketed tables: both sides are
    hash-bucketed 16 ways on the customer key, so the sort-merge join reads
    bucket i against bucket i with NO Exchange below the join — the plan is
    gated in tests/test_plan_quality.py.  The ``merge`` hint only rules out
    a broadcast plan (which would mask whether co-location was proven);
    values must equal the plain-join oracle."""
    to, tc = ensure_bucketed_tables(spark, sf)
    joined = spark.table(to).join(
        spark.table(tc).hint("merge"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "j_skew_salted_join",
    """
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 5 < 3 THEN 1 ELSE l_suppkey END AS hot_key,
             l_extendedprice
      FROM lineitem
    )
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS revenue
    FROM skewed JOIN supplier ON hot_key = s_suppkey
    GROUP BY s_nationkey
    """,
)
def j_skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resistant salted join: 60% of lineitem rows are planted onto
    one hot supplier key (the deliberately adversarial case a plain
    shuffle join serializes onto one reducer), then joined via
    :func:`~kafka_streaming_spark.ops.joins.salted_join` — big side
    salted into 8 sub-keys, dim side replicated across them — so the hot
    key spreads over 8 reducers.  The ``shuffle_hash`` hint rules out a
    broadcast plan at test scale (which would mask the rewrite); values
    must equal the plain-join oracle."""
    li = load_table(spark, sf, "lineitem").select(
        F.when(F.col("l_orderkey") % 5 < 3, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("hot_key"),
        "l_extendedprice",
    )
    su = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("hot_key"), "s_nationkey"
    )
    joined = salted_join(li, su.hint("shuffle_hash"), ["hot_key"], buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice"), "revenue"),
    )


@register(
    "x_triangle_count",
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
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges
    FROM pairs e1
    JOIN pairs e2 ON e1.v = e2.u
    JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
    """,
)
def x_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting on the co-purchase graph (support ≥ 3 edges from
    within-order item pairs) via the oriented-edge join: every edge is
    stored once as ``u < v``, so each triangle is found exactly once by
    ``(u,v)⋈(v,w)⋈(u,w)`` — no division by 6, no direction blowup.  At
    scale the orientation step orders by DEGREE, not id (bounding the
    join fan-out of hub nodes at O(m^1.5) — the standard fix documented
    here; id-orientation is used in the registered config because the
    derived graph is small and the oracle must match exactly).  Two
    self-joins co-partitioned on the join keys; the graph-family
    complement of connected components and PageRank."""
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
    # data-derived support: keep edges co-purchased above the MEAN pair
    # count (integer compare c*np > tot — no float, scale-factor-free)
    st = pairs0.agg(F.sum("__c").alias("__tot"), F.count(F.lit(1)).alias("__np"))
    # cached: the filtered edge list feeds FOUR scans (e1/e2/e3 of the
    # triangle join + the edge count) — without it the whole
    # items-self-join + stats subplan re-executes per scan
    pairs = (
        pairs0.crossJoin(F.broadcast(st))
        .filter(F.expr("__c * __np > __tot"))
        .select("u", "v")
        .cache()
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return G.triangle_count(pairs).crossJoin(F.broadcast(n_edges))


@register(
    "x_skew_profile",
    """
    WITH k1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_suppkey
    ), k2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY o_custkey
    ), k3 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
    )
    SELECT 'lineitem.l_suppkey' AS join_key,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_rows,
           CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_rows,
           (MAX(c) * 1000000) // CAST(SUM(c) // COUNT(*) AS BIGINT) AS skew_ratio_micro
    FROM k1
    UNION ALL
    SELECT 'orders.o_custkey', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
           CAST(SUM(c) // COUNT(*) AS BIGINT),
           (MAX(c) * 1000000) // CAST(SUM(c) // COUNT(*) AS BIGINT)
    FROM k2
    UNION ALL
    SELECT 'events.user_id', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
           CAST(SUM(c) // COUNT(*) AS BIGINT),
           (MAX(c) * 1000000) // CAST(SUM(c) // COUNT(*) AS BIGINT)
    FROM k3
    """,
)
def x_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew profiler — the diagnostic that decides between a
    plain shuffle join, AQE skew splitting, and an explicit salted join
    (`j_skew_salted_join`): per candidate key, the key count, the hottest
    key's row count, the mean, and max/mean in integer micro-units.  One
    count aggregate per key (map-side partials); output is 3 rows
    regardless of scale."""

    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        c = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        return c.agg(
            F.lit(label).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_rows"),
            F.expr("sum(c) DIV count(1)").alias("mean_rows"),
            F.expr("(max(c) * 1000000) DIV (sum(c) DIV count(1))").alias(
                "skew_ratio_micro"
            ),
        )

    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    e = load_table(spark, sf, "events")
    return (
        profile(li, "l_suppkey", "lineitem.l_suppkey")
        .unionAll(profile(o, "o_custkey", "orders.o_custkey"))
        .unionAll(profile(e, "user_id", "events.user_id"))
    )


@register(
    "x_dup_rate_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           ((CAST(COUNT(*) AS BIGINT) - CAST(COUNT(DISTINCT md5(text)) AS BIGINT))
            * 1000000) // CAST(COUNT(*) AS BIGINT) AS dup_rate_micro
    FROM documents GROUP BY source
    """,
)
def x_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Duplication rate per source — the corpus-health metric that decides
    where dedup effort goes: exact-duplicate fraction via content-digest
    distinct counts, one grouped aggregate (the digest keeps full text
    out of the distinct-count shuffle)."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr("((n_docs - n_distinct) * 1000000) DIV n_docs").alias(
                "dup_rate_micro"
            ),
        )
    )


@register(
    "x_token_budget",
    """
    WITH t AS (
      SELECT lang, source,
             CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM t
    )
    SELECT t.lang, t.source, t.n_tokens,
           (t.n_tokens * 1000000) // tot.tt AS share_micro
    FROM t CROSS JOIN tot
    """,
)
def x_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget mixture report: tokens per (lang, source) cell with
    its share of the corpus in integer micro-units — the data-mixture
    accounting every pretraining run starts from (the measurement side of
    `x_dataset_mix`'s resampling).  Token counts are map-side ``size``
    expressions; one grouped sum + a 1-row total broadcast."""
    d = load_table(spark, sf, "documents")
    t = d.groupBy("lang", "source").agg(
        F.sum(F.size(T.tokens(F.lower(F.col("text"))))).alias("n_tokens")
    )
    tot = t.agg(F.sum("n_tokens").alias("tt"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_tokens",
            F.expr("(n_tokens * 1000000) DIV tt").alias("share_micro"),
        )
    )


@register(
    "x_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5('kmv:' || CAST(event_id AS VARCHAR)), 1, 15))
                           AS BIGINT) AS hv
      FROM events
    ), kth AS (
      SELECT hv AS kth_min FROM h ORDER BY hv LIMIT 1 OFFSET 63
    ), exact AS (
      SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact FROM events
    )
    SELECT 64 AS k, kth.kth_min,
           63 * (1152921504606846976 // kth.kth_min) AS est_distinct,
           exact.n_exact
    FROM kth CROSS JOIN exact
    """,
)
def x_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch: keep the
    k smallest 60-bit hashes of the key; estimate ``(k-1) * (2^60 DIV
    h_k)`` from the k-th minimum — integer-exact, so unlike HLL the whole
    sketch AND its estimate are value-hash checked against DuckDB
    (`a_approx_sketch` stays the rows-only native-HLL witness).  The
    bottom-k is a partial TakeOrdered (each partition contributes at most
    k hashes, no full shuffle of the key space), the sketch is mergeable
    by construction (union = min-k of concatenation), and the estimate is
    reported next to the exact count so the error is visible."""
    e = load_table(spark, sf, "events")
    h = e.select(
        D.portable_hash60(
            F.concat(F.lit("kmv:"), F.col("event_id").cast("string"))
        ).alias("hv")
    ).distinct()
    kth = (
        h.orderBy("hv")
        .limit(64)
        .agg(F.max("hv").alias("kth_min"))
    )
    exact = e.agg(F.countDistinct("event_id").alias("n_exact"))
    return (
        kth.crossJoin(F.broadcast(exact))
        .select(
            F.lit(64).alias("k"),
            "kth_min",
            F.expr("63 * (1152921504606846976 DIV kth_min)").alias("est_distinct"),
            "n_exact",
        )
    )


@register(
    "x_kmv_overlap",
    """
    WITH tok AS (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents WHERE source IN ('src0', 'src1')
    ), h AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substr(md5('kmvo:' || tok), 1, 15)) AS BIGINT) AS hv
      FROM tok
    ), ska AS (
      SELECT hv FROM h WHERE source = 'src0' ORDER BY hv LIMIT 128
    ), skb AS (
      SELECT hv FROM h WHERE source = 'src1' ORDER BY hv LIMIT 128
    ), mk AS (
      SELECT DISTINCT hv
      FROM (SELECT hv FROM ska UNION ALL SELECT hv FROM skb)
      ORDER BY hv LIMIT 128
    ), tau AS (
      SELECT MAX(hv) AS tau, CAST(COUNT(*) AS BIGINT) AS k_eff FROM mk
    ), com AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common_sketch
      FROM ska JOIN skb USING (hv) CROSS JOIN tau
      WHERE ska.hv <= tau.tau
    ), ex AS (
      SELECT CAST(SUM(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common_exact,
             CAST(COUNT(*) AS BIGINT) AS n_union_exact
      FROM (SELECT tok, COUNT(DISTINCT source) AS n_src FROM tok GROUP BY tok)
    )
    SELECT tau.k_eff, tau.tau, com.n_common_sketch,
           CAST((com.n_common_sketch * 1000000) // tau.k_eff AS BIGINT)
             AS jaccard_est_micro,
           ex.n_common_exact, ex.n_union_exact,
           CAST((ex.n_common_exact * 1000000) // ex.n_union_exact AS BIGINT)
             AS jaccard_true_micro
    FROM tau CROSS JOIN com CROSS JOIN ex
    """,
)
def x_kmv_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """KMV sketch SET OPERATIONS: estimate the Jaccard overlap between two
    corpus slices' token vocabularies by MERGING their bottom-k sketches —
    union = min-k of the concatenation, intersection estimate = shared
    hashes below the merged k-th minimum, Jaccard ≈ |shared ≤ τ| / k.
    This is the property that matters at 100 TB: per-slice sketches are
    tiny (k hashes), build in one pass each, and compose WITHOUT touching
    the raw data again — cross-source overlap matrices over hundreds of
    slices become k-row joins.  The exact vocabulary Jaccard rides along
    so the sketch error is visible; all arithmetic is 60-bit integer
    hashes and micro-unit divisions, bit-identical in DuckDB.  Scale
    shape: each bottom-k is a partial TakeOrdered (every partition
    contributes ≤ k hashes — no full shuffle of the vocabulary); the
    merge/estimate stages touch ≤ 2k rows."""
    d = load_table(spark, sf, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    # cached: the tokenized corpus feeds BOTH the sketch path and the
    # exact-Jaccard path; each bottom-k sketch feeds the merge AND the
    # pairwise intersection — uncached, the explode+distinct subtree
    # re-executes per consumer
    tok = d.select(
        "source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    ).distinct().cache()
    h = tok.select(
        "source",
        D.portable_hash60(F.concat(F.lit("kmvo:"), F.col("tok"))).alias("hv"),
    ).distinct()
    ska = (
        h.filter(F.col("source") == "src0").select("hv").orderBy("hv").limit(128).cache()
    )
    skb = (
        h.filter(F.col("source") == "src1").select("hv").orderBy("hv").limit(128).cache()
    )
    merged = ska.unionAll(skb).distinct().orderBy("hv").limit(128)
    tau = merged.agg(
        F.max("hv").alias("tau"), F.count(F.lit(1)).alias("k_eff")
    )
    com = (
        ska.join(skb, "hv")
        .crossJoin(F.broadcast(tau))
        .filter(F.col("hv") <= F.col("tau"))
        .agg(F.count(F.lit(1)).alias("n_common_sketch"))
    )
    ex = (
        tok.groupBy("tok")
        .agg(F.countDistinct("source").alias("n_src"))
        .agg(
            F.sum(F.when(F.col("n_src") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_common_exact"),
            F.count(F.lit(1)).alias("n_union_exact"),
        )
    )
    return (
        tau.crossJoin(F.broadcast(com))
        .crossJoin(F.broadcast(ex))
        .select(
            "k_eff",
            "tau",
            "n_common_sketch",
            F.expr("(n_common_sketch * 1000000) DIV k_eff")
            .cast("long")
            .alias("jaccard_est_micro"),
            "n_common_exact",
            "n_union_exact",
            F.expr("(n_common_exact * 1000000) DIV n_union_exact")
            .cast("long")
            .alias("jaccard_true_micro"),
        )
    )


@register(
    "x_market_basket",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey % 200 AS item
      FROM lineitem
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ), item_cnt AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT p.item_a, p.item_b, p.n_ab,
           (p.n_ab * n_orders.n * 1000000) // (ca.c * cb.c) AS lift_micro
    FROM pairs p
    JOIN item_cnt ca ON p.item_a = ca.item
    JOIN item_cnt cb ON p.item_b = cb.item
    CROSS JOIN n_orders
    ORDER BY p.n_ab DESC, p.item_a, p.item_b LIMIT 25
    """,
)
def x_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence (the collaborative-filtering /
    association-rule building block): item pairs co-purchased within an
    order, with lift = P(ab)/(P(a)P(b)) in exact integer micro-units.
    The pair join is WITHIN the order key — work bounded by
    basket_size² per order, never |items|² — then pair counts aggregate
    globally (map-side partials) and the small item-count table joins
    broadcast.  Top-25 by (support, pair) total order."""
    li = load_table(spark, sf, "lineitem")
    # cached: the basket list feeds the count tables AND both pairing
    # sides — uncached, the lineitem distinct re-executes per consumer
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 200).alias("item")
    ).distinct().cache()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    item_cnt = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey"), F.col("item").alias("item_a"))
    b = items.select(F.col("l_orderkey"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ca = item_cnt.select(F.col("item").alias("item_a"), F.col("c").alias("__ca"))
    cb = item_cnt.select(F.col("item").alias("item_b"), F.col("c").alias("__cb"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.expr("(n_ab * n * 1000000) DIV (__ca * __cb)").alias("lift_micro"),
        )
        .orderBy(F.col("n_ab").desc(), "item_a", "item_b")
        .limit(25)
    )


@register(
    "w_range_frame_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                      RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_24h_cents
    FROM events
    """,
)
def w_range_frame_sum(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-framed window (value-based frame, not the ROWS frames the
    analytic pack covers): per user, the trailing-24-hour running sum —
    the frame is defined by TIME distance on the epoch-millis ordering,
    so equal-timestamp peers enter together and gaps shrink the frame.
    Integer-cent sums keep frame accumulation exact; per-user partitions
    bound window state."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-86400000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).cast("long").alias("trailing_24h_cents"),
    )


@register(
    "x_dataset_card",
    """
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM documents)
             AS n_distinct_texts,
           (SELECT CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
                   AS BIGINT) FROM documents) AS n_tokens,
           (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
           (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
             AS n_sources,
           (SELECT CAST(MIN(n_chars) AS BIGINT) FROM documents) AS min_chars,
           (SELECT CAST(MAX(n_chars) AS BIGINT) FROM documents) AS max_chars
    """,
)
def x_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """One-row dataset card: the header numbers every corpus release
    ships (doc/token counts, distinct-content count, language/source
    cardinalities, length bounds) — all from ONE pass (a single agg with
    every measure; the oracle's scalar subqueries are the portable
    spelling)."""
    d = load_table(spark, sf, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
        F.sum(F.size(T.tokens(F.lower(F.col("text"))))).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "x_path_analysis",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 10
    """,
)
def x_path_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """Top user paths: every 3-step event sequence per user timeline
    (two ``lead``s over one window pass — not a triple self-join),
    counted globally, top-10 with a total order — the navigation-path
    mining query behind every product-flow sankey.  One window shuffle
    on user_id + one bounded count shuffle."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(10)
    )


@register(
    "x_session_funnel",
    _SESSIONIZE_CTE.format(cmp=">").replace(
        "SELECT user_id, ts, value,", "SELECT user_id, ts, event_type, value,"
    ).replace(
        """SELECT user_id, ts,
             CAST(SUM(new_s)""",
        """SELECT user_id, ts, event_type,
             CAST(SUM(new_s)""",
    )
    + """
    , t1 AS (
      SELECT user_id, session_id, MIN(ts) AS t1 FROM sess
      WHERE event_type = 'view' GROUP BY user_id, session_id
    ), t2 AS (
      SELECT s.user_id, s.session_id, MIN(s.ts) AS t2
      FROM sess s JOIN t1 ON s.user_id = t1.user_id
                        AND s.session_id = t1.session_id AND s.ts > t1.t1
      WHERE s.event_type = 'purchase' GROUP BY s.user_id, s.session_id
    )
    SELECT (SELECT CAST(COUNT(DISTINCT user_id || '#' || session_id) AS BIGINT)
            FROM sess) AS n_sessions,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_viewing_sessions,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_converting_sessions
    """,
)
def x_session_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Within-session conversion: sessions (4-hour gap rule, the
    `t_sessionize` operator) where a purchase follows a view INSIDE the
    same session — the funnel scoped to a visit instead of a lifetime.
    Stage anchors are per-(user, session) min-aggregates + one join, the
    same bounded-state shape as `x_event_funnel`, keyed by the composite
    session key."""
    from kafka_streaming_spark.ops.sessionize import sessionize

    e = load_table(spark, sf, "events").select("user_id", "ts", "event_type")
    sess = sessionize(e, ["user_id"], "ts", gap=_SESSION_GAP)
    keys = ["user_id", "session_id"]
    t1 = (
        sess.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        sess.filter(F.col("event_type") == "purchase")
        .join(t1, keys)
        .filter(F.col("ts") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t2"))
    )
    n_sessions = sess.select(*keys).distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    n_view = t1.agg(F.count(F.lit(1)).alias("n_viewing_sessions"))
    n_conv = t2.agg(F.count(F.lit(1)).alias("n_converting_sessions"))
    return (
        n_sessions.crossJoin(F.broadcast(n_view)).crossJoin(F.broadcast(n_conv))
    )


@register(
    "x_distribution_drift",
    """
    WITH halves AS (
      SELECT lang, doc_id % 2 AS half FROM documents
    ), cnt AS (
      SELECT lang,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM halves GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb FROM cnt
    )
    SELECT cnt.lang, cnt.a AS n_ref, cnt.b AS n_new,
           (cnt.a * 1000000) // tot.ta AS share_ref_micro,
           (cnt.b * 1000000) // tot.tb AS share_new_micro,
           abs((cnt.a * 1000000) // tot.ta - (cnt.b * 1000000) // tot.tb)
             AS abs_drift_micro
    FROM cnt CROSS JOIN tot
    """,
)
def x_distribution_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Categorical distribution drift between a reference and a new
    corpus slice (deterministic halves here; two snapshots in practice):
    per-category shares in integer micro-units and their absolute
    difference — sum the last column for total-variation-style drift.
    The monitor that catches a silently shifted language/source mix
    before it skews training.  Two conditional-sum aggregates + a 1-row
    totals broadcast."""
    d = load_table(spark, sf, "documents")
    cnt = d.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("a"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("b"),
    )
    tot = cnt.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("a").alias("n_ref"),
            F.col("b").alias("n_new"),
            F.expr("(a * 1000000) DIV ta").alias("share_ref_micro"),
            F.expr("(b * 1000000) DIV tb").alias("share_new_micro"),
            F.expr("abs((a * 1000000) DIV ta - (b * 1000000) DIV tb)").alias(
                "abs_drift_micro"
            ),
        )
    )


@register(
    "x_histogram",
    """
    SELECT CAST(least(floor(value / 10.0), 9) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(MIN(value) * 1000000.0) AS BIGINT) / 1000000.0 AS lo,
           CAST(ROUND(MAX(value) * 1000000.0) AS BIGINT) / 1000000.0 AS hi
    FROM events GROUP BY 1
    """,
)
def x_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram (the equal-WIDTH complement of the
    equal-frequency `x_quantile_binning`): ten 10-unit buckets with the
    top bucket clamped, observed min/max per bucket.  Pure map-side
    bucketing + one grouped aggregate; bucket boundaries are exact float
    division + floor, identical in both engines."""
    e = load_table(spark, sf, "events")
    bucket = F.least(F.floor(F.col("value") / 10.0), F.lit(9)).cast("long")
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        _round_fixed(F.min("value"), 6).alias("lo"),
        _round_fixed(F.max("value"), 6).alias("hi"),
    )


@register(
    "x_order_fill_latency",
    """
    WITH fill AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) AS days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(quantile_cont(days, 0.5) * 1000000.0) AS BIGINT) / 1000000.0
             AS p50_days,
           CAST(ROUND(quantile_cont(days, 0.95) * 1000000.0) AS BIGINT) / 1000000.0
             AS p95_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM fill GROUP BY o_orderpriority
    """,
)
def x_order_fill_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Order-fulfillment latency: order date → LAST line shipment, in
    days, summarized per priority class (p50/p95/max) — the operational
    SLA readout.  One join co-partitioned on the order key, a per-order
    max, then exact percentiles over the small per-order table."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    fill = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias("days"),
        )
    )
    return fill.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _round_fixed(F.expr("percentile(days, 0.5)"), 6).alias("p50_days"),
        _round_fixed(F.expr("percentile(days, 0.95)"), 6).alias("p95_days"),
        F.max("days").cast("long").alias("max_days"),
    )


@register(
    "x_repeat_purchase",
    """
    WITH pu AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           (CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000) // CAST(COUNT(*) AS BIGINT) AS repeat_rate_micro,
           CAST(MAX(n_purchases) AS BIGINT) AS max_purchases
    FROM pu
    """,
)
def x_repeat_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Repeat-purchase rate: buyers with ≥2 purchases as a fraction of
    all buyers (integer micro-units), plus the heaviest buyer — the
    retention KPI next to the cohort triangle.  One filtered count
    aggregate + a 1-row fold."""
    e = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    pu = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_purchases"))
    return pu.agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum((F.col("n_purchases") >= 2).cast("long")).alias("n_repeat"),
        F.expr(
            "(sum(CAST(n_purchases >= 2 AS BIGINT)) * 1000000) DIV count(1)"
        ).alias("repeat_rate_micro"),
        F.max("n_purchases").alias("max_purchases"),
    )


@register(
    "x_ab_test",
    """
    WITH assign AS (
      SELECT CAST(concat('0x', substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ), s AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                  AS DECIMAL(38,12)) AS sxx
      FROM assign GROUP BY arm
    )
    SELECT arm, n,
           CAST(ROUND((CAST(sx AS DOUBLE) / n) * 1000000.0) AS BIGINT) / 1000000.0
             AS mean_value,
           CAST(ROUND((CAST(n * sxx - sx * sx AS DOUBLE) / (n * n)) * 1000000.0)
                AS BIGINT) / 1000000.0 AS var_pop
    FROM s
    """,
)
def x_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Experimentation primitive: users assigned to arms by a pure hash
    (stable under retries, rebalances, and re-runs — the property rand()
    assignment lacks), per-arm mean and variance from exact decimal power
    sums (a_stats_pack's order-independence argument), ready for the
    z-test the analyst runs on top.  One scan + a 2-group aggregate."""
    e = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    from kafka_streaming_spark.functions.dedup import portable_hash60

    dv = F.col("value").cast("decimal(18,6)")
    s = (
        e.select(
            F.pmod(
                portable_hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("arm"),
            F.col("value"),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dv).alias("sx"),
            F.sum((dv * dv).cast("decimal(38,12)")).alias("sxx"),
        )
    )
    return s.select(
        "arm",
        "n",
        _round_fixed(F.col("sx").cast("double") / F.col("n"), 6).alias("mean_value"),
        _round_fixed(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n") * F.col("n")),
            6,
        ).alias("var_pop"),
    )


@register(
    "x_traffic_anomaly",
    """
    WITH daily AS (
      SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day_num,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), trail AS (
      SELECT day_num, n,
             CAST(SUM(n) OVER w AS BIGINT) AS t_sum,
             CAST(COUNT(*) OVER w AS BIGINT) AS t_n
      FROM daily
      WINDOW w AS (ORDER BY day_num RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day_num, n,
           CAST(CASE WHEN t_n > 0 THEN t_sum // t_n ELSE NULL END AS BIGINT)
             AS trailing_mean,
           CAST(t_n > 0 AND n * t_n * 2 > t_sum * 3 AS BIGINT) AS is_spike
    FROM trail
    """,
)
def x_traffic_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Traffic-spike monitor: daily volumes vs the trailing-7-day mean
    (RANGE frame ending 1 day BEFORE current, so a spike can't mask
    itself), flagged when volume exceeds 1.5x the trailing mean — the
    threshold compares in exact integer cross-multiplication
    (``n * t_n * 2 > t_sum * 3``), no float boundary.  Window state is
    |days| rows; the raw-event pass is one count aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long").alias("day_num")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day_num").rangeBetween(-7, -1)
    trail = daily.select(
        "day_num",
        "n",
        F.sum("n").over(w).alias("t_sum"),
        F.count(F.lit(1)).over(w).alias("t_n"),
    )
    return trail.select(
        "day_num",
        "n",
        F.when(F.col("t_n") > 0, F.expr("t_sum DIV t_n")).alias("trailing_mean"),
        (
            (F.col("t_n") > 0)
            & (F.col("n") * F.col("t_n") * 2 > F.col("t_sum") * 3)
        )
        .cast("long")
        .alias("is_spike"),
    )


@register(
    "x_user_growth",
    """
    WITH first AS (
      SELECT user_id,
             CAST(MIN(floor(epoch_ms(ts) / 86400000.0)) AS BIGINT) AS day_num
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT day_num, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first GROUP BY day_num
    )
    SELECT day_num, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day_num
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def x_user_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Growth accounting: new users per day (first-activity day per user)
    and the cumulative running total — the \"running distinct count over
    time\" computed the scalable way: min-aggregate per user + a running
    sum over the tiny per-day table (a naive cumulative COUNT(DISTINCT)
    window would drag full user sets through every frame).  The only
    unpartitioned window runs over |days| rows."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long")).alias(
            "day_num"
        )
    )
    daily = first.groupBy("day_num").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day_num", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


@register(
    "x_interval_overlap",
    """
    WITH windows(win_id, w_start, w_end) AS (
      VALUES (0, TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
             (1, TIMESTAMP '2024-01-15 12:00:00', TIMESTAMP '2024-01-16 00:00:00'),
             (2, TIMESTAMP '2024-01-25 06:00:00', TIMESTAMP '2024-01-28 00:00:00')
    ), spans AS (
      SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM events GROUP BY user_id
    )
    SELECT w.win_id, CAST(COUNT(*) AS BIGINT) AS n_overlapping_users
    FROM spans s JOIN windows w
      ON s.s_start < w.w_end AND w.w_start < s.s_end
    GROUP BY w.win_id
    """,
)
def x_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join (two interval SETS, not point-in-range like
    the band join): per-user activity spans against literal maintenance
    windows with the canonical ``a.start < b.end AND b.start < a.end``
    predicate — a broadcast nested loop over the bounded window side, so
    the big side streams map-side.  Counts overlapping users per
    window."""
    e = load_table(spark, sf, "events")
    spans = e.groupBy("user_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    windows = spark.createDataFrame(
        [
            (0, "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
            (1, "2024-01-15 12:00:00", "2024-01-16 00:00:00"),
            (2, "2024-01-25 06:00:00", "2024-01-28 00:00:00"),
        ],
        ["win_id", "w_start", "w_end"],
    ).select(
        "win_id",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )
    joined = spans.join(
        F.broadcast(windows),
        (F.col("s_start") < F.col("w_end")) & (F.col("w_start") < F.col("s_end")),
    )
    return joined.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_overlapping_users")
    )


@register(
    "x_gdpr_purge_audit",
    """
    WITH del AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0
    ), kept AS (
      SELECT e.* FROM events e LEFT JOIN del ON e.user_id = del.user_id
      WHERE del.user_id IS NULL
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS rows_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS rows_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS rows_purged,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM del) AS subjects_purged,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM kept k
             JOIN del ON k.user_id = del.user_id) AS residual_rows
    """,
)
def x_gdpr_purge_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-erasure purge with its audit trail: a deletion-subject
    list anti-joins the fact table, and the audit row carries
    before/after/purged counts plus a RESIDUAL check (kept rows still
    matching a deleted subject — must be 0; the query proves it rather
    than assuming it).  Anti-join + semi-join on the subject key; the
    deletion list broadcasts at any realistic subject count."""
    e = load_table(spark, sf, "events")
    del_ = e.filter(F.col("user_id") % 13 == 0).select("user_id").distinct()
    kept = e.join(del_, "user_id", "left_anti")
    nb = e.agg(F.count(F.lit(1)).alias("rows_before"))
    na = kept.agg(F.count(F.lit(1)).alias("rows_after"))
    nd = del_.agg(F.count(F.lit(1)).alias("subjects_purged"))
    nres = kept.join(del_, "user_id").agg(F.count(F.lit(1)).alias("residual_rows"))
    return (
        nb.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(nres))
        .select(
            "rows_before",
            "rows_after",
            (F.col("rows_before") - F.col("rows_after")).alias("rows_purged"),
            "subjects_purged",
            "residual_rows",
        )
    )


@register(
    "x_ivm_join",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100.0 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def x_ivm_join(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the lineitem side splits
    into base + delta (key residue), each part joins orders and
    aggregates SEPARATELY, and the combined per-key states must equal the
    single-pass oracle — the ΔA⋈B delta-join identity that lets a 100 TB
    join view absorb new data without rescanning history (the join
    analog of `a_incremental_fold`'s aggregate IVM).  DECIMAL
    accumulation keeps the two-part combine exactly associative."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    base = li.filter(F.col("l_orderkey") % 5 != 0)
    delta = li.filter(F.col("l_orderkey") % 5 == 0)

    def part(side: DataFrame) -> DataFrame:
        return (
            side.join(o, side["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
            )
        )

    combined = (
        part(base)
        .unionAll(part(delta))
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_items"), F.sum("s").alias("__s"))
    )
    return combined.select(
        "o_orderpriority", "n_items", dfix(F.col("__s"), "revenue")
    )


@register(
    "x_ntile_quartiles",
    """
    WITH q AS (
      SELECT user_id, value,
             ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
      FROM events
    )
    SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_value
    FROM q GROUP BY quartile
    """,
)
def x_ntile_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user timeline quartiles via ``ntile`` (the bucketed-window
    function the analytic pack doesn't cover): each user's events split
    into 4 equal-count position buckets ordered by (ts, event_id), then
    per-quartile totals — early-vs-late lifecycle comparison.  The
    window partitions by user_id (bounded per-key state), never a global
    sort."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = e.select("value", F.ntile(4).over(w).alias("quartile"))
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "sum_value")
    )


@register(
    "x_data_contract",
    """
    SELECT 'value_range' AS rule,
           CAST(SUM(CASE WHEN value < 0 OR value > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM events
    UNION ALL
    SELECT 'ts_in_window',
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
                           OR ts >= TIMESTAMP '2024-02-01 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'type_in_enum',
           CAST(SUM(CASE WHEN event_type NOT IN
                           ('signup','view','click','purchase','error')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'user_not_null',
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    """,
)
def x_data_contract(spark: SparkSession, sf: str) -> DataFrame:
    """Data-contract validation (the dbt-test / expectations shape): four
    declared rules — numeric range, event-time window, enum membership,
    not-null — evaluated as conditional sums in ONE table pass (the four
    oracle scans collapse to one on the Spark side; DuckDB's UNION ALL
    form is the portable spelling of the same counts), reported one row
    per rule so a quality dashboard can alert per contract clause."""
    e = load_table(spark, sf, "events")
    rules = {
        "value_range": (F.col("value") < 0) | (F.col("value") > 100),
        "ts_in_window": (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
        | (F.col("ts") >= F.lit("2024-02-01 00:00:00").cast("timestamp")),
        "type_in_enum": ~F.col("event_type").isin(
            "signup", "view", "click", "purchase", "error"
        ),
        "user_not_null": F.col("user_id").isNull(),
    }
    one = e.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[F.sum(cond.cast("long")).alias(f"__v_{r}") for r, cond in rules.items()],
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rule"),
                        F.col(f"__v_{r}").alias("n_violations"),
                        F.col("n_checked"),
                    )
                    for r in rules
                ]
            )
        ).alias("p")
    ).select("p.*")


@register(
    "x_snapshot_diff",
    """
    WITH a AS (
      SELECT event_id, value FROM events WHERE event_id % 97 != 0
    ), b AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN value + 1.0 ELSE value END AS value
      FROM events WHERE event_id % 89 != 0
    ), j AS (
      SELECT coalesce(a.event_id, b.event_id) AS k,
             a.event_id IS NULL AS only_b,
             b.event_id IS NULL AS only_a,
             a.value AS va, b.value AS vb
      FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
    )
    SELECT CAST(SUM(CASE WHEN only_b THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN only_a THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN NOT only_a AND NOT only_b AND va != vb
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN NOT only_a AND NOT only_b AND va = vb
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same
    FROM j
    """,
)
def x_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot reconciliation: two deterministic table versions (rows
    dropped on different key residues; a value perturbation on a third
    residue) diffed by a FULL OUTER JOIN on the key into
    added/removed/changed/same counts — the audit primitive behind every
    incremental-pipeline regression check.  One co-partitioned outer join
    + a single-row aggregate; exact float equality is safe because both
    sides derive from the same stored doubles."""
    e = load_table(spark, sf, "events").select("event_id", "value")
    a = e.filter(F.col("event_id") % 97 != 0)
    b = e.filter(F.col("event_id") % 89 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.event_id") == F.col("b.event_id"), "full_outer"
    )
    only_b = F.col("a.event_id").isNull()
    only_a = F.col("b.event_id").isNull()
    both = ~only_a & ~only_b
    return j.agg(
        F.sum(only_b.cast("long")).alias("n_added"),
        F.sum(only_a.cast("long")).alias("n_removed"),
        F.sum((both & (F.col("a.value") != F.col("b.value"))).cast("long")).alias(
            "n_changed"
        ),
        F.sum((both & (F.col("a.value") == F.col("b.value"))).cast("long")).alias(
            "n_same"
        ),
    )


_FORMAT_READY: set[str] = set()


def _ensure_format_copy(spark: SparkSession, sf: str, fmt: str) -> str:
    """Once-per-sf events copy in another source format (csv / json
    lines), for the format-scan queries: written idempotently under
    ``.tmp`` from the immutable parquet source.  Only
    integer/double/string columns are written (timestamps round-trip
    through epoch millis upstream; CSV/JSON timestamp parsing is a
    format-flag swamp that adds nothing to the scan path under test)."""
    import os as _os

    dest = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".tmp",
        f"events_{fmt}_{_os.path.basename(sf.rstrip('/'))}",
    )
    if dest in _FORMAT_READY:
        return dest
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        ev = load_table(spark, sf, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        w = ev.coalesce(4).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(dest)
        elif fmt == "orc":
            w.orc(dest)
        else:
            w.json(dest)
    _FORMAT_READY.add(dest)
    return dest


_FORMAT_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_value
    FROM events GROUP BY event_type
"""


def _format_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        dsum(F.col("value"), "sum_value"),
    )


@register("f_csv_scan", _FORMAT_ORACLE)
def f_csv_scan(spark: SparkSession, sf: str) -> DataFrame:
    """CSV source path end to end: the events table round-trips through a
    headered CSV copy (Java double formatting round-trips exactly, so the
    re-parsed values are bit-identical) and is read back with an EXPLICIT
    schema — never inferSchema, which would scan every file twice at
    100 TB — then aggregated; the oracle reads the original parquet, so a
    pass proves write → text → typed parse lossless."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = _ensure_format_copy(spark, sf, "csv")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.read.schema(schema).option("header", True).csv(path)
    return _format_agg(df)


@register("f_jsonl_scan", _FORMAT_ORACLE)
def f_jsonl_scan(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-lines source path end to end (same contract as `f_csv_scan`:
    explicit schema, no inference pass; values round-trip exactly)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = _ensure_format_copy(spark, sf, "json")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.read.schema(schema).json(path)
    return _format_agg(df)


@register("f_orc_scan", _FORMAT_ORACLE)
def f_orc_scan(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source path end to end (the third columnar-format leg after
    parquet: same contract as `f_csv_scan` — explicit schema, values
    round-trip exactly; ORC ships in Spark core, no external package).
    Avro is the one mainstream format NOT covered: spark-avro is an
    external jar absent from this environment (probe:
    ``AnalysisException`` on ``format("avro")``) — the reader call is a
    one-line swap of this function when the jar is present."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = _ensure_format_copy(spark, sf, "orc")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.read.schema(schema).orc(path)
    return _format_agg(df)


def ensure_zorder_layout(spark: SparkSession, sf: str) -> str:
    """Once-per-sf OPTIMIZE/ZORDER setup for :func:`x_zorder_scan`: lay the
    events out on a (user, time) Z-curve (``ops.layout.zorder`` — one
    min/max job + one range shuffle) into ``.tmp`` and return the path.
    Idempotent: skips the write when a completed layout already exists
    (testdata is immutable), so the registered query measures the clustered
    SCAN, not its own setup.  bench.py calls this during warmup."""
    import os as _os

    dest = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".tmp",
        f"zscan_v2_{_os.path.basename(sf.rstrip('/'))}",
    )
    if dest in _ZORDER_READY:
        return dest
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        ev = load_table(spark, sf, "events").select(
            "user_id", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
        )
        zorder(ev, ["user_id", "ts_ms"], n_files=8).write.mode("overwrite").parquet(dest)
    _ZORDER_READY.add(dest)
    return dest


@register(
    "x_zorder_scan",
    """
    SELECT user_id AS gid, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / 100.0 AS sum_score
    FROM events
    WHERE user_id IN (3, 77)
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1
    """,
)
def x_zorder_scan(spark: SparkSession, sf: str) -> DataFrame:
    """D2 OPTIMIZE/ZORDER on the parquet backend: answer a two-dimensional
    point+range scan from the Z-clustered events copy (built once per sf by
    :func:`ensure_zorder_layout`).  Values must equal the unclustered
    oracle scan; the file-skipping payoff itself is asserted in
    tests/test_layout.py."""
    back = spark.read.parquet(ensure_zorder_layout(spark, sf))
    lo, hi = 1704844800000, 1705708800000  # 2024-01-10 / 2024-01-20 UTC
    return (
        back.filter(
            F.col("user_id").isin(3, 77)
            & (F.col("ts_ms") >= lo)
            & (F.col("ts_ms") < hi)
        )
        .groupBy(F.col("user_id").alias("gid"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_score"),
        )
    )


@register(
    "x_decontaminate",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), held AS (
      -- benchmark stand-in: a 16-token window lifted from every 83rd doc
      SELECT DISTINCT ng FROM (
        SELECT unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(w) - 7, 1)),
                 i -> array_to_string(w[i:i+7], ' ')))) AS ng
        FROM (SELECT t[5:20] AS w FROM toks WHERE doc_id % 83 = 0)
      )
    ), ng AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 7, 1)),
               i -> array_to_string(t[i:i+7], ' ')))) AS ng
      FROM toks
    )
    SELECT doc_id, COUNT(*) AS n_hit_ngrams
    FROM ng
    WHERE ng IN (SELECT ng FROM held)
    GROUP BY doc_id
    """,
)
def x_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 8-gram with
    a heldout set, plus the count of contaminated 8-grams per doc.  The
    heldout set is a deterministic benchmark stand-in — a 16-token window
    lifted from every 83rd document — so the detector is exercised against
    guaranteed true positives (the source docs) at every scale, not just
    chance vocabulary collisions.  One explode per side + one semi-join on
    the ngram string (see ``dedup.contamination_hits`` for the 100 TB
    shape)."""
    d = load_table(spark, sf, "documents")
    heldout = d.filter(F.col("doc_id") % 83 == 0).select(
        F.concat_ws(" ", F.slice(T.tokens(F.lower(F.col("text"))), 5, 16)).alias("text")
    )
    return D.contamination_hits(d, heldout, n=8)


@register(
    "x_doc_repetition",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), tg AS (
      SELECT doc_id, t,
             list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                            i -> array_to_string(t[i:i+2], ' ')) AS g
      FROM toks
    )
    SELECT doc_id,
           CAST(CAST(ROUND((1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
                           * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
             AS dup_word_ratio,
           CAST(CAST(ROUND((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g))
                           * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
             AS dup_trigram_ratio
    FROM tg
    """,
)
def x_doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document repetition (Gopher/C4 quality signals): duplicate-word
    and duplicate-trigram fractions per doc.  Pure array expressions — one
    scan, zero shuffles, zero UDFs."""
    d = load_table(spark, sf, "documents")
    dup_words, dup_trigrams = T.repetition_ratios(F.col("text"))
    return d.select(
        "doc_id",
        r6(dup_words, "dup_word_ratio"),
        r6(dup_trigrams, "dup_trigram_ratio"),
    )


@register(
    "x_embedding_normalize",
    """
    SELECT vec_id,
           CAST(CAST(ROUND(sqrt(list_dot_product(v, v)) * 1000000.0) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS l2_norm,
           CAST(CAST(ROUND(CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v[1]
                                ELSE v[1] / sqrt(list_dot_product(v, v)) END * 1000000.0)
                     AS BIGINT) AS DOUBLE) / 1000000.0 AS first_component,
           len(v) AS dim
    FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
    """,
)
def x_embedding_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """L2 normalization (checked through scalar projections: norm, first
    normalized component, dim — array outputs don't canonicalize across
    engines).  Normalized corpora make downstream cosine a plain dot."""
    e = load_table(spark, sf, "embeddings")
    v = S.as_double(F.col("embedding"))
    normalized = S.l2_normalize(v)
    return e.select(
        "vec_id",
        r6(S.norm(v), "l2_norm"),
        r6(F.element_at(normalized, 1), "first_component"),
        F.size(v).cast("long").alias("dim"),
    )


@register(
    "x_embedding_quantize",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id,
             CAST(list_aggregate(list_transform(vec, x -> abs(x)), 'max') AS DOUBLE)
               / 127.0 AS scale,
             list_transform(vec, x ->
               CAST(ROUND(x / (CAST(list_aggregate(list_transform(vec, y -> abs(y)), 'max')
                               AS DOUBLE) / 127.0)) AS BIGINT)) AS codes
      FROM v
    )
    SELECT vec_id,
           CAST(CAST(ROUND(scale * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS scale_r,
           CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
           CAST(list_aggregate(list_transform(codes, c -> abs(c)), 'max') AS BIGINT) AS code_max
    FROM q
    """,
)
def x_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 scalar quantization (4× ANN-index memory reduction),
    checked through scalar projections: the dequant scale, code checksum,
    and max |code| (== 127 for every non-zero vector by construction)."""
    e = load_table(spark, sf, "embeddings")
    qz = S.quantize_int8(S.as_double(F.col("embedding")))
    return e.select(
        "vec_id",
        r6(qz["scale"], "scale_r"),
        F.aggregate(qz["q"], F.lit(0).cast("long"), lambda a, c: a + c).alias("code_sum"),
        F.array_max(F.transform(qz["q"], F.abs)).alias("code_max"),
    )


