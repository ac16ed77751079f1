"""LLM-data-pipeline extensions (documents / embeddings) — split from the monolithic queries.py (round 9,
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
# LLM-data-pipeline extensions (documents / embeddings tables)
# ===========================================================================


@register(
    "x_doc_exact_dedup",
    """
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def x_doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content-digest hash-groupBy (one shuffle; the keeper
    is the smallest doc_id — deterministic)."""
    return D.exact_dedup(load_table(spark, sf, "documents"))


@register(
    "x_doc_token_stats",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           CAST(ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                      / length(text) * 1000000.0) AS BIGINT) / 1000000.0 AS alpha_ratio,
           CAST(ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                      / len(regexp_split_to_array(trim(text), '\\s+')) * 1000000.0)
                AS BIGINT) / 1000000.0 AS avg_token_len
    FROM documents
    """,
)
def x_doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting + quality-signal ratios (length / alpha density /
    token shape) — pure Column expressions over ``documents``."""
    d = load_table(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars_actual"),
        r6(T.alpha_ratio(t), "alpha_ratio"),
        r6(T.avg_token_length(t), "avg_token_len"),
    )


@register(
    "x_doc_quality",
    """
    SELECT doc_id,
           CAST(ROUND(
             (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / length(text) * 0.5
              + CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) AS DOUBLE)
                / len(regexp_split_to_array(trim(text), '\\s+')) * 0.5)
             * 1000000.0) AS BIGINT) / 1000000.0 AS quality
    FROM documents
    """,
)
def x_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality score (alpha density + stopword plausibility) —
    the deterministic stand-in for trained quality classifiers."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", r6(T.quality_score(F.col("text")), "quality"))


@register(
    "x_doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
)
def x_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling polynomial (Rabin-Karp) document fingerprint, computed
    JVM-side with a Catalyst ``aggregate`` — identical left-to-right fold in
    both engines."""
    d = spread(load_table(spark, sf, "documents"))
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "x_doc_lang_id",
    """
    WITH h AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) AS h_en,
             len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein)\\b')) AS h_de,
             len(regexp_extract_all(lower(text), '\\b(el|la|los|que|de)\\b')) AS h_es,
             len(regexp_extract_all(lower(text), '\\b(le|la|les|et|des)\\b')) AS h_fr
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
                WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM h
    """,
)
def x_doc_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: argmax over stopword-marker hit counts."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", T.lang_id(F.col("text")).alias("lang_guess"))


@register(
    "x_ngram_jaccard_pairs",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 1)),
               i -> array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(ROUND(
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
             * 1000000.0) AS BIGINT) / 1000000.0 AS jaccard_sim
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    """,
)
def x_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-trigram Jaccard over a bounded doc subset — the
    verification predicate of the near-dup stack (quadratic baseline;
    MinHash-LSH below is the scale path)."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 40)
    pairs = D.ngram_jaccard_pairs(d, threshold=0.0)
    return pairs.select("id_a", "id_b", r6(F.col("jaccard_sim"), "jaccard_sim"))


@register(
    "x_doc_bpe_tokens",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                  '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'))
                - len(regexp_extract_all(text, '\\s+')) AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
)
def x_doc_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish token counting: GPT-2-style pre-tokenizer segments
    (lookahead-free regex, identical under Java regex and RE2) minus
    whitespace runs — the vocab-free LLM token-budget proxy."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"))


@register("x_dedup_clusters", None)  # oracle attached after _dedup_clusters_oracle
def x_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs → connected components →
    (doc_id, cluster_id=min id of component).  Runs on the portable md5
    hash family so the whole chain (LSH pairs AND the iterative min-label
    + pointer-jumping CC) is value-hash checked against a DuckDB recursive
    transitive closure; also cross-checked against a driver-side union-find
    in pytest."""
    d = load_table(spark, sf, "documents")
    pairs = D.minhash_near_dup_pairs(d, threshold=0.3, hash_family="md5")
    return D.dedup_clusters(pairs)


def _minhash_ctes() -> str:
    """Shared CTE chain: DuckDB replica of the FULL MinHash+LSH pipeline
    (32 perms, 8 bands × 4 rows, max_bucket 50, exact-Jaccard verify ≥ 0.3)
    over the portable md5-derived hash family — every stage (shingling,
    permutation mins, banding, bucket bound, verification) independently
    recomputed.  Ends with ``verified(id_a, id_b, jaccard_sim)``."""
    P = 2_147_483_647
    mins = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h*{2 * j + 1} + {j * 12_345 + 7}) % {P}))"
        for j in range(32)
    )
    jac = (
        "len(list_intersect(a.hs, b.hs)) "
        "/ (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))"
    )
    return f"""toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(
               list_distinct(list_transform(
                 generate_series(1, greatest(len(t) - 2, 1)),
                 i -> array_to_string(t[i:i+2], ' '))),
               s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % {P}
             ) AS hs
      FROM toks
    ), sig AS (
      SELECT doc_id, hs,
             [{mins}] AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, band,
             array_to_string(sig[band*4+1 : band*4+4], ',') AS key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band)
    ), buckets AS (
      SELECT band, key, list(doc_id) AS ids
      FROM bands GROUP BY band, key
      HAVING count(*) > 1 AND count(*) <= 50
    ), half AS (
      SELECT unnest(ids) AS id_a, ids FROM buckets
    ), cand_pairs AS (
      SELECT DISTINCT id_a, id_b
      FROM (SELECT id_a, unnest(ids) AS id_b FROM half)
      WHERE id_a < id_b
    ), verified AS (
      SELECT p.id_a, p.id_b, {jac} AS jaccard_sim
      FROM cand_pairs p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b
      WHERE {jac} >= 0.3
    )"""


def _minhash_oracle() -> str:
    return f"WITH {_minhash_ctes()}\n    SELECT id_a, id_b, jaccard_sim FROM verified"


def _dedup_clusters_oracle() -> str:
    """Connected components over the verified near-dup pairs as a recursive
    transitive closure: cluster_id = min reachable doc id.  Independent of
    the Spark side's min-label + pointer-jumping implementation."""
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION
      SELECT id_b, id_a FROM verified
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    """


# x_dedup_clusters registers before its oracle helpers exist; attach now.
REGISTRY["x_dedup_clusters"] = (x_dedup_clusters, _dedup_clusters_oracle())


def _lsh_eval_oracle() -> str:
    """LSH banding quality vs exact ground truth, both replayed in DuckDB:
    truth = all bounded-range pairs with exact shingle-hash Jaccard ≥ 0.3;
    candidates = the band-collision pairs from the shared MinHash chain."""
    jac = (
        "len(list_intersect(a.hs, b.hs)) "
        "/ (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))"
    )
    return f"""
    WITH {_minhash_ctes()},
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.doc_id < b.doc_id AND a.doc_id < 150 AND b.doc_id < 150
      WHERE {jac} >= 0.3
    ), cand AS (
      SELECT id_a, id_b FROM cand_pairs WHERE id_a < 150 AND id_b < 150
    ), hits AS (
      SELECT t.id_a, t.id_b FROM truth t JOIN cand c
        ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) * 1000000
             // greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM truth), 1)
             AS recall_micro,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) * 1000000
             // greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM cand), 1)
             AS precision_micro
    """


@register("x_lsh_eval", _lsh_eval_oracle())
def x_lsh_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-pipeline evaluation AS a query (the LSH counterpart of
    `x_ann_recall`): banding recall and raw-candidate precision against
    exact ground truth over a bounded doc range — truth is every pair
    with exact shingle-hash Jaccard ≥ 0.3, candidates are the band
    collisions before verification.  Quantifies what the S-curve
    promises: how many true near-dup pairs the 8x4 banding actually
    surfaces.  The quadratic truth join is range-bounded (the eval
    sample, not the corpus); candidates come from the same production
    banding path the dedup queries use."""
    d = load_table(spark, sf, "documents")
    sub = d.filter(F.col("doc_id") < 150)
    hashed = sub.select(
        F.col("doc_id"), D.shingle_hashes(F.col("text"), 3, "md5").alias("hs")
    )
    a = hashed.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    b = hashed.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    # cached: truth feeds the hit join AND its own count; cand likewise —
    # uncached, the eval-bounded quadratic jaccard and the full LSH
    # banding pipeline each execute twice
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(D.jaccard(F.col("hs_a"), F.col("hs_b")) >= 0.3)
        .select("id_a", "id_b")
        .cache()
    )
    cand = (
        D.lsh_candidate_pairs(d, hash_family="md5")
        .filter((F.col("id_a") < 150) & (F.col("id_b") < 150))
        .cache()
    )
    hits = truth.join(cand, ["id_a", "id_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.expr("n_hits * 1000000 DIV greatest(n_truth, 1)").alias("recall_micro"),
            F.expr("n_hits * 1000000 DIV greatest(n_candidates, 1)").alias(
                "precision_micro"
            ),
        )
    )


@register("x_minhash_near_dup", _minhash_oracle())
def x_minhash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash (32 perms) + LSH (8 bands × 4 rows) near-dup discovery with
    exact-Jaccard verification of candidates.  Runs on the portable
    md5-derived hash family (functions.dedup.portable_hash60) so the WHOLE
    pipeline — shingles, signatures, banding, bucket bound, verification —
    is value-hash checked against an independent DuckDB implementation;
    the xxhash64 production family keeps its pytest exact-Jaccard
    invariants (tests/test_dedup_clusters.py)."""
    d = load_table(spark, sf, "documents")
    return D.minhash_near_dup_pairs(d, threshold=0.3, hash_family="md5")


def _keep_best_oracle() -> str:
    """Clusters oracle (recursive transitive closure) extended to the
    keeper decision: every doc gets cluster_id = coalesce(component min,
    itself); keep the longest doc per cluster (tiebreak smallest id)."""
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION
      SELECT id_b, id_a FROM verified
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    ),
    labeled AS (
      SELECT d.doc_id, d.n_chars, coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT cluster_id, kept_doc_id, kept_n_chars, cluster_size
    FROM (
      SELECT cluster_id,
             doc_id AS kept_doc_id,
             n_chars AS kept_n_chars,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM labeled
    ) WHERE rn = 1
    """


@register("x_dedup_keep_best", _keep_best_oracle())
def x_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end dedup with canonical-representative selection: MinHash-LSH
    near-dup pairs → connected components → every document labeled with its
    cluster (singletons label themselves) → ONE keeper per cluster (longest
    text, smallest id on ties) + cluster size.  The output is the corpus
    after dedup — the operator a training-data pipeline actually runs.
    Portable md5 family end to end, so pairs, clustering, AND the keeper
    decision are all value-hash checked against DuckDB."""
    d = load_table(spark, sf, "documents")
    pairs = D.minhash_near_dup_pairs(d, threshold=0.3, hash_family="md5")
    clusters = D.dedup_clusters(pairs)
    return D.keep_best_per_cluster(d, clusters, score_col="n_chars")


@register(
    "x_doc_chunk",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(generate_series(0, greatest(len(t) - 17, 0), 48)) AS s
      FROM toks
    )
    SELECT doc_id,
           s // 48 AS chunk_id,
           CAST(len(t[s + 1 : s + 64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text
    FROM starts
    """,
)
def x_doc_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, stride 48 → 16
    tokens of overlap) — context-window preparation for training.  Pure
    map-side plan: tokenize, sequence of start offsets, explode, slice —
    no shuffle, no UDF, rows stream partition-local to the sink."""
    d = load_table(spark, sf, "documents")
    return T.chunk_documents(d, chunk_tokens=64, stride=48)


def _simhash_oracle() -> str:
    """DuckDB replica of the 60-bit SimHash sketch over the portable
    md5-derived token hash family: per-bit ±1 sums, sign vector, packing."""
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    pack = "\n           + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(60)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, {bit_sums}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({pack} AS BIGINT) AS simhash FROM bits
    """


@register("x_simhash", _simhash_oracle())
def x_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash sketch per document (explode → conditional bit sums → packed
    long).  Registered on the portable md5 hash family (60 bits) so every
    bit of every sketch is value-hash checked against DuckDB; the xxhash64
    64-bit production variant keeps its pytest Hamming invariants."""
    d = load_table(spark, sf, "documents")
    return D.simhash64(d, hash_family="md5")


@register(
    "x_hard_negatives",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             CAST(ROUND(list_dot_product(qv, vec)
                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vec, vec)))
                        * 1000000.0) AS BIGINT) / 1000000.0 AS cos_r
      FROM q, v WHERE q.query_id <> v.vec_id
    )
    SELECT query_id, neighbor_id AS negative_id, cos_r AS cosine_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_r DESC, neighbor_id) AS rn
          FROM scored WHERE cos_r < 0.9)
    WHERE rn <= 3
    """,
)
def x_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-3 most-similar vectors BELOW the near-duplicate ceiling (cos <
    0.9) — similar enough to be informative negatives, dissimilar enough
    not to be positives mislabeled as negatives (the standard in-batch /
    ANN-mined negative recipe).  Same scale shape as the brute top-k
    baseline: bounded anchor set broadcast against the corpus scan, one
    per-anchor top-k; swap the scorer for the IVF/LSH index at corpus
    scale exactly as with `x_ivf_ann_topk`."""
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), S.as_double(F.col("embedding")).alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"), S.as_double(F.col("embedding")).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("negative_id")).select(
        "query_id",
        "negative_id",
        _round_fixed(S.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
    ).filter(F.col("cosine_sim") < 0.9)
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("negative_id").asc()],
        3,
        rank_col="rank",
    )


@register(
    "x_cosine_topk",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             CAST(ROUND(list_dot_product(qv, vec)
                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vec, vec)))
                        * 1000000.0) AS BIGINT) / 1000000.0 AS cos_r
      FROM q, v WHERE q.query_id <> v.vec_id
    )
    SELECT query_id, neighbor_id,
           cos_r AS cosine_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_r DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def x_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: broadcast query set × corpus
    scan, ``zip_with``/``aggregate`` dot products, per-query top-5.
    Ordering uses the 6-digit-rounded similarity so ranking is identical
    across engines (raw double ULP differences can't flip ranks)."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    q = queries.select(F.col("vec_id").alias("query_id"), S.as_double(F.col("embedding")).alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), S.as_double(F.col("embedding")).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        _round_fixed(S.cosine(F.col("qv"), F.col("cv")), 6).alias("cos_r"),
    )
    top = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_r").desc(), F.col("neighbor_id").asc()],
        k=5,
        rank_col="rank",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("cos_r").alias("cosine_sim"),
        "rank",
    )


@register(
    "x_cosine_near_dup",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings WHERE vec_id < 200
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(ROUND(list_dot_product(a.vec, b.vec)
                      / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
                      * 1000000.0) AS BIGINT) / 1000000.0 AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE CAST(ROUND(list_dot_product(a.vec, b.vec)
                     / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
                     * 1000000.0) AS BIGINT) / 1000000.0 > 0.15
    """,
)
def x_cosine_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-duplicate pairs over a bounded id range (quadratic
    baseline; the LSH bucketing in ``functions.similarity`` is the 100 TB
    path)."""
    pairs = S.cosine_near_dup_pairs(
        load_table(spark, sf, "embeddings"), threshold=-2.0, id_limit=200
    )
    rounded = pairs.select(
        "id_a", "id_b", _round_fixed(F.col("cosine_sim"), 6).alias("cos_r")
    ).filter(F.col("cos_r") > 0.15)
    return rounded.select("id_a", "id_b", F.col("cos_r").alias("cosine_sim"))


_COS_R = (
    "CAST(ROUND(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    " * 1000000.0) AS BIGINT) / 1000000.0"
)


def _ivf_oracle() -> str:
    """DuckDB replica of the FULL IVF path: portable md5 centroid seeding,
    rounded-cosine inverted-list assignment (centroid_id tiebreak), top-4
    probe per query, exact rounded re-scoring, top-5."""
    cr = _COS_R.format(a="a.vec", b="c.cvec")
    cs = _COS_R.format(a="qv", b="cv")
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), cents AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT 16
      )
    ), ascore AS (
      SELECT a.vec_id, a.vec, c.centroid_id, {cr} AS cr
      FROM v a CROSS JOIN cents c
    ), lists AS (
      SELECT vec_id AS neighbor_id, vec AS cv, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, vec AS qv, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore WHERE vec_id < 5
      ) WHERE rn <= 4
    ), scored AS (
      SELECT p.query_id, l.neighbor_id, {cs} AS cos_r
      FROM lists l JOIN probes p USING (centroid_id)
      WHERE p.query_id <> l.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_r AS cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_r DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """


@register("x_ivf_ann_topk", _ivf_oracle())
def x_ivf_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate ANN: hash-seeded coarse quantizer, corpus bucketed
    into inverted lists (one shuffle), queries probe their 4 nearest of 16
    lists.  Registered in the portable configuration (md5 seeding +
    rounded-cosine decisions) so the whole index-build-and-probe path is
    value-hash checked against an independent DuckDB implementation;
    recall vs the brute-force baseline is pinned in pytest."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(
        emb, queries, k=5, n_centroids=16, nprobe=4, family="md5", rounded=True
    )


def _kmeans_oracle(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB replica of the FULL iterative Lloyd's k-means: md5-seeded
    init, per-iteration rounded-L2 assignment (centroid_id tiebreak) and
    exact integer-micro centroid update, final assignment — every round
    unrolled into CTEs."""

    def assign(cent_cte: str, out: str) -> str:
        return f"""
    {out}_sc AS (
      SELECT v.vec_id, v.vec, c.centroid_id,
             CAST(ROUND((list_dot_product(v.vec, v.vec)
                   - 2 * list_dot_product(v.vec, c.cvec)
                   + list_dot_product(c.cvec, c.cvec)) * 1000000.0) AS BIGINT)
               / 1000000.0 AS d2
      FROM v CROSS JOIN {cent_cte} c
    ), {out} AS (
      SELECT vec_id, vec, centroid_id AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, centroid_id) AS rn
        FROM {out}_sc) WHERE rn = 1
    )"""

    def update(a_cte: str, out: str) -> str:
        return f"""
    {out}_d AS (
      SELECT a.cluster_id, u.pos,
             CAST(ROUND(a.vec[u.pos] * 1000000.0) AS BIGINT) AS micro
      FROM {a_cte} a, unnest(generate_series(1, {dim})) AS u(pos)
    ), {out}_v AS (
      SELECT cluster_id, pos,
             CAST(SUM(micro) // COUNT(*) AS BIGINT) / 1000000.0 AS val
      FROM {out}_d GROUP BY cluster_id, pos
    ), {out} AS (
      SELECT cluster_id AS centroid_id, list(val ORDER BY pos) AS cvec
      FROM {out}_v GROUP BY cluster_id
    )"""

    parts = [
        f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), c0 AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT {k}
      )
    )"""
    ]
    for i in range(iters):
        parts.append("," + assign(f"c{i}", f"a{i + 1}"))
        parts.append("," + update(f"a{i + 1}", f"c{i + 1}"))
    parts.append("," + assign(f"c{iters}", "afinal"))
    parts.append("\n    SELECT vec_id, cluster_id FROM afinal")
    return "".join(parts)


@register("x_kmeans_embeddings", _kmeans_oracle())
def x_kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus (the trained
    quantizer the IVF / SemDedup md5 stand-ins are seeded for): 2
    assign/update rounds + final assignment, every decision and every
    centroid update bit-identical to an independent DuckDB replica with
    both iterations unrolled into CTEs.  See
    :func:`kafka_streaming_spark.functions.similarity.kmeans_fit_predict`
    for the per-iteration shuffle budget."""
    return S.kmeans_fit_predict(
        load_table(spark, sf, "embeddings"), k=8, iters=2, family="md5"
    )


def _ann_recall_oracle() -> str:
    """Both ANN pipelines (exact brute force AND the md5-seeded IVF) run
    independently in DuckDB, then recall@5 per query — the whole
    evaluation is value-hash checked, not just its inputs."""
    cr = _COS_R.format(a="a.vec", b="c.cvec")
    cs = _COS_R.format(a="p.qv", b="l.cv")
    cb = _COS_R.format(a="q.qv", b="v.vec")
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 5
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cb} DESC, v.vec_id) AS rn
        FROM q, v WHERE q.query_id <> v.vec_id
      ) WHERE rn <= 5
    ), cents AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT 16
      )
    ), ascore AS (
      SELECT a.vec_id, a.vec, c.centroid_id, {cr} AS cr
      FROM v a CROSS JOIN cents c
    ), lists AS (
      SELECT vec_id AS neighbor_id, vec AS cv, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, vec AS qv, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore WHERE vec_id < 5
      ) WHERE rn <= 4
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, l.neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {cs} DESC, l.neighbor_id) AS rn
        FROM lists l JOIN probes p USING (centroid_id)
        WHERE p.query_id <> l.neighbor_id
      ) WHERE rn <= 5
    )
    SELECT e.query_id,
           CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(5 AS BIGINT) AS k,
           (CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000) // 5 AS recall_micro
    FROM exact e
    LEFT JOIN ivf i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    GROUP BY e.query_id
    """


@register("x_ann_recall", _ann_recall_oracle())
def x_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """ANN quality evaluation AS a query: run the exact brute-force top-5
    and the IVF top-5 side by side and report per-query recall@5 — the
    in-engine eval loop every ANN deployment needs (pytest pins recall
    floors once; this makes the measurement continuously available over
    any corpus).  Both pipelines and the recall arithmetic are replayed
    independently by the oracle in integer micro-units."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    q = queries.select(
        F.col("vec_id").alias("query_id"), S.as_double(F.col("embedding")).alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), S.as_double(F.col("embedding")).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        _round_fixed(S.cosine(F.col("qv"), F.col("cv")), 6).alias("__cr"),
    )
    exact = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("__cr").desc(), F.col("neighbor_id").asc()],
        k=5,
        rank_col="__rn",
    ).select("query_id", "neighbor_id")
    ivf = S.ivf_topk(
        emb, queries, k=5, n_centroids=16, nprobe=4, family="md5", rounded=True
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    joined = exact.join(ivf, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        F.lit(5).cast("long").alias("k"),
        F.expr("(sum(coalesce(__hit, 0)) * 1000000) DIV 5").alias("recall_micro"),
    )


def _semdedup_oracle(threshold: float = 0.2) -> str:
    """DuckDB replica of the FULL SemDedup path: md5-seeded centroids,
    rounded-cosine single assignment (centroid_id tiebreak), within-cluster
    pairwise rounded cosine against lower-id mates, keep-below-threshold."""
    cr = _COS_R.format(a="a.vec", b="c.cvec")
    ps = _COS_R.format(a="x.vec", b="y.vec")
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), cents AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT 16
      )
    ), ascore AS (
      SELECT a.vec_id, a.vec, c.centroid_id, {cr} AS cr
      FROM v a CROSS JOIN cents c
    ), asgn AS (
      SELECT vec_id, vec, centroid_id AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore
      ) WHERE rn = 1
    ), lowmax AS (
      SELECT x.vec_id, MAX({ps}) AS max_sim_lower
      FROM asgn x JOIN asgn y
        ON x.cluster_id = y.cluster_id AND x.vec_id > y.vec_id
      GROUP BY x.vec_id
    )
    SELECT asgn.vec_id, asgn.cluster_id,
           coalesce(lowmax.max_sim_lower, -2.0) AS max_sim_lower,
           CAST(coalesce(lowmax.max_sim_lower, -2.0) < {threshold} AS BIGINT) AS kept
    FROM asgn LEFT JOIN lowmax ON asgn.vec_id = lowmax.vec_id
    """


@register("x_semdedup", _semdedup_oracle())
def x_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDedup: embedding-cluster semantic dedup — cluster via the shared
    md5-seeded quantizer, drop within-cluster near-duplicates above the
    cosine threshold, keep the lowest-id representative.  Pairwise work is
    confined inside clusters (the algorithm's scale contract; see
    :func:`kafka_streaming_spark.functions.similarity.semdedup`); the
    whole pipeline — seeding, assignment, pair scoring, keep decision — is
    value-hash checked against an independent DuckDB implementation."""
    return S.semdedup(load_table(spark, sf, "embeddings"), threshold=0.2)


def _semdedup_eval_oracle() -> str:
    """Eval wrapper over the full semdedup oracle: exact lower-id cosine
    ground truth on the id-bounded eval set, then precision/recall of the
    kept/dropped decision in integer micro-units."""
    ps = _COS_R.format(a="x.vec", b="y.vec")
    return f"""
    WITH sd AS ({_semdedup_oracle()}),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings WHERE vec_id < 200
    ), gt AS (
      SELECT x.vec_id, MAX({ps}) AS mx
      FROM v x JOIN v y ON y.vec_id < x.vec_id
      GROUP BY x.vec_id
    ), joined AS (
      SELECT sd.vec_id,
             CAST(1 - sd.kept AS BIGINT) AS dropped,
             CAST(coalesce(gt.mx, -2.0) >= 0.2 AS BIGINT) AS true_dup
      FROM sd LEFT JOIN gt ON sd.vec_id = gt.vec_id
      WHERE sd.vec_id < 200
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(dropped) AS BIGINT) AS n_dropped,
           CAST(SUM(true_dup) AS BIGINT) AS n_true_dup,
           CAST(SUM(dropped * true_dup) AS BIGINT) AS tp,
           CASE WHEN SUM(dropped) = 0 THEN 0
                ELSE CAST(SUM(dropped * true_dup) * 1000000 AS BIGINT)
                     // CAST(SUM(dropped) AS BIGINT) END AS precision_micro,
           CASE WHEN SUM(true_dup) = 0 THEN 0
                ELSE CAST(SUM(dropped * true_dup) * 1000000 AS BIGINT)
                     // CAST(SUM(true_dup) AS BIGINT) END AS recall_micro
    FROM joined
    """


@register("x_semdedup_eval", _semdedup_eval_oracle())
def x_semdedup_eval(spark: SparkSession, sf: str) -> DataFrame:
    """SemDedup quality evaluation IN the engine (completing the eval trio
    with `x_ann_recall` and `x_lsh_eval`): on an id-bounded eval set, the
    exact lower-id max-cosine ground truth vs semdedup's cluster-bounded
    drop decision → precision (always 1 by construction: a within-cluster
    near-dup IS a global one) and recall (the fraction of true near-dups
    the clustering let semdedup see — the quantity the paper trades
    against pairwise cost).  Integer micro-unit ratios; the bounded
    quadratic is the documented id-bounded verifier pattern."""
    emb = load_table(spark, sf, "embeddings")
    sd = S.semdedup(emb, threshold=0.2).filter(F.col("vec_id") < 200)
    v = emb.filter(F.col("vec_id") < 200).select(
        "vec_id", S.as_double(F.col("embedding")).alias("__v")
    )
    x = v.select(F.col("vec_id").alias("__xa"), F.col("__v").alias("__va"))
    y = v.select(F.col("vec_id").alias("__xb"), F.col("__v").alias("__vb"))
    gt = (
        x.join(y, F.col("__xb") < F.col("__xa"))
        .select(
            F.col("__xa"),
            S.round6(S.cosine(F.col("__va"), F.col("__vb"))).alias("__s"),
        )
        .groupBy("__xa")
        .agg(F.max("__s").alias("__mx"))
    )
    joined = sd.join(gt, sd["vec_id"] == gt["__xa"], "left").select(
        (1 - F.col("kept")).alias("dropped"),
        (F.coalesce(F.col("__mx"), F.lit(-2.0)) >= 0.2).cast("long").alias("true_dup"),
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("dropped").alias("n_dropped"),
        F.sum("true_dup").alias("n_true_dup"),
        F.sum(F.col("dropped") * F.col("true_dup")).alias("tp"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) == 0, F.lit(0).cast("long")
    ).otherwise(F.expr(f"({num} * 1000000) DIV {den}"))
    return agg.select(
        "n_eval",
        "n_dropped",
        "n_true_dup",
        "tp",
        ratio("tp", "n_dropped").alias("precision_micro"),
        ratio("tp", "n_true_dup").alias("recall_micro"),
    )


def _pq_oracle() -> str:
    """DuckDB replica of the FULL product-quantization ADC path in the
    portable configuration: md5 hash-ordered codebook seeding (the iters=0
    analog of the IVF portable config), scaled-int64 subspace distances
    (round(d*1e6)) for both the corpus encoding argmin and the query LUTs,
    EXACT integer ADC sums, top-5 by (distance, neighbor_id)."""
    sq = (
        "(a.vec[ss.s * 8 + i] - c.cvec[ss.s * 8 + i])"
        " * (a.vec[ss.s * 8 + i] - c.cvec[ss.s * 8 + i])"
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), cb AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT 16
      )
    ), subs AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ), sd AS (
      SELECT a.vec_id, ss.s, c.centroid_id,
             CAST(ROUND(list_sum(list_transform(generate_series(1, 8), i -> {sq}))
                        * 1000000.0) AS BIGINT) AS dr
      FROM v a CROSS JOIN cb c CROSS JOIN subs ss
    ), enc AS (
      SELECT vec_id, s, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY dr, centroid_id) AS rn
        FROM sd
      ) WHERE rn = 1
    ), scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(SUM(q.dr) AS BIGINT) AS dscaled
      FROM enc e JOIN sd q ON q.s = e.s AND q.centroid_id = e.centroid_id
      WHERE q.vec_id < 5 AND q.vec_id <> e.vec_id
      GROUP BY q.vec_id, e.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(dscaled AS DOUBLE) / 1000000.0 AS l2_sq,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY dscaled, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """


@register("x_pq_ann_topk", _pq_oracle())
def x_pq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation — the
    MEMORY scale path (8 codes/vector instead of 64 floats; a 100 TB corpus
    scans ~3 TB in the compressed domain).  Registered in the portable
    configuration (hash-seeded codebooks, scaled-integer distance rounding)
    so codebook build + encoding + LUT scoring + ranking are all value-hash
    checked against an independent DuckDB implementation; the Lloyd-trained
    configuration's recall floor is pinned in tests/test_ann.py."""
    emb = load_table(spark, sf, "embeddings")
    books = S.pq_train_codebooks(emb, dim=64, m=8, k=16, sample=1024, iters=0)
    queries = emb.filter(F.col("vec_id") < 5)
    return S.pq_topk(emb, queries, books, k=5, rounded=True)


def _ivfpq_oracle() -> str:
    """DuckDB replica of the FULL IVF-PQ path: the same md5 hash-ordered 16
    vectors serve as IVF coarse centroids AND PQ codebook rows (identical
    seeding on the Spark side), corpus routed by rounded-cosine argmax,
    PQ-encoded by scaled-int argmin, queries probe their top-4 lists, ADC
    distances are exact integer sums over the probed candidates only."""
    cr = _COS_R.format(a="a.vec", b="c.cvec")
    sq = (
        "(a.vec[ss.s * 8 + i] - c.cvec[ss.s * 8 + i])"
        " * (a.vec[ss.s * 8 + i] - c.cvec[ss.s * 8 + i])"
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), cb AS (
      SELECT vec AS cvec, row_number() OVER (ORDER BY hh) - 1 AS centroid_id
      FROM (
        SELECT vec, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) AS hh
        FROM v ORDER BY hh LIMIT 16
      )
    ), ascore AS (
      SELECT a.vec_id, c.centroid_id, {cr} AS cr
      FROM v a CROSS JOIN cb c
    ), lists AS (
      SELECT vec_id AS neighbor_id, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cr DESC, centroid_id) AS rn
        FROM ascore WHERE vec_id < 5
      ) WHERE rn <= 4
    ), subs AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ), sd AS (
      SELECT a.vec_id, ss.s, c.centroid_id,
             CAST(ROUND(list_sum(list_transform(generate_series(1, 8), i -> {sq}))
                        * 1000000.0) AS BIGINT) AS dr
      FROM v a CROSS JOIN cb c CROSS JOIN subs ss
    ), enc AS (
      SELECT vec_id, s, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY dr, centroid_id) AS rn
        FROM sd
      ) WHERE rn = 1
    ), cand AS (
      SELECT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l USING (centroid_id)
      WHERE p.query_id <> l.neighbor_id
    ), scored AS (
      SELECT c.query_id, c.neighbor_id, CAST(SUM(q.dr) AS BIGINT) AS dscaled
      FROM cand c
      JOIN enc e ON e.vec_id = c.neighbor_id
      JOIN sd q ON q.vec_id = c.query_id AND q.s = e.s
               AND q.centroid_id = e.centroid_id
      GROUP BY c.query_id, c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           CAST(dscaled AS DOUBLE) / 1000000.0 AS l2_sq,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY dscaled, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """


@register("x_ivfpq_ann_topk", _ivfpq_oracle())
def x_ivfpq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ composite ANN (FAISS ``IVF16,PQ8`` analog): coarse quantizer
    routes the corpus into inverted lists, vectors stored as 8 PQ codes,
    queries probe 4 of 16 lists and score candidates in the compressed
    domain via exact-integer ADC — combining the scan-fraction win of IVF
    with the bytes-per-vector win of PQ.  The ADC sum is a Catalyst
    ``aggregate`` over a broadcast LUT literal (no Python in the scoring
    path); the full route-encode-probe-score pipeline is value-hash checked
    against an independent DuckDB implementation."""
    emb = load_table(spark, sf, "embeddings")
    books = S.pq_train_codebooks(emb, dim=64, m=8, k=16, sample=1024, iters=0)
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivfpq_topk(
        emb, queries, books, k=5, n_centroids=16, nprobe=4, family="md5", rounded=True
    )


def _lsh_oracle() -> str:
    """DuckDB replica of the FULL multi-table hyperplane LSH path: md5-
    derived plane components, sign-bit bucket keys per table, radius-1
    multiprobe on the query side, bucket equijoin, rounded-cosine
    re-scoring, top-5."""
    cs = _COS_R.format(a="qv", b="cv")
    masks = [0] + [1 << b for b in range(6)]
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), pl AS (
      SELECT p, list_transform(generate_series(0, 63), d ->
               CAST(concat('0x', substr(md5(p || ':' || d), 1, 15)) AS BIGINT)
                 / 576460752303423488.0 - 1.0) AS pv
      FROM (SELECT unnest(generate_series(0, 47)) AS p)
    ), sb AS (
      SELECT vec_id, p // 6 AS tbl, p % 6 AS bit,
             CASE WHEN list_dot_product(vec, pv) >= 0 THEN 1 ELSE 0 END AS s
      FROM v CROSS JOIN pl
    ), keys AS (
      SELECT vec_id, tbl, CAST(SUM(s * (1 << bit)) AS BIGINT) AS key
      FROM sb GROUP BY vec_id, tbl
    ), qk AS (
      SELECT vec_id AS query_id, tbl, xor(key, CAST(m AS BIGINT)) AS key
      FROM keys CROSS JOIN (SELECT unnest({masks}) AS m)
      WHERE vec_id < 5
    ), cand AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
      FROM keys c JOIN qk q ON c.tbl = q.tbl AND c.key = q.key
      WHERE q.query_id <> c.vec_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id, {cs} AS cos_r
      FROM cand
      JOIN (SELECT vec_id, vec AS qv FROM v) a ON a.vec_id = cand.query_id
      JOIN (SELECT vec_id, vec AS cv FROM v) b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_r AS cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_r DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """


@register("x_lsh_ann_topk", _lsh_oracle())
def x_lsh_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate ANN: multi-table random-hyperplane LSH (deterministic
    hyperplanes, OR-amplified across 8 tables) with radius-1 multiprobe on
    the query side, bucket-equijoin, exact re-scoring inside buckets.
    Registered in the portable configuration (md5-derived plane components
    + rounded-cosine ranking) so bucketing, multiprobe, and re-scoring are
    all value-hash checked against an independent DuckDB implementation;
    recall ≥0.5 vs the brute-force baseline is pinned in tests."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.lsh_topk(emb, queries, k=5, dim=64, family="md5", rounded=True)


