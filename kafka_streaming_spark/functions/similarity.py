"""Embedding similarity search: brute-force cosine top-k (baseline),
random-hyperplane LSH and IVF inverted-list variants (the latency scale
paths), and product quantization with ADC scoring (the MEMORY scale path:
16-64x smaller corpus representation).

Vectors are plain ``array<float>`` columns (testdata ``embeddings.parquet``);
math is done in double via ``zip_with``/``aggregate`` — JVM-side, no UDFs,
identical left-to-right accumulation order to the DuckDB oracle expressions.

Scale notes: brute-force is O(|Q|·|C|); with a broadcast query side it is
one scan of the corpus and a per-group top-k — correct at any corpus size as
long as |Q| is bounded.  The LSH variant buckets the corpus once (linear) and
probes only matching buckets, trading recall for a ~bands× fan-out reduction;
hyperplanes are deterministic constants so results are reproducible.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streaming_spark.ops.partitioning import spread
from kafka_streaming_spark.ops.windows import top_k_per_group


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product: zip_with multiply → aggregate sum (sequential, so the
    accumulation order matches a scalar loop / the DuckDB oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (bounded) query set against the
    corpus, score every pair, keep k per query.  The broadcast hint keeps
    this a map-side join — no shuffle of the 100 TB corpus side; the only
    shuffle is the per-query top-k on |Q|·|C| scored rows, which Spark
    bounds with partial top-k pushdown."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"),
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def _hyperplanes(dim: int, planes: int, family: str = "mix") -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (no RNG dependency).

    ``family="mix"`` (default): a splitmix64-style integer mix of
    (plane, coordinate) mapped to [-1, 1].
    ``family="md5"``: component = md5-hash of ``"p:d"`` read as a 60-bit
    int, scaled to [-1, 1) — bit-identically reproducible in DuckDB
    (``CAST(concat('0x', substr(md5(p||':'||d),1,15)) AS BIGINT)
    / 2^59 - 1.0``), which is what lets the LSH ANN query carry a full
    value-hash oracle."""
    if family == "md5":
        import hashlib

        return [
            [
                int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) / 2**59 - 1.0
                for d in range(dim)
            ]
            for p in range(planes)
        ]
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (2**64)
            x ^= x >> 31
            x = (x * 0xD6E8FEB86659FD93) % (2**64)
            x ^= x >> 27
            row.append((x / 2**63) - 1.0)
        out.append(row)
    return out


def round6(col: Column) -> Column:
    """6-digit deterministic rounding (HALF_UP via BIGINT fixed point —
    identical in Spark and DuckDB).  ANN variants with oracles order and
    emit rounded cosines so ULP-level accumulation differences can never
    flip a rank across engines."""
    return F.round(col * F.lit(1_000_000.0), 0).cast("long").cast("double") / F.lit(1_000_000.0)


def lsh_bucket(vec: Column, dim: int, planes: int = 16, plane_offset: int = 0) -> Column:
    """Random-hyperplane signature: sign bit per plane packed into a long.
    Two vectors with small angle collide with probability
    (1 - θ/π)^planes.  ``plane_offset`` selects a disjoint plane family —
    used to build independent hash tables for OR-amplification."""
    key = F.lit(0).cast("long")
    all_planes = _hyperplanes(dim, plane_offset + planes)[plane_offset:]
    for i, plane in enumerate(all_planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(as_double(vec), lit_plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        key = key + bit.cast("long") * F.lit(2**i)
    return key


def lsh_table_keys(vec: Column, dim: int, planes: int, tables: int) -> Column:
    """Array of (table, bucket-key) structs — one entry per hash table,
    each table using its own disjoint plane family.  OR-amplification:
    a near pair is a candidate if it collides in ANY table, lifting recall
    from (1-θ/π)^p to 1-(1-(1-θ/π)^p)^L."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec, dim, planes, plane_offset=t * planes).alias("key"),
            )
            for t in range(tables)
        ]
    )


def _planes_relation(
    df: DataFrame, dim: int, planes: int, tables: int, family: str = "mix"
) -> DataFrame:
    """The full plane family as a broadcastable LocalRelation
    (plane_idx, table, bit, plane_vec) — hyperplanes as DATA instead of
    inlined literal expressions, so signature codegen stays constant-size
    no matter how many tables are configured."""
    rows = []
    for idx, plane in enumerate(_hyperplanes(dim, tables * planes, family)):
        arr = "array(" + ", ".join(f"{v!r}D" for v in plane) + ")"
        rows.append(f"({idx}, {idx // planes}, {idx % planes}, {arr})")
    return df.sparkSession.sql(
        "SELECT * FROM VALUES " + ", ".join(rows)
        + " AS planes(plane_idx, table, bit, plane_vec)"
    )


def lsh_keys_df_sql(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    family: str = "mix",
) -> DataFrame:
    """(id, table, key) bucket assignments, computed data-parallel: cross
    the vectors with the broadcast plane relation (|V|·tables·planes tiny
    rows), one shallow dot product per row, then pack sign bits per
    (id, table) with a hash aggregate.  Pure Column-expression path —
    kept as the cross-check for the Arrow fast path below."""
    crossed = vectors.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    ).join(F.broadcast(_planes_relation(vectors, dim, planes, tables, family)))
    bits = crossed.select(
        id_col,
        "table",
        (
            F.when(dot(F.col("__v"), F.col("plane_vec")) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            * F.expr("shiftleft(cast(1 as bigint), cast(bit as int))")
        ).alias("__kb"),
    )
    return bits.groupBy(id_col, "table").agg(F.sum("__kb").alias("key"))


def lsh_keys_df(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    family: str = "mix",
) -> DataFrame:
    """(id, table, key) bucket assignments via an Arrow-vectorized BLAS
    matmul: each Arrow batch of vectors is one ``(n × dim) @ (dim × L·p)``
    product + sign-bit packing in numpy.

    Dense linear algebra is the one place where Catalyst higher-order
    functions lose badly — ``aggregate``/``zip_with`` lambdas are
    interpreted per element (~µs/element), while the BLAS path does the
    same FLOPs three orders of magnitude faster and Arrow amortizes the
    Python boundary.  ``lsh_keys_df_sql`` is the UDF-free equivalent;
    a test pins that both produce identical keys."""
    from pyspark.sql.functions import pandas_udf

    planes_mat = np.array(_hyperplanes(dim, tables * planes, family))  # (L·p, dim)
    pow2 = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def table_keys(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (n, dim)
        bits = (mat @ planes_mat.T >= 0).reshape(len(mat), tables, planes)
        keys = (bits * pow2).sum(axis=2).astype(np.int64)  # (n, tables)
        return pd.Series(list(keys))

    keyed = vectors.select(
        F.col(id_col), table_keys(as_double(F.col(vec_col))).alias("__keys")
    )
    return keyed.select(
        id_col, F.posexplode("__keys").alias("table", "key")
    )


def lsh_keys_with_vec(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    out_id: str,
    out_vec: str,
    family: str = "mix",
) -> DataFrame:
    """(out_id, out_vec, table, key): bucket keys computed alongside the
    carried vector column in ONE pass — no join-back of keys to vectors
    (the pandas_udf evaluates per input batch with the other columns in
    flight)."""
    from pyspark.sql.functions import pandas_udf

    planes_mat = np.array(_hyperplanes(dim, tables * planes, family))
    pow2 = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def table_keys(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        bits = (mat @ planes_mat.T >= 0).reshape(len(mat), tables, planes)
        keys = (bits * pow2).sum(axis=2).astype(np.int64)
        return pd.Series(list(keys))

    keyed = vectors.select(
        F.col(id_col).alias(out_id),
        as_double(F.col(vec_col)).alias(out_vec),
        table_keys(as_double(F.col(vec_col))).alias("__keys"),
    )
    return keyed.select(
        out_id, out_vec, F.posexplode("__keys").alias("table", "key")
    )


def _probe_masks(planes: int, radius: int) -> list[int]:
    """XOR masks for multiprobe: all bit patterns of Hamming weight ≤
    ``radius`` over ``planes`` bits (0 = the exact bucket)."""
    import itertools

    masks = [0]
    for r in range(1, radius + 1):
        for combo in itertools.combinations(range(planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 6,
    tables: int = 8,
    multiprobe: int = 1,
    family: str = "mix",
    rounded: bool = False,
) -> DataFrame:
    """Approximate cosine top-k with multi-table hyperplane LSH: a pair is
    scored if its signatures collide in ANY of ``tables`` independent
    tables (OR-amplification — single-table recall is too low for useful
    ANN).  Linear bucketing pass over the corpus, then a bucket-equijoin;
    the shuffle key is (table, bucket), so co-bucketed vectors land on the
    same executor and cross-scoring never leaves it.  Pairs colliding in
    several tables are scored once (cheap groupBy dedup of the collided
    subset — never the corpus).  Signatures come from the data-parallel
    ``lsh_keys_df`` (hyperplanes as broadcast data → constant codegen size
    regardless of table count).

    ``multiprobe`` additionally probes, for each query signature, every
    bucket within that Hamming radius (query-side fan-out only:
    ``C(planes, ≤r)`` keys per table per query — the CORPUS index is
    untouched, which is the point: recall rises like adding many tables
    without re-bucketing or re-shuffling the 100 TB side).  Defaults
    (6 planes × 8 tables, radius 1) measure ≥0.6 recall@5 on the
    near-uniform testdata embeddings — the adversarial case for ANN."""
    bq = lsh_keys_with_vec(
        queries, id_col, vec_col, dim, planes, tables,
        out_id="query_id", out_vec="qv", family=family,
    )
    if multiprobe > 0:
        masks = F.array(*[F.lit(m) for m in _probe_masks(planes, multiprobe)])
        bq = bq.select(
            "query_id",
            "qv",
            "table",
            F.explode(masks).alias("__m"),
            F.col("key").alias("__k0"),
        ).select(
            "query_id", "qv", "table",
            F.col("__k0").bitwiseXOR(F.col("__m")).alias("key"),
        )
    bc = lsh_keys_with_vec(
        spread(corpus), id_col, vec_col, dim, planes, tables,
        out_id="neighbor_id", out_vec="cv", family=family,
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if rounded:
        sim = round6(sim)
    scored = (
        bc.join(F.broadcast(bq), ["table", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine_sim").alias("cosine_sim"))
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    family: str = "xxhash64",
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``n_centroids`` corpus
    vectors with the smallest hash of their id (a seeding stand-in for
    trained k-means centroids — swap in k-means|| output in production; the
    index structure and probe path below are unchanged).  ``family="md5"``
    seeds with the portable 60-bit md5 hash DuckDB reproduces exactly,
    making the whole IVF query oracle-checkable."""
    from pyspark.sql import Window

    if family == "md5":
        h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col(id_col).cast("string"))
    ranked = corpus.select(
        as_double(F.col(vec_col)).alias("centroid_vec"), h.alias("__h")
    ).orderBy("__h").limit(n_centroids)
    return ranked.select(
        "centroid_vec",
        (F.row_number().over(Window.orderBy("__h")) - 1).alias("centroid_id"),
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
    rounded: bool = False,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (by cosine):
    broadcast the centroid table, score |V|·|C| pairs map-side, keep the
    top ``nprobe`` per vector.  For corpus indexing ``nprobe=1`` (each
    vector lives in one inverted list); for querying ``nprobe>1`` widens
    recall.  ``rounded`` assigns by the 6-digit-rounded cosine (with
    centroid_id tiebreak) so an oracle in another engine makes identical
    choices."""
    sim = cosine(F.col("__v"), F.col("centroid_vec"))
    if rounded:
        sim = round6(sim)
    scored = vectors.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    ).join(F.broadcast(centroids)).select(
        id_col, "__v", "centroid_id", sim.alias("__c")
    )
    if nprobe == 1 and not rounded:
        # single assignment: max_by aggregation, no window shuffle
        return scored.groupBy(id_col).agg(
            F.max_by("centroid_id", "__c").alias("centroid_id"),
            F.first("__v").alias("__v"),
        )
    return top_k_per_group(
        scored,
        [id_col],
        [F.col("__c").desc(), F.col("centroid_id").asc()],
        nprobe,
        rank_col="__r",
    ).select(id_col, "centroid_id", "__v")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    family: str = "xxhash64",
    rounded: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_centroids`` inverted lists (one coarse-quantizer pass), probe only
    the ``nprobe`` lists nearest each query.

    Scale shape: the corpus is scored against the centroid table once
    (map-side, broadcast) and shuffled once on ``centroid_id`` — afterwards
    each executor owns whole inverted lists and query probes are routed to
    exactly ``nprobe`` of them, touching ``~nprobe/n_centroids`` of the
    corpus instead of all of it.

    ``family="md5"`` + ``rounded=True`` is the oracle-checkable
    configuration: portable centroid seeding and rounded-cosine decisions
    reproduce bit-identically in DuckDB."""
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col, family=family)
    lists = ivf_assign(
        spread(corpus), cents, id_col, vec_col, nprobe=1, rounded=rounded
    ).select(F.col(id_col).alias("neighbor_id"), F.col("centroid_id"), F.col("__v").alias("cv"))
    probes = ivf_assign(queries, cents, id_col, vec_col, nprobe=nprobe, rounded=rounded).select(
        F.col(id_col).alias("query_id"), "centroid_id", F.col("__v").alias("qv")
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if rounded:
        sim = round6(sim)
    scored = lists.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def kmeans_fit_predict(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    family: str = "md5",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column: md5-seeded
    init (shared with the IVF quantizer), ``iters`` assign/update rounds,
    one final assignment.  Returns ``(id, cluster_id)`` for every vector.

    Portability contract (what makes the full iterative algorithm
    value-hash checkable in DuckDB): assignment uses 6-digit-rounded
    squared L2 with centroid-id tiebreak, and the centroid update
    accumulates per-dimension in EXACT integer micro-units —
    ``(SUM(round(x*1e6)) DIV n) / 1e6`` — so updated centroids are
    bit-identical across engines, partitionings, and row orders (a plain
    float mean would drift by summation order).

    Scale shape: per iteration, one broadcast of the k-row centroid table
    (assignment is map-side, min-of-struct partial aggregate — no window),
    then one dimension-exploded shuffle (rows × dim) for the update —
    Lloyd's standard distributed form.  The input projection is cached
    across iterations; at 100 TB use a sampled fit (fit on a deterministic
    hash-sample, predict over the full corpus) or k-means|| init instead
    of more Lloyd rounds."""
    # null vectors can't participate in distance math; excluding them here
    # (not silently mis-assigning) keeps both engines' decisions identical
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    v = (
        spread(corpus)
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
        .cache()
    )
    cents = ivf_centroids(corpus, k, id_col, vec_col, family=family).select(
        F.col("centroid_vec").alias("__c"), F.col("centroid_id")
    )

    def assign(cents: DataFrame) -> DataFrame:
        d2 = round6(
            dot(F.col("__v"), F.col("__v"))
            - 2 * dot(F.col("__v"), F.col("__c"))
            + dot(F.col("__c"), F.col("__c"))
        )
        scored = v.join(F.broadcast(cents)).select(
            F.col(id_col), F.col("__v"), F.col("centroid_id"), d2.alias("__d2")
        )
        best = scored.groupBy(id_col).agg(
            F.min(F.struct(F.col("__d2"), F.col("centroid_id").alias("cid"))).alias("__b"),
            F.first("__v").alias("__v"),
        )
        return best.select(
            F.col(id_col), F.col("__b.cid").alias("cluster_id"), F.col("__v")
        )

    for _ in range(iters):
        a = assign(cents)
        dims = a.select(
            "cluster_id",
            F.transform("__v", lambda x: F.round(x * 1_000_000.0, 0).cast("long")).alias(
                "__m"
            ),
        ).selectExpr("cluster_id", "posexplode(__m) AS (pos, micro)")
        vals = (
            dims.groupBy("cluster_id", "pos")
            .agg(F.sum("micro").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .select(
                "cluster_id",
                "pos",
                (F.expr("__s DIV __n").cast("double") / F.lit(1_000_000.0)).alias("val"),
            )
        )
        cents = vals.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("__c")
        ).select(F.col("__c"), F.col("cluster_id").alias("centroid_id"))

    # Materialize the (small: id, cluster_id) result eagerly so the cached
    # projection can be released NOW — without this, repeated fits leak
    # cached blocks for the life of the session (ADVICE r4): the plan is
    # lazy, so an unpersist before the caller's first action would empty
    # the cache before it is ever hit.  localCheckpoint blocks are RDD
    # storage, reclaimed by the ContextCleaner once unreferenced, unlike
    # DataFrame cache entries which live until an explicit unpersist.
    out = (
        assign(cents)
        .select(F.col(id_col), F.col("cluster_id"))
        .localCheckpoint(eager=True)
    )
    v.unpersist()
    return out


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.2,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    family: str = "md5",
) -> DataFrame:
    """SemDedup (Abbas et al., 2023): semantic deduplication by clustering
    embeddings, then dropping within-cluster near-duplicates above a cosine
    threshold, keeping the lowest-id representative of each duplicate
    group (greedy-by-id, so the kept set is deterministic).

    Scale shape — the whole point of the algorithm: pairwise comparison
    happens ONLY inside a cluster, never across the corpus.  Cluster count
    is chosen ∝ N/target_cluster_size (FAISS k-means at ~100k vectors per
    cluster in the paper), so the per-cluster self-join is bounded work;
    the corpus shuffles once on ``cluster_id`` and both join sides are
    co-partitioned by it.  Centroids here are the deterministic md5-seeded
    stand-in shared with the IVF index (swap in trained k-means centroids
    without touching the plan); assignment + pair decisions use 6-digit
    rounded cosine so an independent DuckDB oracle reproduces the kept set
    bit-identically.

    Output: one row per vector — ``(id, cluster_id, max_sim_lower,
    kept)`` where ``max_sim_lower`` is the max rounded cosine to any
    lower-id cluster-mate (sentinel -2.0 when none) and ``kept = 1`` iff
    that max is below ``threshold``.
    """
    # null vectors would get an engine-dependent arbitrary cluster (NULL
    # ordering differs between Spark desc_nulls_last and DuckDB windows)
    # and pass the keep filter vacuously — exclude them up front
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    cents = ivf_centroids(corpus, n_clusters, id_col, vec_col, family=family)
    assigned = ivf_assign(
        spread(corpus), cents, id_col, vec_col, nprobe=1, rounded=True
    ).select(F.col(id_col), F.col("centroid_id").alias("cluster_id"), F.col("__v"))
    a = assigned.select(
        F.col(id_col).alias("__ida"), F.col("cluster_id"), F.col("__v").alias("__va")
    )
    b = assigned.select(
        F.col(id_col).alias("__idb"), F.col("cluster_id"), F.col("__v").alias("__vb")
    )
    lowmax = (
        a.join(b, "cluster_id")
        .filter(F.col("__ida") > F.col("__idb"))
        .select(
            F.col("__ida"),
            round6(cosine(F.col("__va"), F.col("__vb"))).alias("__sim"),
        )
        .groupBy("__ida")
        .agg(F.max("__sim").alias("max_sim_lower"))
    )
    return (
        assigned.join(lowmax, assigned[id_col] == lowmax["__ida"], "left")
        .select(
            F.col(id_col),
            F.col("cluster_id"),
            F.coalesce(F.col("max_sim_lower"), F.lit(-2.0)).alias("max_sim_lower"),
            (
                F.coalesce(F.col("max_sim_lower"), F.lit(-2.0)) < F.lit(threshold)
            )
            .cast("long")
            .alias("kept"),
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an embedding (array<double>); zero vectors pass
    through unchanged (guard against division by zero).  Normalized
    corpora turn cosine into a plain dot product — one multiply-add per
    element saved on EVERY pair scored downstream, which at ANN scale is
    the single cheapest optimization available."""
    n = norm(vec)
    return F.when(n == 0, vec).otherwise(F.transform(vec, lambda x: x / n))


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 scalar quantization: scale = max|x| / 127, elements
    rounded to [-127, 127] — 4× memory reduction for ANN indexes (the
    embedding-store standard).  Returns a struct(scale, q) so the caller
    keeps the dequantization factor next to the codes."""
    max_abs = F.array_max(F.transform(vec, F.abs))
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0, F.transform(vec, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(vec, lambda x: F.round(x / scale, 0).cast("long"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_limit: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine > threshold).  ``id_limit``
    bounds the quadratic baseline for tests; the scale path is
    ``lsh_topk``-style bucketing first."""
    base = df
    if id_limit is not None:
        base = base.filter(F.col(id_col) < id_limit)
    a = spread(base).select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") > threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    sample: int = 1024,
    iters: int = 10,
) -> np.ndarray:
    """Train deterministic PQ codebooks: ``m`` subspaces of ``dim//m``
    dims, ``k`` centroids each, via per-subspace Lloyd iterations over a
    BOUNDED hash-ordered sample (md5 of the id — no RNG, stable under
    retries and across engines).  Codebook training is the one legitimately
    driver-side step of PQ (a fixed-size sample regardless of corpus
    scale); encoding and search below never leave the executors.

    Returns an ``(m, k, dim//m)`` float64 array — broadcast it by closure
    into :func:`pq_encode` / :func:`pq_topk`."""
    sub = dim // m
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    rows = (
        corpus.select(as_double(F.col(vec_col)).alias("v"), h.alias("__h"))
        .orderBy("__h")
        .limit(sample)
        .collect()
    )
    X = np.array([r["v"] for r in rows])
    books = np.zeros((m, k, sub))
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[:k].copy()  # deterministic init: first k in hash order
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(k):
                pts = Xs[assign == j]
                if len(pts):
                    C[j] = pts.mean(0)
        books[s] = C
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounded: bool = False,
) -> DataFrame:
    """Encode every vector as ``m`` small centroid indices — with the
    default 8×16 layout that is 8 codes (4 bits each) replacing 64 float32:
    a 64× memory reduction, the representation a billion-vector index
    actually stores.  Arrow-batched argmin per subspace; one narrow pass.

    ``rounded=True`` is the portable configuration: subspace distances are
    rounded to 1e-6 (as scaled int64) before the argmin, ties break to the
    lowest centroid id — every assignment decision is then reproducible
    bit-for-bit by an independent engine (the DuckDB oracle)."""
    from pyspark.sql.functions import pandas_udf

    mm, kk, sub = codebooks.shape
    cb = codebooks

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy())
        codes = np.zeros((len(X), mm), np.int32)
        for s in range(mm):
            Xs = X[:, s * sub : (s + 1) * sub]
            # Sequential accumulation over the sub-dimension (not np.sum's
            # pairwise order) — matches the oracle's left-to-right list_sum
            # exactly, so the rounded argmin decisions are portable.
            d2 = np.zeros((len(X), cb[s].shape[0]))
            for i in range(sub):
                diff = Xs[:, None, i] - cb[s][None, :, i]
                d2 += diff * diff
            if rounded:
                d2 = np.round(d2 * 1e6).astype(np.int64)
            # np.argmin ties -> first (lowest centroid id), matching the
            # oracle's ORDER BY (dist, centroid_id) row_number pick.
            codes[:, s] = d2.argmin(1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), enc(as_double(F.col(vec_col))).alias("codes"))


def _pq_luts(q_rows, codebooks: np.ndarray, rounded: bool) -> np.ndarray:
    """Per-query ADC lookup tables: squared distance from each query
    subvector to every subspace centroid, accumulated SEQUENTIALLY over the
    sub-dimension (matching pq_encode / the oracle's left-to-right
    list_sum).  ``rounded`` scales to int64 (round(d*1e6)) so downstream
    sums are exact integer arithmetic."""
    mm, kc, sub = codebooks.shape
    luts = np.zeros((len(q_rows), mm, kc))
    for qi, r in enumerate(q_rows):
        qv = np.array(r["v"])
        for s in range(mm):
            acc = np.zeros(kc)
            for i in range(sub):
                diff = codebooks[s][:, i] - qv[s * sub + i]
                acc += diff * diff
            luts[qi, s] = acc
    if rounded:
        luts = np.round(luts * 1e6).astype(np.int64)
    return luts


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounded: bool = False,
) -> DataFrame:
    """Approximate L2 top-k by asymmetric distance computation (ADC): each
    (bounded) query precomputes an ``(m, k_codebook)`` lookup table of
    partial squared distances to every subspace centroid; the corpus is
    scanned in the COMPRESSED domain only — per row, the distance is ``m``
    table lookups and a sum, never a float-vector op.  Scale shape: the
    corpus-side scan touches 8 bytes/vector instead of 256, LUTs ride the
    closure (|Q|·m·k doubles), and the only shuffle is the final top-k per
    query.  Output: (query_id, neighbor_id, l2_sq, rank).

    ``rounded=True`` (the portable configuration): LUT entries become
    ``round(dist * 1e6)`` int64, the ADC sum is EXACT integer arithmetic
    (immune to float summation order across engines), and ``l2_sq`` is the
    integer sum divided by 1e6 — so an independent engine reproduces every
    distance and every rank decision bit-for-bit."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    mm, kc, sub = codebooks.shape
    id_type = corpus.schema[id_col].dataType  # honor non-bigint id columns
    q_rows = queries.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).collect()  # bounded query set — same contract as brute_force_topk
    qids = np.array([r[id_col] for r in q_rows])
    luts = _pq_luts(q_rows, codebooks, rounded)

    enc = pq_encode(corpus, codebooks, id_col, vec_col, rounded=rounded)
    out_schema = StructType(
        [
            StructField("query_id", id_type, False),
            StructField("neighbor_id", id_type, False),
            StructField("l2_sq", DoubleType(), False),
        ]
    )

    def adc(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf[id_col].to_numpy()
            n = len(ids)
            # (Q, n): sum over subspaces of LUT[q, s, codes[:, s]] —
            # exact int64 accumulation in the rounded configuration.
            d = np.zeros((len(qids), n), dtype=luts.dtype)
            for s in range(mm):
                d += luts[:, s, codes[:, s]]
            if rounded:
                d = d / 1e6
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(ids, len(qids)),
                    "l2_sq": d.reshape(-1),
                }
            )

    scored = enc.mapInPandas(adc, out_schema).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("l2_sq").asc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    family: str = "md5",
    rounded: bool = True,
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN index (FAISS ``IVFx,PQy``) —
    a coarse quantizer routes each vector into one of ``n_centroids``
    inverted lists, vectors are stored PQ-compressed, and each query scans
    only its ``nprobe`` probed lists in the COMPRESSED domain via ADC.

    Scale shape: combines both partial indexes' wins — the IVF routing cuts
    the scanned fraction to ~nprobe/n_centroids, PQ cuts the bytes per
    scanned vector to ``m`` codes; together a 100 TB corpus answers a query
    touching ~1/4 of the lists at 8 bytes/vector.  The ADC sum here is a
    pure Catalyst ``aggregate`` over a broadcast LUT literal — NO Python in
    the scoring hot path (encode is the one Arrow pass).

    ``rounded=True`` + ``family="md5"``: every routing decision
    (rounded-cosine argmax), code assignment (scaled-int argmin), and ADC
    distance (exact int sum) reproduces bit-for-bit in the DuckDB oracle.
    """
    mm, kc, sub = codebooks.shape
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col, family=family)
    lists = ivf_assign(
        spread(corpus), cents, id_col, vec_col, nprobe=1, rounded=rounded
    ).select(F.col(id_col).alias("neighbor_id"), "centroid_id")
    enc = pq_encode(corpus, codebooks, id_col, vec_col, rounded=rounded).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    probes = ivf_assign(
        queries, cents, id_col, vec_col, nprobe=nprobe, rounded=rounded
    ).select(F.col(id_col).alias("query_id"), "centroid_id")

    q_rows = queries.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).collect()  # bounded query set
    luts = _pq_luts(q_rows, codebooks, rounded)
    # LUT as one literal map query_id -> array<array<bigint>> riding the
    # plan (|Q|*m*k entries; 5*8*16 = 640 literals at the registry config).
    lut_map = F.create_map(
        *[
            x
            for r, lut in zip(q_rows, luts)
            for x in (
                F.lit(r[id_col]),
                F.array(*[F.array(*[F.lit(v.item()) for v in row]) for row in lut]),
            )
        ]
    )

    cand = (
        lists.join(enc, "neighbor_id")
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__lut", F.element_at(lut_map, F.col("query_id")))
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(mm - 1)),
        F.lit(0).cast("long" if rounded else "double"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("__lut"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    l2 = (dist / F.lit(1e6)) if rounded else dist
    scored = cand.select("query_id", "neighbor_id", l2.alias("l2_sq"))
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("l2_sq").asc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
