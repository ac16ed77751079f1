"""ANN recall tests: the approximate indexes (IVF inverted lists,
multi-table hyperplane LSH) measured against the exact brute-force top-k.

Both indexes are fully deterministic (hash-seeded centroids, integer-mixed
hyperplanes), so recall on the fixed testdata is a constant — the floors
below are safety margins under the measured values (IVF 0.56, LSH 0.92 at
sf0.001 with 6 planes × 8 tables + radius-1 multiprobe), not statistical
bounds.  These embeddings are near-uniform (no strong cluster structure),
which is the WORST case for ANN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_spark.functions import similarity as S
from kafka_streaming_spark.schemas import load_table
from tests.conftest import SF_SMALL

K = 5


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf = _pairs(S.brute_force_topk(emb, queries, k=K))
    assert len(bf) == 5 * K

    ivf = _pairs(S.ivf_topk(emb, queries, k=K, n_centroids=16, nprobe=4))
    assert len(ivf) == 5 * K  # probing 4/16 lists still finds k everywhere
    assert len(bf & ivf) / len(bf) >= 0.40

    lsh = _pairs(S.lsh_topk(emb, queries, k=K, dim=64))
    assert len(bf & lsh) / len(bf) >= 0.5  # measured 0.92 at the defaults

    # multiprobe is strictly additive: radius 1 ⊇ radius 0 candidates
    lsh0 = _pairs(S.lsh_topk(emb, queries, k=K, dim=64, multiprobe=0))
    assert len(bf & lsh) >= len(bf & lsh0)


def test_lsh_arrow_keys_equal_sql_keys(spark):
    """The Arrow/BLAS bucket-key fast path must produce byte-identical
    (id, table, key) assignments to the pure Column-expression path."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    arrow = {tuple(r) for r in S.lsh_keys_df(emb, "vec_id", "embedding", 64, 6, 4).collect()}
    sql = {tuple(r) for r in S.lsh_keys_df_sql(emb, "vec_id", "embedding", 64, 6, 4).collect()}
    assert arrow == sql
    assert len(arrow) == emb.count() * 4


def test_ivf_widening_nprobe_converges_to_exact(spark):
    """nprobe = n_centroids ⇒ every inverted list is probed ⇒ IVF degrades
    gracefully to the exact search (same top-k set)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    bf = _pairs(S.brute_force_topk(emb, queries, k=K))
    full = _pairs(S.ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=8))
    assert full == bf


def test_pq_adc_recall_and_compression(spark):
    """Product quantization: codebooks are deterministic, codes are m small
    ints (the 64x-compressed representation), and ADC top-k against exact
    L2 ground truth clears a recall floor on the near-uniform (worst-case)
    testdata embeddings."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    # 16 subspaces x 16 centroids = 64-bit codes (16x compression vs
    # float32); finer subspaces beat bigger codebooks on near-uniform data
    # (measured: 8x16 -> 0.08 recall, 8x256 -> 0.48, 16x16 -> 0.52).
    books = S.pq_train_codebooks(emb, dim=64, m=16, k=16, sample=1024, iters=8)
    books2 = S.pq_train_codebooks(emb, dim=64, m=16, k=16, sample=1024, iters=8)
    assert books.shape == (16, 16, 4)
    assert np.array_equal(books, books2)  # fully deterministic training

    codes = S.pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 16 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["codes"])

    # exact L2 ground truth, computed independently in numpy
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    truth = set()
    for r in rows:
        if r["vec_id"] >= 5:
            continue
        q = np.array(list(r["embedding"]), dtype=np.float64)
        d = ((X - q) ** 2).sum(1)
        d[ids == r["vec_id"]] = np.inf
        for j in np.argsort(d, kind="stable")[:K]:
            truth.add((r["vec_id"], int(ids[j])))

    got = _pairs(S.pq_topk(emb, queries, books, k=K))
    assert len(got) == 5 * K
    recall = len(truth & got) / len(truth)
    assert recall >= 0.4, f"PQ recall {recall}"  # measured 0.52 (deterministic)


def test_ivfpq_composition_properties(spark):
    """IVF-PQ sanity: (a) returns k rows per query; (b) probing ALL lists
    makes IVF-PQ equal plain PQ top-k on the same codebooks (the routing
    only ever prunes candidates, never rescores them); (c) the registry's
    rounded config is deterministic across runs."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = S.pq_train_codebooks(emb, dim=64, m=8, k=16, sample=1024, iters=0)

    got = _pairs(S.ivfpq_topk(emb, queries, books, k=K, n_centroids=16, nprobe=4))
    assert len(got) == 5 * K

    all_lists = _pairs(
        S.ivfpq_topk(emb, queries, books, k=K, n_centroids=16, nprobe=16)
    )
    pq_full = _pairs(S.pq_topk(emb, queries, books, k=K, rounded=True))
    assert all_lists == pq_full

    again = _pairs(S.ivfpq_topk(emb, queries, books, k=K, n_centroids=16, nprobe=4))
    assert got == again


def test_kmeans_partitions_and_improves(spark):
    """Lloyd's k-means invariants: every vector assigned exactly once to
    ≤k clusters; assignments are deterministic across runs; and total
    within-cluster squared distance does not increase when iterating
    (Lloyd's monotonicity, measured under full precision)."""
    emb = load_table(spark, SF_SMALL, "embeddings")

    def inertia(iters):
        a = S.kmeans_fit_predict(emb, k=8, iters=iters, family="md5")
        v = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
        joined = a.join(v, "vec_id")
        # recompute centroids (plain mean is fine here: measurement only)
        cent = (
            joined.selectExpr("cluster_id", "posexplode(v) AS (pos, x)")
            .groupBy("cluster_id", "pos").agg(F.avg("x").alias("c"))
            .groupBy("cluster_id")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))),
                             lambda s: s["c"]).alias("cv"))
        )
        d2 = S.dot(F.col("v"), F.col("v")) - 2 * S.dot(F.col("v"), F.col("cv")) \
            + S.dot(F.col("cv"), F.col("cv"))
        row = joined.join(cent, "cluster_id").agg(F.sum(d2)).collect()[0][0]
        return row, a

    i1, a1 = inertia(1)
    i2, a2 = inertia(2)
    assert a1.count() == emb.count()
    assert a2.select("cluster_id").distinct().count() <= 8
    assert i2 <= i1 * 1.0001, (i1, i2)
    again = sorted(map(tuple, a2.collect()))
    assert again == sorted(map(tuple, S.kmeans_fit_predict(emb, k=8, iters=2, family="md5").collect()))


def test_null_vectors_excluded_from_clustering(spark):
    """Null embeddings must be excluded, not arbitrarily assigned (NULL
    ordering differs between engines); null text must encode as empty."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, 0.5])], ["vec_id", "embedding"]
    )
    km = {r["vec_id"] for r in S.kmeans_fit_predict(emb, k=2, iters=1).collect()}
    assert km == {1, 3}
    sd = {r["vec_id"] for r in S.semdedup(emb, n_clusters=2).collect()}
    assert sd == {1, 3}
