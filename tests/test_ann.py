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
