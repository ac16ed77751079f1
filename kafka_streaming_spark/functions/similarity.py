"""Embedding similarity search: brute-force cosine top-k (baseline) and a
random-hyperplane LSH-bucketed variant (the scale path).

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


def _hyperplanes(dim: int, planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (no RNG dependency:
    a splitmix64-style integer mix of (plane, coordinate) mapped to
    [-1, 1])."""
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


def lsh_bucket(vec: Column, dim: int, planes: int = 16) -> Column:
    """Random-hyperplane signature: sign bit per plane packed into a long.
    Two vectors with small angle collide with probability
    (1 - θ/π)^planes."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, planes)):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(as_double(vec), lit_plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        key = key + bit.cast("long") * F.lit(2**i)
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: score only pairs whose hyperplane signature
    matches (single-probe).  Linear bucketing pass over the corpus, then a
    bucket-equijoin — the shuffle is on the bucket key, so co-bucketed
    vectors land on the same executor and the cross-scoring never leaves it."""
    bq = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    bc = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    scored = bc.join(F.broadcast(bq), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


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
