"""Window / ranking / pagination operators (SURVEY.md §2.7 W1, §2.8 L1).

The reference uses ranking only as the (commented-out) batch-dedup idiom
(silver.py:7,13-18) and pagination at the serving layer
(webapp/app/api/mongodb/route.ts:9-17, natural order).  The engine exposes
both generically with deterministic total ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (one shuffle on the partition
    keys; Spark pushes a per-partition top-k limit below the sort when k is
    small, so this stays bounded at scale)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def paginate(df: DataFrame, sort_cols: Sequence[str], page: int, page_size: int) -> DataFrame:
    """L1 with a deterministic sort (the reference's Mongo ``skip/limit`` has
    natural order; an engine must pin ordering or pages are unstable).

    Note for 100 TB: deep pagination via global sort + offset is inherently
    driver-unfriendly; serve deep pages keyset-style (``WHERE key > last``)
    — this helper is the API-compatible form for bounded offsets.
    """
    return df.orderBy(*sort_cols).offset((page - 1) * page_size).limit(page_size)
