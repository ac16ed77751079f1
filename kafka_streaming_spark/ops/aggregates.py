"""Aggregation operators (SURVEY.md §2.6 A1-A5).

``group_agg`` is the per-batch grouped multi-aggregate (gold.py:11-16);
``incremental_fold`` is the running-total maintenance the reference performs
with MERGE update expressions (gold.py:19-45, A2/J2) expressed as a pure
DataFrame fold so it is oracle-checkable without Delta.

Invariant (tested, FIXTURES.md F3): ``fold(batches) == group_agg(union(batches))``
for sum/count/min/max — the algebraic property that makes incremental
maintenance correct.  ``avg`` is re-derived from the folded sum/count on every
combine, exactly like gold.py:26-28.

Scale notes: ``group_agg`` is a hash aggregate with map-side partial
aggregation (Catalyst does this automatically) — one shuffle on the group
key.  ``incremental_fold`` shuffles only the *batch aggregate* (|groups|
rows, not |events|) against the running state, which is the whole point of
the reference's CDF-driven gold table: per-trigger work is proportional to
the delta, not the history.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output column names, aligned with the reference gold schema
#: (config.py:44-56) minus the non-deterministic ``updated_at``.
AGG_COLUMNS = (
    "cumulative_score",
    "event_count",
    "avg_score",
    "first_event_timestamp",
    "last_event_timestamp",
)


def group_agg(
    df: DataFrame,
    keys: Sequence[str] = ("group_id",),
    score_col: str = "score",
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """A1 + A5: ``groupBy(keys).agg(sum, count, min, max)`` with the derived
    mean (gold.py:11-16).  Double-precision accumulation (see schemas.py).
    """
    return df.groupBy(*keys).agg(
        F.sum(score_col).alias("cumulative_score"),
        F.count(F.lit(1)).alias("event_count"),
        (F.sum(score_col) / F.count(F.lit(1))).alias("avg_score"),
        F.min(ts_col).alias("first_event_timestamp"),
        F.max(ts_col).alias("last_event_timestamp"),
    )


def combine_states(state: DataFrame, batch_agg: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J2 batch form: merge a batch's aggregate into the running state.

    Full outer join on the group keys + coalesce arithmetic — the DataFrame
    equivalent of ``whenMatchedUpdate(set={cumulative_score: t.c + s.c, ...})
    .whenNotMatchedInsert(...)`` (gold.py:19-45).

    Deviation from the reference, on purpose: ``first_event_timestamp`` is
    maintained as a true running ``least`` (the reference overwrites it with
    each batch's min — "batch-first", documented in FIXTURES.md F3; the
    reference behaviour is pinned separately in tests).
    """
    # Qualified string refs ("t.x"), not DataFrame-object refs (t["x"]):
    # state and batch_agg routinely share lineage (both derived from the
    # same source), and object refs are ambiguous under self-join analysis.
    t = state.alias("t")
    s = batch_agg.alias("s")
    tc, sc = (lambda c: F.col(f"t.{c}")), (lambda c: F.col(f"s.{c}"))
    cond = [tc(k) == sc(k) for k in keys]
    cum = F.coalesce(tc("cumulative_score"), F.lit(0.0)) + F.coalesce(
        sc("cumulative_score"), F.lit(0.0)
    )
    cnt = F.coalesce(tc("event_count"), F.lit(0)) + F.coalesce(sc("event_count"), F.lit(0))
    return t.join(s, cond if len(cond) > 1 else cond[0], "full_outer").select(
        *[F.coalesce(tc(k), sc(k)).alias(k) for k in keys],
        cum.alias("cumulative_score"),
        cnt.alias("event_count"),
        (cum / cnt).alias("avg_score"),
        F.least(tc("first_event_timestamp"), sc("first_event_timestamp")).alias(
            "first_event_timestamp"
        ),
        F.greatest(tc("last_event_timestamp"), sc("last_event_timestamp")).alias(
            "last_event_timestamp"
        ),
    )


def incremental_fold(
    batches: Iterable[DataFrame],
    keys: Sequence[str] = ("group_id",),
    score_col: str = "score",
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """A2: fold per-batch aggregates into a running gold state.

    ``least``/``greatest`` ignore NULLs (Spark semantics), so outer-join
    misses coalesce correctly.
    """
    state: DataFrame | None = None
    for batch in batches:
        agg = group_agg(batch, keys, score_col, ts_col)
        state = agg if state is None else combine_states(state, agg, keys)
    if state is None:
        raise ValueError("incremental_fold requires at least one batch")
    return state
