"""Offline streaming-state inspection via Spark's State Data Source.

The medallion's correctness rests on state (dedup sets, running folds,
session windows).  At 100 TB the operational questions — *is state
growing without bound? which keys are hot? what does the fold for key X
actually hold right now?* — must be answerable WITHOUT stopping the
pipeline or sprinkling debug emits into it.  Spark 4 ships exactly this
as a batch data source over a streaming checkpoint:

- ``format("state-metadata")`` — one row per stateful operator in the
  checkpoint (operator id/name, partition counts, batch id range);
- ``format("statestore")`` — the state rows themselves as
  ``(key struct, value struct, partition_id)``, optionally pinned to a
  ``batchId`` / ``operatorId`` / ``storeName`` / join ``side``.

These helpers wrap the two formats with the option plumbing and a
flattened view; ``test_state_reader_offline_inspection`` pins that the
offline read of a ``running_counter`` checkpoint equals the batch
groupBy over the same events — i.e. the state store holds exactly the
fold the operator claims.

Scale note: the reads are batch scans over the checkpoint's state files
(RocksDB SSTs / HDFS store deltas), partition-parallel like any other
scan, and support ``snapshotStartBatchId``/``snapshotPartitionId`` for
targeted forensics on one partition of one batch — the right shape for
poking a 10k-partition production checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_state_store_coordinator(spark: SparkSession) -> None:
    """Force the session's StateStoreCoordinator RPC endpoint into
    existence before a statestore read.

    The coordinator is created lazily by the first STREAMING query a
    session runs; a fresh session that only READS state (checkpoint
    staged by an earlier session) has no endpoint and the partition
    readers fail with ``RpcEndpointNotFoundException:
    StateStoreCoordinator`` inside ``CANNOT_LOAD_STATE_STORE``
    (measured r9 — the failure is ORDER-dependent: any prior streaming
    query in the session masks it).  Touching the streaming query
    manager's lazy val creates the endpoint without running a query;
    guarded because it reaches one level into Spark's session state
    (stable across 3.x/4.x, but a signature change must degrade to the
    old order-dependent behavior, not break reads that would have
    worked)."""
    try:
        jss = spark._jsparkSession
        jss.sessionState().streamingQueryManager().stateStoreCoordinator()
    except Exception:  # pragma: no cover - depends on internal API
        pass


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """One row per stateful operator recorded in ``checkpoint`` (id,
    name, per-partition store names, min/max usable batch ids)."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    batch_id: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
    state_var: str | None = None,
) -> DataFrame:
    """State rows of one operator's store in ``checkpoint`` as
    ``(key, value, partition_id)`` structs.

    Defaults follow the data source: latest committed batch, operator 0,
    the default store.  ``join_side`` ("left"/"right") targets the four
    internal stores of a stream-stream join without naming them;
    ``state_var`` targets one state VARIABLE of a transformWithState
    operator (its stores are column families keyed by variable name —
    e.g. ``state_var="agg"`` for ``running_counter_tws``)."""
    _ensure_state_store_coordinator(spark)
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    if state_var is not None:
        reader = reader.option("stateVarName", state_var)
    return reader.load(checkpoint)


def flatten_structs(df: DataFrame) -> DataFrame:
    """Star-expand every struct column RECURSIVELY into one flat
    namespace.  When a child name would collide with any other resulting
    column (common for generic TWS stores whose key field names also
    appear inside the value struct), the colliding children are prefixed
    with their parent column name (``key_group_id`` / ``value_group_id``)
    instead of producing duplicate/ambiguous columns; unique names stay
    bare so the existing analyst-facing views are unchanged."""
    from collections import Counter

    from pyspark.sql.types import StructType as _Struct

    for _ in range(8):  # state schemas are shallow; 8 is a safety bound
        if not any(
            isinstance(f.dataType, _Struct) for f in df.schema.fields
        ):
            break
        proposed: list[tuple[str | None, str]] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, _Struct):
                proposed += [(f.name, c.name) for c in f.dataType.fields]
            else:
                proposed.append((None, f.name))
        counts = Counter(name for _, name in proposed)
        cols = []
        for parent, name in proposed:
            if parent is None:
                cols.append(F.col(f"`{name}`"))
            else:
                out = f"{parent}_{name}" if counts[name] > 1 else name
                cols.append(F.col(f"`{parent}`.`{name}`").alias(out))
        df = df.select(*cols)
    return df


def read_state_flat(spark: SparkSession, checkpoint: str, **kw) -> DataFrame:
    """:func:`read_state` with the key/value structs star-expanded
    RECURSIVELY via :func:`flatten_structs` — the analyst-facing view
    (one column per key field and per state field, plus
    ``partition_id``).  Recursion matters because the value column nests
    the user state one level down (e.g. ``value.groupState.count`` for
    applyInPandasWithState stores); name collisions between key and
    value fields come out parent-prefixed instead of ambiguous."""
    return flatten_structs(read_state(spark, checkpoint, **kw))


def state_key_skew(
    spark: SparkSession, checkpoint: str, top_n: int = 20, **kw
) -> DataFrame:
    """Hot-partition forensics: state-row counts per store partition,
    largest first — the first question asked when one task of a stateful
    stage straggles (key skew concentrated in one partition)."""
    return (
        read_state(spark, checkpoint, **kw)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_state_rows"))
        .orderBy(F.col("n_state_rows").desc(), "partition_id")
        .limit(top_n)
    )


def read_state_changes(
    spark: SparkSession,
    checkpoint: str,
    *,
    start_batch_id: int = 0,
    end_batch_id: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
    state_var: str | None = None,
) -> DataFrame:
    """The state CHANGE FEED: one row per state mutation per batch
    (``batch_id``, ``change_type`` update/delete, key, value,
    ``partition_id``) — how a key's fold EVOLVED, not just where it
    ended up.  The forensics this answers at 100 TB: when did this key's
    state start ballooning, which batch dropped it, did the TTL actually
    evict.  Same pinning options as :func:`read_state`."""
    _ensure_state_store_coordinator(spark)
    reader = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch_id)
    )
    if end_batch_id is not None:
        reader = reader.option("changeEndBatchId", end_batch_id)
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if state_var is not None:
        reader = reader.option("stateVarName", state_var)
    return reader.load(checkpoint)
