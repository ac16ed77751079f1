"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 gap: the reference needs none, but the engine exposes the
escape hatch for semantics built-ins can't reach).

``running_counter`` maintains an arbitrary per-key running aggregate across
micro-batches with explicit state — the minimal template for custom
stateful logic (Arrow-batched, grouped state in the state store, timeout
hooks available for TTL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("total", DoubleType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_id", StringType()),
        StructField("event_count", LongType()),
        StructField("cumulative_score", DoubleType()),
    ]
)


def _update_running(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (group_id,) = key
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["score"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"group_id": [group_id], "event_count": [count], "cumulative_score": [total]}
    )


def running_counter(events: DataFrame) -> DataFrame:
    """Per-key running (count, sum) with explicit state — the
    applyInPandasWithState template.  Input needs ``group_id`` and
    ``score`` columns; emits the updated running aggregate for every key
    seen in the batch (update output mode)."""
    return events.groupBy("group_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXPIRING_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_id", StringType()),
        StructField("event_count", LongType()),
        StructField("cumulative_score", DoubleType()),
        StructField("expired", BooleanType()),
    ]
)


def expiring_counter(events: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """Per-key running (count, sum) with a processing-time TTL — the
    timeout branch of the ``applyInPandasWithState`` API (the one stateful
    path ``running_counter`` doesn't exercise).

    While a key keeps receiving data, every batch re-arms its timeout and
    emits the running aggregate with ``expired = false``.  When a key goes
    ``timeout_ms`` of processing time without data, the state store invokes
    the function with ``state.hasTimedOut`` and an empty input iterator; the
    operator emits one final ``expired = true`` row and removes the state —
    the idle-session-finalization pattern (and the state-TTL pattern that
    keeps unbounded-key streams from growing state forever, which is what
    makes this safe at 100 TB key cardinalities).

    Run it with a LIVE trigger (``processingTime``): once a processing-time
    timeout is armed, the engine keeps scheduling micro-batches on its own,
    so expirations flush promptly even with no new data.  The flip side
    (measured, see ``test_expiring_counter_processing_time_timeout``):
    ``availableNow`` drains never terminate with this operator — the
    timeout-check batches keep the query alive — so the TTL path is
    live-mode-only by construction.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_id,) = key
        if state.hasTimedOut:
            count, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "group_id": [group_id],
                    "event_count": [count],
                    "cumulative_score": [total],
                    "expired": [True],
                }
            )
            return
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["score"].sum())
        state.update((count, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "group_id": [group_id],
                "event_count": [count],
                "cumulative_score": [total],
                "expired": [False],
            }
        )

    return events.groupBy("group_id").applyInPandasWithState(
        update,
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_counter_tws(events: DataFrame) -> DataFrame:
    """Same running (count, sum) operator on the transformWithState API
    (Spark 4.x successor to applyInPandasWithState): typed value-state
    handles, composable state variables, timer hooks.  Kept semantically
    identical to ``running_counter`` so tests can assert the two stateful
    runtimes agree.

    Requires a ``google.protobuf`` runtime (the TWS state server speaks
    protobuf to the JVM).  This container has no pip install, but
    ``protobuf_compat`` locates the pure-Python runtime inside the public
    Google Cloud SDK and scopes it to driver + TWS workers (see that
    module's docstring); only if NO runtime can be located does this
    raise — ``running_counter`` (applyInPandasWithState) is the
    dependency-free fallback with identical semantics."""
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_tws_worker_env,
    )

    if ensure_tws_worker_env(events.sparkSession) is None:
        # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use running_counter (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            count, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                count += len(pdf)
                total += float(pdf["score"].sum())
            self._agg.update((count, total))
            yield pd.DataFrame(
                {
                    "group_id": [key[0]],
                    "event_count": [count],
                    "cumulative_score": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("group_id").transformWithStateInPandas(
        RunningCounter(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
