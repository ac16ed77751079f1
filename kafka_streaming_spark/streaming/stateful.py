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
