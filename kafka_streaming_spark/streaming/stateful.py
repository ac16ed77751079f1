"""Custom stateful streaming operators on BOTH Python stateful runtimes
(SURVEY.md §2.10 gap: the reference needs none, but the engine exposes the
escape hatch for semantics built-ins can't reach).

``applyInPandasWithState`` (dependency-free, any state store):
``running_counter`` — the minimal running-aggregate template;
``expiring_counter`` — the ProcessingTimeTimeout / TTL branch.

``transformWithStateInPandas`` (Spark 4.x successor; protobuf located by
``protobuf_compat``, RocksDB state store required) — one operator per
state primitive so the whole API surface stays executed and pinned:
``running_counter_tws`` (ValueState + ``handleInitialState`` warm
start, ≡ ``running_counter`` by test), ``topk_scores_tws`` (ListState,
bounded O(k) per key), ``expiring_counter_tws`` (processing-time
timers: registerTimer / handleExpiredTimer, ≡ ``expiring_counter``
semantics), ``type_counts_tws`` (MapState — sub-key aggregates without
widening the grouping key), ``session_finalize_tws`` (EVENT-TIME
timers — watermark-driven exactly-once session finalization).
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


def running_counter_tws(
    events: DataFrame, initial_state: DataFrame | None = None
) -> DataFrame:
    """Same running (count, sum) operator on the transformWithState API
    (Spark 4.x successor to applyInPandasWithState): typed value-state
    handles, composable state variables, timer hooks.  Kept semantically
    identical to ``running_counter`` so tests can assert the two stateful
    runtimes agree.

    ``initial_state`` (optional): a batch DataFrame with columns
    ``(group_id, event_count, cumulative_score)`` used to WARM-START the
    per-key state before the first batch (``handleInitialState``) — the
    production restart pattern the reference's medallion implies: resume
    the gold fold from the persisted gold table instead of replaying all
    history (reference gold.py:19-45 maintains exactly this running
    (count, sum) shape in the gold Delta table).

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

        def handleInitialState(self, key, initialState, timerValues):
            # One pandas row per key, delivered before the first batch.
            self._agg.update(
                (
                    int(initialState["event_count"].iloc[0]),
                    float(initialState["cumulative_score"].iloc[0]),
                )
            )

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
        initialState=(
            initial_state.groupBy("group_id")
            if initial_state is not None
            else None
        ),
    )


TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_id", StringType()),
        StructField("rank", LongType()),
        StructField("score", DoubleType()),
    ]
)


def topk_scores_tws(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-key running top-k scores on transformWithState LIST state —
    the composable-state-variable half of the TWS API that
    ``running_counter_tws`` (single ValueState) doesn't exercise.

    Each batch merges the group's new scores into a ListState holding at
    most ``k`` rows (sorted descending, truncated on every update, so
    state stays O(k) per key however many events stream through — the
    bounded-state property that matters at 100 TB key cardinalities) and
    emits the current top-k as (group_id, rank, score) rows in update
    mode.  The final emission per key equals the batch
    ``row_number() over (partition by key order by score desc) <= k``
    ranking — pinned by ``test_tws_list_state_topk``.

    Same runtime requirements as ``running_counter_tws``: a protobuf
    runtime (located by ``protobuf_compat``) and the RocksDB state store
    (multi-column-family state).
    """
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_tws_worker_env,
    )

    if ensure_tws_worker_env(events.sparkSession) is None:
        # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use a groupBy window ranking for the batch equivalent"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = StructType([StructField("score", DoubleType())])

    class TopKScores(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._scores = handle.getListState("scores", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            current = [r[0] for r in self._scores.get()]
            for pdf in rows:
                current.extend(float(s) for s in pdf["score"])
            top = sorted(current, reverse=True)[:k]
            self._scores.put([(s,) for s in top])
            yield pd.DataFrame(
                {
                    "group_id": [key[0]] * len(top),
                    "rank": list(range(1, len(top) + 1)),
                    "score": top,
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("group_id").transformWithStateInPandas(
        TopKScores(),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def expiring_counter_tws(
    events: DataFrame, timeout_ms: int = 60_000
) -> DataFrame:
    """The TTL / idle-finalization pattern on transformWithState TIMERS —
    the third pillar of the TWS API (``registerTimer`` /
    ``handleExpiredTimer``) after value state (``running_counter_tws``)
    and list state (``topk_scores_tws``).  Semantically mirrors
    ``expiring_counter`` (applyInPandasWithState ProcessingTimeTimeout):
    every batch folds the group's rows into a running (count, sum),
    re-arms a processing-time timer ``timeout_ms`` ahead (deleting the
    previously registered one — TWS timers are absolute timestamps, not
    durations), and emits ``expired = false``; when the timer fires for
    an idle key the state store calls ``handleExpiredTimer``, which
    emits ONE final ``expired = true`` row and clears the state, so a
    reappearing key restarts from zero.  Bounded state + timers per key
    is exactly what keeps unbounded-key streams safe at 100 TB
    cardinalities.

    Live-trigger-only, like every armed-timer operator: run with
    ``processingTime``; requires a protobuf runtime (protobuf_compat)
    and the RocksDB state store, and ``timeMode="ProcessingTime"``.
    """
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_tws_worker_env,
    )

    if ensure_tws_worker_env(events.sparkSession) is None:
        # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use expiring_counter (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ExpiringCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._agg = handle.getValueState("agg", RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            count, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                count += len(pdf)
                total += float(pdf["score"].sum())
            self._agg.update((count, total))
            # Re-arm: drop any earlier timer so exactly one is pending.
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )
            yield pd.DataFrame(
                {
                    "group_id": [key[0]],
                    "event_count": [count],
                    "cumulative_score": [total],
                    "expired": [False],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._agg.exists():  # already finalized
                return
            count, total = self._agg.get()
            self._agg.clear()
            yield pd.DataFrame(
                {
                    "group_id": [key[0]],
                    "event_count": [count],
                    "cumulative_score": [total],
                    "expired": [True],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("group_id").transformWithStateInPandas(
        ExpiringCounter(),
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


TYPE_COUNTS_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_id", StringType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-group per-type running counts on transformWithState MAP state —
    the fourth TWS state primitive (after value state, list state, and
    timers): a keyed sub-dictionary inside each group's state, which is
    how you keep SUB-KEY aggregates without widening the grouping key
    (state stays colocated per group; the alternative —
    groupBy(group_id, event_type) — multiplies shuffle keys and loses
    the per-group view).  Input needs ``group_id`` and ``event_type``;
    each batch increments MapState[event_type] for the types seen and
    emits the updated (group_id, event_type, n) rows.  The final
    emission per (group, type) equals the batch two-key groupBy count —
    pinned by ``test_tws_map_state_type_counts``.

    Same runtime requirements as the other TWS operators (protobuf via
    protobuf_compat, RocksDB state store)."""
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_tws_worker_env,
    )

    if ensure_tws_worker_env(events.sparkSession) is None:
        # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use groupBy(group_id, event_type).count() for the batch form"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_schema = StructType([StructField("event_type", StringType())])
    val_schema = StructType([StructField("n", LongType())])

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", key_schema, val_schema)

        def handleInputRows(self, key, rows, timerValues):
            batch_counts: dict[str, int] = {}
            for pdf in rows:
                for et, c in pdf["event_type"].value_counts().items():
                    batch_counts[et] = batch_counts.get(et, 0) + int(c)
            out_t, out_n = [], []
            for et, inc in sorted(batch_counts.items()):
                cur = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                cur += inc
                self._counts.updateValue((et,), (cur,))
                out_t.append(et)
                out_n.append(cur)
            yield pd.DataFrame(
                {
                    "group_id": [key[0]] * len(out_t),
                    "event_type": out_t,
                    "n": out_n,
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("group_id").transformWithStateInPandas(
        TypeCounts(),
        outputStructType=TYPE_COUNTS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_id", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_score", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def merge_sessions(
    sessions: list, events: list, gap_ms: int
) -> list[tuple]:
    """Pure per-key session algebra shared by :func:`session_finalize_tws`
    and its batch-equivalence property test: fold ``events`` (``(ts_ms,
    score)`` points, any order) into ``sessions`` (``(start_ms, last_ms,
    n, total)`` tuples) and return the merged, start-sorted session list.

    Semantics are exactly ``F.session_window``'s: two items belong to
    the same session iff the later one starts STRICTLY less than
    ``gap_ms`` after the earlier one ends (Spark's per-event window is
    ``[ts, ts + gap)``), so the result is independent of arrival order —
    a late point bridging two open sessions merges them into one."""
    items = [list(s) for s in sessions]
    items += [[ts, ts, 1, score] for ts, score in events]
    items.sort(key=lambda s: (s[0], s[1]))
    out: list[list] = []
    for s in items:
        if out and s[0] < out[-1][1] + gap_ms:
            cur = out[-1]
            cur[1] = max(cur[1], s[1])
            cur[2] += s[2]
            cur[3] += s[3]
        else:
            out.append(s)
    return [tuple(s) for s in out]


def split_finalized(
    sessions: list, watermark_ms: int, gap_ms: int
) -> tuple[list[tuple], list[tuple]]:
    """Partition a merged session list into ``(finalized, open)`` under
    ``watermark_ms``: a session whose ``last + gap`` the watermark has
    reached can NEVER grow again (any still-admissible event has
    ``ts >= watermark >= last + gap``, outside the strict-merge bound),
    so emitting it is safe and final; everything else stays open."""
    done = [tuple(s) for s in sessions if s[1] + gap_ms <= watermark_ms]
    keep = [tuple(s) for s in sessions if s[1] + gap_ms > watermark_ms]
    return done, keep


def session_finalize_tws(
    events: DataFrame,
    gap_ms: int = 5_000,
    watermark_delay: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """EVENT-TIME-timer sessionization on transformWithState
    (``timeMode="EventTime"``) — the watermark-driven timer mode, the one
    TWS time semantics processing-time timers (``expiring_counter_tws``)
    don't reach: a session is emitted EXACTLY ONCE, when the event-time
    watermark passes ``last_event + gap_ms``, never on a wall clock.
    That is the correct 100 TB session-finalization semantics — wall
    clocks on 1000 executors disagree; the watermark is the single
    consistent notion of "no more events can join this session".

    BATCH-EXACT: finalized sessions equal ``F.session_window`` over the
    watermark-admitted events regardless of arrival order (pinned by the
    ``test_session_tws_property`` sweep).  State per key is the full
    list of OPEN sessions (``getListState``), merged via the pure
    :func:`merge_sessions`; a session is emitted only once the watermark
    passes ``last + gap_ms`` (:func:`split_finalized`) — input-driven
    when a later batch's watermark has already passed it, else by the
    event-time timer armed at the earliest open ``last + gap_ms``.
    Keeping EVERY open session (not just the newest) is what makes late,
    admitted events exact: one may open a session BEFORE the newest, or
    bridge two open sessions into one, and early emission would have
    made those merges impossible.  Note the availableNow caveat shared
    with every event-time operator: sessions whose finalize point the
    final watermark never passes remain open in state (exactly like
    unemitted append-mode windows) — they finalize on the next run over
    the same checkpoint.

    Input needs ``group_id``, ``score``, and an event-time ``ts_col``;
    the operator applies ``withWatermark(ts_col, watermark_delay)``
    itself.  Same runtime requirements as the other TWS operators.

    Scale shape: state is O(open sessions) per key — bounded by event
    spread inside the watermark horizon, not by history — and exactly
    one registered timer per key."""
    from kafka_streaming_spark.streaming.protobuf_compat import (
        ensure_tws_worker_env,
    )

    if ensure_tws_worker_env(events.sparkSession) is None:
        # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use t_session_window (F.session_window) for the batch form"
        )
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionFinalize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sessions = handle.getListState(
                "sessions", SESSION_STATE_SCHEMA
            )

        def _emit(self, group_id, done):
            return pd.DataFrame(
                {
                    "group_id": [group_id] * len(done),
                    "session_start_ms": [s[0] for s in done],
                    "session_end_ms": [s[1] for s in done],
                    "n_events": [s[2] for s in done],
                    "total_score": [s[3] for s in done],
                }
            )

        def _store(self, keep) -> None:
            """Persist open sessions and re-arm the single timer at the
            earliest possible finalize point."""
            self._sessions.clear()
            if keep:
                self._sessions.put([tuple(s) for s in keep])
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if keep:
                self._handle.registerTimer(
                    min(s[1] for s in keep) + gap_ms
                )

        def handleInputRows(self, key, rows, timerValues):
            batch = []
            for pdf in rows:
                batch.extend(
                    zip(
                        (int(t) for t in pdf["ts_ms"]),
                        (float(s) for s in pdf["score"]),
                    )
                )
            open_ = [
                (int(s[0]), int(s[1]), int(s[2]), float(s[3]))
                for s in self._sessions.get()
            ]
            merged = merge_sessions(open_, batch, gap_ms)
            done, keep = split_finalized(
                merged, timerValues.getCurrentWatermarkInMs(), gap_ms
            )
            self._store(keep)
            if done:
                yield self._emit(key[0], done)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            open_ = [
                (int(s[0]), int(s[1]), int(s[2]), float(s[3]))
                for s in self._sessions.get()
            ]
            if not open_:
                return
            # A fired timer proves the eviction watermark reached its
            # expiry even when getCurrentWatermarkInMs reports the
            # (one-batch-lagging) late-filter watermark — take the max
            # so the emit is never deferred a batch for nothing.
            wm = max(
                timerValues.getCurrentWatermarkInMs(),
                expiredTimerInfo.getExpiryTimeInMs(),
            )
            done, keep = split_finalized(open_, wm, gap_ms)
            self._store(keep)
            if done:
                yield self._emit(key[0], done)

        def close(self) -> None:
            pass

    prepared = (
        events.withWatermark(ts_col, watermark_delay)
        .withColumn("ts_ms", F.unix_millis(F.col(ts_col)))
    )
    return prepared.groupBy("group_id").transformWithStateInPandas(
        SessionFinalize(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )
