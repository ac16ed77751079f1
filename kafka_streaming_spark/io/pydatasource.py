"""Custom source via the Spark 4 Python Data Source API — the LAST
source-format surface the engine lacked: when the feed a pipeline needs
(an internal REST cursor, a proprietary archive format, a synthetic
load generator) has no built-in connector, Spark 4 lets you define the
source IN PYTHON with partition-parallel readers, batch and streaming,
and the plan still shows a plain ``BatchScan``/micro-batch scan that
downstream Catalyst optimizes normally.

The concrete source here is the engine's deterministic event generator
(the same closed-form shape as ``io/generator.py`` and the reference's
seeded daemon — publish_daemon.rs:78-147: fixed group per worker id,
uniform score, monotone timestamps) so every read is reproducible and
DuckDB can recompute it analytically:

    row i:  event_id  = i
            group_id  = 'w' || (i % n_groups)
            score_fp  = (i * 2654435761) % 2^32      (Knuth hash step)
            score     = score_fp / 2^32              (exact double)
            event_timestamp = base_ms + i * step_ms

``score`` is an exact double (score_fp < 2^53, division by a power of
two), so ``score * 2^32`` round-trips to the integer form in any
engine — the witness sums THAT as a bigint (order-independent).

Batch:      spark.read.format("deterministic_events")
                 .option("rows", N).option("partitions", P).load()
Streaming:  spark.readStream.format("deterministic_events")
                 .option("rows", N).option("batch_rows", B).load()
            — a micro-batch stream over the same closed form:
            ``latestOffset`` advances ``batch_rows`` per poll and
            SATURATES at ``rows``.  Under ``processingTime`` the stream
            paces through the cap in B-row batches and then goes idle;
            an ``availableNow`` drain snapshots the first poll, i.e.
            exactly one B-row batch (measured — the Python stream API
            exposes no admission control, so availableNow cannot
            re-poll).  The full-drain equality with the batch table is
            pinned by ``test_pydatasource_stream_matches_batch`` using
            a live trigger.

Scale shape: ``partitions()`` drives task parallelism — each partition
computes its own closed-form slice with zero driver involvement and no
shuffle; at 100 TB the same template wraps any record-oriented feed
with per-partition cursors.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_KNUTH = 2654435761
_TWO32 = 4294967296


def _row(i: int, n_groups: int, base_ms: int, step_ms: int):
    return (
        i,
        f"w{i % n_groups}",
        ((i * _KNUTH) % _TWO32) / _TWO32,
        base_ms + i * step_ms,
    )


class _Opts:
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.partitions = int(options.get("partitions", 4))
        self.n_groups = int(options.get("n_groups", 8))
        self.base_ms = int(options.get("base_ms", 1_700_000_000_000))
        self.step_ms = int(options.get("step_ms", 250))
        self.batch_rows = int(options.get("batch_rows", 1_000))


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.o = _Opts(options)

    def partitions(self):
        return [InputPartition(p) for p in range(self.o.partitions)]

    def read(self, partition):
        o, p = self.o, partition.value
        per = o.rows // o.partitions
        lo = p * per
        hi = o.rows if p == o.partitions - 1 else lo + per
        for i in range(lo, hi):
            yield _row(i, o.n_groups, o.base_ms, o.step_ms)


class _StreamReader(DataSourceStreamReader):
    """Micro-batch stream over the closed form: offset = next row index.
    ``latestOffset`` advances ``batch_rows`` per call and saturates at
    ``rows``, so drains terminate.  Restart-safety needs one rule on top
    of the deterministic row mapping: the pacing cursor starts at 0 in
    every NEW reader instance, so after a checkpoint restart a naive
    ``latestOffset`` would return offsets BEHIND the committed start and
    re-emit rows already written (duplicates in append sinks).  The
    engine replays the committed offsets through ``partitions(start,
    end)`` / ``commit(end)`` before polling again, so both fast-forward
    the cursor (monotone ``max``) and offsets never regress — pinned by
    ``test_pydatasource_restart_no_duplicates``."""

    def __init__(self, options):
        self.o = _Opts(options)
        self._current = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._current = min(self._current + self.o.batch_rows, self.o.rows)
        return {"index": self._current}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        # Restart fast-forward: the pacing cursor restarts at 0 in every
        # new reader instance, but before the first post-restart poll
        # the engine ALWAYS replays the offset-log frontier through this
        # method — as ``partitions(end_n, end_n)`` when batch n was
        # committed, or ``partitions(start_n, end_n)`` when batch n must
        # re-run (measured, .tmp/pyds_trace2.log) — so catching the
        # cursor up to max(start, end) here guarantees ``latestOffset``
        # never returns an offset behind the checkpoint (which would
        # make the engine commit a regressed end and re-emit committed
        # rows as duplicates).  No range clamping: every (lo, hi) the
        # engine plans must be emitted verbatim — the replayed range is
        # deduplicated by the SINK's batch-id log, not by the source.
        self._current = max(self._current, lo, hi)
        if hi <= lo:
            return [InputPartition((lo, lo))]
        n = self.o.partitions
        per = max(1, (hi - lo) // n)
        bounds = list(range(lo, hi, per))[:n] + [hi]
        return [
            InputPartition((bounds[i], bounds[i + 1]))
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition):
        lo, hi = partition.value
        o = self.o
        for i in range(lo, hi):
            yield _row(i, o.n_groups, o.base_ms, o.step_ms)

    def commit(self, end):
        # restart fast-forward (see class docstring): a replayed commit
        # of the checkpointed end offset must advance the pacing cursor
        self._current = max(self._current, end["index"])


class DeterministicEventsDataSource(DataSource):
    """``format("deterministic_events")`` — see module docstring."""

    @classmethod
    def name(cls):
        return "deterministic_events"

    def schema(self):
        return (
            "event_id bigint, group_id string, "
            "score double, event_timestamp bigint"
        )

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register_deterministic_events(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(DeterministicEventsDataSource)
