"""Deterministic event generator — Python parity port of the reference's
seeded Rust daemon (SURVEY.md §2.1 S6, §5 item 4).

Distribution semantics from ``kafka-api-gateway/src/bin/publish_daemon.rs``:

- per-worker RNG seeded ``seed + worker_index`` (``:81``);
- ``group_id`` fixed per worker, a UUID derived deterministically from the
  worker's seed (``:86-89,164-171``) — stream key cardinality == concurrency;
- ``id`` a fresh UUIDv4 per event (``:110``) — here drawn from the seeded
  RNG so runs are reproducible end-to-end;
- ``score`` uniform float in [0, 1) (``:111-112``);
- ``event_timestamp`` wall-clock millis at generation (``:117``) — here a
  deterministic monotone clock per worker (``start_ms + i * period``).

On top of the faithful distribution, the generator injects the adversarial
variants the streaming tests need (FIXTURES.md F1): exact duplicates within
and beyond the watermark window, and late events.
"""

from __future__ import annotations

import random
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_spark.schemas import EVENT_SCHEMA


def _seeded_uuid(rng: random.Random) -> str:
    """UUIDv4-shaped identifier drawn from a seeded RNG (deterministic
    stand-in for ``Uuid::new_v4()``; the reference seeds its group UUIDs the
    same way, publish_daemon.rs:164-171)."""
    return str(uuid.UUID(int=rng.getrandbits(128), version=4))


@dataclass
class EventGenerator:
    """Deterministic multi-worker event stream.

    ``duplicate_every=n`` re-emits every n-th event with the same ``id``
    immediately (within-watermark duplicate); ``late_every=n`` re-emits it
    ``late_by_ms`` later in the stream (beyond-watermark duplicate when
    ``late_by_ms`` exceeds the watermark delay).
    """

    seed: int = 42
    workers: int = 4
    start_ms: int = 1_700_000_000_000
    period_ms: int = 50  # per-worker inter-event gap (20 events/s, --rate=20)
    duplicate_every: int | None = None
    late_every: int | None = None
    late_by_ms: int = 120_000
    _rngs: list[random.Random] = field(init=False, repr=False, default_factory=list)

    def rows(self, events_per_worker: int) -> list[tuple[str, str, float, int]]:
        """(id, group_id, score, event_timestamp) tuples, interleaved across
        workers in timestamp order — the merge order a Kafka consumer group
        would observe."""
        # Stream position is determined by ARRIVAL time, which for on-time
        # rows equals the event time and for late replays is
        # ``ts + late_by_ms`` while the row keeps its ORIGINAL
        # event_timestamp (arrival skew, FIXTURES.md F1).  A single stable
        # sort on the arrival key interleaves workers, keeps immediate
        # duplicates adjacent to their originals, and genuinely places late
        # replays beyond the watermark frontier — sorting the rows by event
        # time instead would put each replay right next to its original and
        # never exercise the late-arrival path.
        arrivals: list[tuple[int, tuple[str, str, float, int]]] = []
        for w in range(self.workers):
            rng = random.Random(self.seed + w)
            group_id = _seeded_uuid(rng)
            for i in range(events_per_worker):
                ts = self.start_ms + i * self.period_ms
                row = (_seeded_uuid(rng), group_id, rng.random(), ts)
                arrivals.append((ts, row))
                n = w * events_per_worker + i + 1
                if self.duplicate_every and n % self.duplicate_every == 0:
                    arrivals.append((ts, row))  # exact dup, same arrival
                if self.late_every and n % self.late_every == 0:
                    arrivals.append((ts + self.late_by_ms, row))
        arrivals.sort(key=lambda p: p[0])
        return [row for _, row in arrivals]

    def dataframe(self, spark: SparkSession, events_per_worker: int) -> DataFrame:
        return spark.createDataFrame(self.rows(events_per_worker), schema=EVENT_SCHEMA)
