"""Pluggable serving sinks (SURVEY.md §2.2 K3, reference tomongo.py:6-17).

The reference's serving stage is a ``foreachBatch`` body that stamps
``_id = group_id`` and appends to MongoDB (documents replaced by ``_id`` →
effective upsert).  The engine generalizes that into a writer interface so
the same pipeline stage can target parquet (broker-free tests), MongoDB
(the reference's deployment, import-gated on the mongo-spark connector), or
any future key-value store.

Contract: ``write(df, batch_id)`` receives the batch WITH the ``_id`` column
already stamped; writers append — last-writer-wins per ``_id`` is resolved
at read time (J3) or by the store itself (Mongo ``_id`` replacement).
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame


class ServingWriter(Protocol):
    """K3 sink interface: one call per micro-batch."""

    def write(self, df: DataFrame, batch_id: int) -> None: ...


class ParquetServingWriter:
    """Append-to-directory serving store (the broker/DB-free stand-in);
    pair with ``ops.dedup.latest_per_key`` on ``_id`` at read time."""

    def __init__(self, path: str):
        self.path = path

    def write(self, df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(self.path)


class MongoServingWriter:
    """The reference's sink (tomongo.py:12-16): mongo-spark connector
    append with ``_id``-keyed document replacement.  Option bundle mirrors
    reference config.py:62-77.  Requires the ``mongo-spark-connector``
    package on the session's classpath — probed at write time with a clear
    error, never at import time."""

    def __init__(self, uri: str, database: str, collection: str):
        self.uri = uri
        self.database = database
        self.collection = collection

    def options(self) -> dict[str, str]:
        return {
            "connection.uri": self.uri,
            "database": self.database,
            "collection": self.collection,
        }

    def write(self, df: DataFrame, batch_id: int) -> None:
        writer = df.write.format("mongodb").mode("append")
        for k, v in self.options().items():
            writer = writer.option(k, v)
        try:
            writer.save()
        except Exception as exc:  # pragma: no cover - needs connector+server
            raise RuntimeError(
                "MongoServingWriter needs the mongo-spark-connector package "
                "(org.mongodb.spark:mongo-spark-connector_2.13) on the Spark "
                "classpath and a reachable MongoDB at "
                f"{self.uri!r}: {exc}"
            ) from exc
