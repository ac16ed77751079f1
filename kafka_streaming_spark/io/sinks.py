"""Sinks (SURVEY.md §2.2): foreachBatch writers and a parquet-backed
change-tracked table that emulates the Delta surface the reference relies on
(MERGE targets + Change Data Feed) when delta-spark is not installed.

The emulation is **single-writer micro-batch** semantics — exactly the
reference's usage (one streaming query owns each table; foreachBatch bodies
are serial per query).  With delta-spark present, ``delta_utils`` provides
the real ACID implementation behind the same method names.

Layout::

    <root>/data/v_<version>/   full state  (upsert tables: one dir per commit)
    <root>/data/append/        append-only data files (insert-only tables)
    <root>/cdf/v_<version>/    change rows for that commit (+ _change_type)

CDF deviation from Delta (documented): the emulation emits ``insert`` and
``update_postimage`` rows only — the reference's downstream consumers filter
*out* preimages/deletes anyway (gold.py:57, tomongo.py:26), so the consuming
semantics are identical.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kafka_streaming_spark.ops.dedup import prune_in_list


class ParquetUpsertTable:
    """A change-tracked table on plain parquet.

    Two write modes:

    - ``insert_if_absent`` (silver pattern, J1): append-only; new rows are
      the rows whose key is absent from current data (anti-join with bucket
      pruning, silver.py:22-40);
    - ``upsert_state`` (gold pattern, J2): versioned full-state commit; the
      caller computes the new state (e.g. via ``combine_states``) and the
      changed keys' rows are logged to the change feed.
    """

    def __init__(self, spark: SparkSession, root: str, schema: StructType, keys: Sequence[str]):
        self.spark = spark
        self.root = root.rstrip("/")
        self.schema = schema
        self.keys = list(keys)
        os.makedirs(f"{self.root}/data", exist_ok=True)
        os.makedirs(f"{self.root}/cdf", exist_ok=True)
        meta = f"{self.root}/_table_meta.json"
        if not os.path.exists(meta):
            with open(meta, "w") as fh:
                json.dump({"keys": self.keys, "schema": schema.jsonValue()}, fh)

    # -- versions ---------------------------------------------------------

    def _versions(self, sub: str) -> list[int]:
        d = f"{self.root}/{sub}"
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name.split("_")[1]) for name in os.listdir(d) if name.startswith("v_")
        )

    @property
    def latest_version(self) -> int | None:
        vs = self._versions("data")
        return vs[-1] if vs else None

    # -- reads ------------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], self.schema)

    def read(self) -> DataFrame:
        """Current table state (S4 batch scan of the merge target)."""
        append_dir = f"{self.root}/data/append"
        if os.path.isdir(append_dir) and any(
            f.endswith(".parquet") for f in os.listdir(append_dir)
        ):
            return self.spark.read.schema(self.schema).parquet(append_dir)
        v = self.latest_version
        if v is None:
            return self._empty()
        return self.spark.read.schema(self.schema).parquet(f"{self.root}/data/v_{v}")

    def read_cdf(self, starting_version: int = 0, change_types: Sequence[str] | None = None) -> DataFrame:
        """S2/S3: change rows since ``starting_version`` with ``_change_type``
        and ``_commit_version`` metadata (T4 routing via ``change_types``)."""
        dirs = [f"{self.root}/cdf/v_{v}" for v in self._versions("cdf") if v >= starting_version]
        if not dirs:
            return self._empty().withColumn("_change_type", F.lit("")).withColumn(
                "_commit_version", F.lit(0).cast("long")
            )
        df = self.spark.read.parquet(*dirs)
        if change_types:
            df = df.filter(F.col("_change_type").isin(list(change_types)))
        return df

    # -- writes -----------------------------------------------------------

    def _log_cdf(self, df: DataFrame, change_type: str, version: int) -> None:
        (
            df.withColumn("_change_type", F.lit(change_type))
            .withColumn("_commit_version", F.lit(version).cast("long"))
            .write.mode("overwrite")
            .parquet(f"{self.root}/cdf/v_{version}")
        )

    def insert_if_absent(
        self, batch: DataFrame, version: int, prune_col: str | None = None
    ) -> None:
        """J1: append the batch rows whose key is not present yet.

        ``prune_col`` applies the IN-list/semi-join prune (F3) to the
        existing-keys probe — at scale the anti-join reads only the target
        buckets the batch touches.  ``prune_col`` must be part of ``keys``
        (it is the reference's ``minute_timestamp``, part of the MERGE key).
        """
        current = self.read().select(*self.keys)
        if prune_col is not None:
            current = prune_in_list(current, batch, prune_col)
        fresh = (
            batch.dropDuplicates(self.keys)
            .join(current, on=self.keys, how="left_anti")
            .select(*[f.name for f in self.schema.fields])
        )
        # Stage → rename: never write into a directory the plan is reading
        # (the staged write materializes the anti-join; the rename is the
        # commit, mirroring Delta's write-files-then-commit protocol).
        stage = f"{self.root}/stage/{version}"
        fresh.write.mode("overwrite").parquet(stage)
        append_dir = f"{self.root}/data/append"
        os.makedirs(append_dir, exist_ok=True)
        committed: list[str] = []
        for name in os.listdir(stage):
            if name.endswith(".parquet"):
                os.rename(f"{stage}/{name}", f"{append_dir}/v{version}_{name}")
                committed.append(f"{append_dir}/v{version}_{name}")
        shutil.rmtree(stage, ignore_errors=True)
        inserted = (
            self.spark.read.schema(self.schema).parquet(*committed)
            if committed
            else self._empty()
        )
        self._log_cdf(inserted, "insert", version)

    def upsert_state(self, new_state: DataFrame, changed_keys: DataFrame, version: int) -> None:
        """J2: commit a new full state (versioned dir) and log the changed
        keys' post-image rows to the change feed."""
        had_prior = self.latest_version is not None
        new_state.write.mode("overwrite").parquet(f"{self.root}/data/v_{version}")
        committed = self.spark.read.schema(self.schema).parquet(f"{self.root}/data/v_{version}")
        changes = committed.join(changed_keys.dropDuplicates(self.keys), self.keys, "left_semi")
        self._log_cdf(changes, "update_postimage" if had_prior else "insert", version)

    def vacuum(self, keep_last: int = 2) -> None:
        """D3: drop all but the newest ``keep_last`` state versions."""
        for v in self._versions("data")[:-keep_last]:
            shutil.rmtree(f"{self.root}/data/v_{v}", ignore_errors=True)


def start_foreach_batch(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    query_name: str,
    available_now: bool = False,
    processing_time: str = "0 seconds",
):
    """K1/K2/K3 writer shape: ``foreachBatch`` + checkpoint + trigger
    (silver.py:69-77, gold.py:61-69, tomongo.py:30-35).  ``available_now``
    runs the backlog to completion and stops — the finite-test trigger."""
    writer = (
        df.writeStream.foreachBatch(fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
