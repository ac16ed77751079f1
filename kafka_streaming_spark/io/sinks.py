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
    <root>/cdf/                flat change-feed dir; every file is named
                               ``v<version>_<change_type>_<orig>.parquet``

Change-feed metadata (``_change_type``, ``_commit_version``) is **derived
from the file name at read time** (``attach_cdf_metadata``) instead of being
written into the rows: insert commits just hard-link the committed data
files into ``cdf/`` — zero extra write amplification per micro-batch, the
same trick Delta plays by logging file-level actions rather than row-level
copies.

CDF coverage vs Delta: upsert commits emit ``update_preimage`` (the changed
keys' previous rows) AND ``update_postimage``; first-time commits emit
``insert``.  ``delete`` never occurs (neither table deletes rows — same as
the reference's workload); the delete routing filters are exercised against
synthetic delete rows in tests.
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

#: Regexes over the cdf file name (see module docstring).
_VERSION_RE = r"/v(\d+)_"
_CTYPE_RE = r"/v\d+_(insert|update_preimage|update_postimage|delete)_"


def attach_cdf_metadata(df: DataFrame) -> DataFrame:
    """Derive ``_change_type`` / ``_commit_version`` from the cdf file path.
    Works on batch and streaming scans alike (``input_file_name`` is set for
    both)."""
    fname = F.input_file_name()
    return df.withColumn(
        "_change_type", F.regexp_extract(fname, _CTYPE_RE, 1)
    ).withColumn("_commit_version", F.regexp_extract(fname, _VERSION_RE, 1).cast("long"))


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

    @property
    def cdf_dir(self) -> str:
        return f"{self.root}/cdf"

    def _versions(self) -> list[int]:
        """Finalized state versions only: a dir without Spark's ``_SUCCESS``
        marker is a crashed half-write and must be invisible to readers (and
        to the replay guard, so the retry rewrites it)."""
        d = f"{self.root}/data"
        return sorted(
            int(name.split("_")[1])
            for name in os.listdir(d)
            if name.startswith("v_") and os.path.exists(f"{d}/{name}/_SUCCESS")
        )

    def version_applied(self, version: int) -> bool:
        """True when commit ``version`` fully ran (state finalized AND its
        change-feed files registered).  foreachBatch replays re-run with the
        same batch_id after a crash between the table commit and the
        checkpoint commit — callers use this to no-op instead of folding the
        same micro-batch into running state twice.

        The commit-final marker is the insert/update_postimage file set:
        preimages are staged FIRST, so their presence alone means the
        commit was interrupted and must be redone."""
        if not os.path.exists(f"{self.root}/data/v_{version}/_SUCCESS"):
            return False
        final = (f"v{version}_insert_", f"v{version}_update_postimage_")
        return any(f.startswith(final) for f in os.listdir(self.cdf_dir))

    @property
    def latest_version(self) -> int | None:
        vs = self._versions()
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

    def read_cdf(
        self, starting_version: int = 0, change_types: Sequence[str] | None = None
    ) -> DataFrame:
        """S2/S3: change rows since ``starting_version`` with ``_change_type``
        and ``_commit_version`` metadata (T4 routing via ``change_types``)."""
        if not any(f.endswith(".parquet") for f in os.listdir(self.cdf_dir)):
            return attach_cdf_metadata(self._empty())
        df = attach_cdf_metadata(self.spark.read.schema(self.schema).parquet(self.cdf_dir))
        df = df.filter(F.col("_commit_version") >= starting_version)
        if change_types:
            df = df.filter(F.col("_change_type").isin(list(change_types)))
        return df

    # -- writes -----------------------------------------------------------

    def _link_to_cdf(self, files: list[str], change_type: str, version: int) -> None:
        """Register committed files in the change feed via hard links (copy
        fallback) — no row rewrite, file-action-level logging like Delta."""
        for path in files:
            dst = f"{self.cdf_dir}/v{version}_{change_type}_{os.path.basename(path)}"
            try:
                os.link(path, dst)
            except OSError:
                shutil.copy2(path, dst)

    def insert_if_absent(
        self,
        batch: DataFrame,
        version: int,
        prune_col: str | None = None,
        batch_unique: bool = False,
    ) -> None:
        """J1: append the batch rows whose key is not present yet.

        ``prune_col`` applies the IN-list/semi-join prune (F3) to the
        existing-keys probe — at scale the anti-join reads only the target
        buckets the batch touches.  ``prune_col`` must be part of ``keys``
        (it is the reference's ``minute_timestamp``, part of the MERGE key).

        ``batch_unique=True`` skips the within-batch dropDuplicates — one
        full shuffle of every micro-batch — for callers whose upstream
        already guarantees key uniqueness (the medallion pipeline's
        dropDuplicatesWithinWatermark does exactly this; replayed/cross-
        batch duplicates are still caught by the anti-join).
        """
        current = self.read().select(*self.keys)
        if prune_col is not None:
            current = prune_in_list(current, batch, prune_col)
        deduped = batch if batch_unique else batch.dropDuplicates(self.keys)
        fresh = (
            deduped.join(current, on=self.keys, how="left_anti")
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
        for name in sorted(os.listdir(stage)):
            if name.endswith(".parquet"):
                dst = f"{append_dir}/v{version}_{name}"
                os.rename(f"{stage}/{name}", dst)
                committed.append(dst)
        shutil.rmtree(stage, ignore_errors=True)
        self._link_to_cdf(committed, "insert", version)

    def upsert_state(self, new_state: DataFrame, changed_keys: DataFrame, version: int) -> bool:
        """J2: commit a new full state (versioned dir) and log the changed
        keys' post-image rows to the change feed.

        Idempotent under micro-batch replay (same ``version`` re-offered
        after a crash): a fully applied version is a no-op (returns False);
        a version whose state landed but whose change-feed registration was
        interrupted redoes only the cdf step from the committed state."""
        if self.version_applied(version):
            return False
        state_dir = f"{self.root}/data/v_{version}"
        prior_versions = [v for v in self._versions() if v < version]
        if not os.path.exists(f"{state_dir}/_SUCCESS"):
            shutil.rmtree(state_dir, ignore_errors=True)  # crashed half-write
            new_state.write.mode("overwrite").parquet(state_dir)
        committed = self.spark.read.schema(self.schema).parquet(f"{self.root}/data/v_{version}")
        keyset = changed_keys.dropDuplicates(self.keys)
        cols = [f.name for f in self.schema.fields]
        if prior_versions:
            # Delta-faithful CDF: changed keys that existed before also emit
            # their PREVIOUS row as an update_preimage — downstream T4
            # routing filters (gold.py:57 / tomongo.py:26 shapes) run
            # against real preimage rows, not just inserts.  Both state
            # reads are first PRUNED to the changed keys (IN-list when the
            # keyset is tiny, semi-join fallback — F3): at scale a commit
            # touching k of N keys reads ~k rows of prior state via
            # row-group skipping, not the whole table.
            key0 = self.keys[0]
            prior = prune_in_list(
                self.spark.read.schema(self.schema).parquet(
                    f"{self.root}/data/v_{prior_versions[-1]}"
                ),
                keyset,
                key0,
            )
            post_src = prune_in_list(committed, keyset, key0)
            if len(self.keys) > 1:
                prior = prior.join(keyset, self.keys, "left_semi")
                post_src = post_src.join(keyset, self.keys, "left_semi")
            pre = prior.select(F.lit("update_preimage").alias("__ctype"), *cols)
            post = post_src.select(F.lit("update_postimage").alias("__ctype"), *cols)
            rows = pre.unionByName(post)
            ctypes = ["update_preimage", "update_postimage"]
        else:
            # First commit: every committed row is new BY CONSTRUCTION (the
            # caller's changed_keys covers the whole initial state), so the
            # semi-join is a no-op — skip its job entirely.
            rows = committed.select(F.lit("insert").alias("__ctype"), *cols)
            ctypes = ["insert"]
        # ONE Spark job stages every change row, partitioned by change type
        # (pre+postimage previously cost a write job each — per-micro-batch
        # job count matters more than anything else for streaming
        # throughput).  Rename order preserves the crash protocol: preimages
        # land in cdf/ FIRST, and the postimage/insert files remain the
        # commit-final marker (see version_applied), so an interrupted
        # commit redoes both.
        stage = f"{self.root}/stage/cdf_{version}"
        rows.write.mode("overwrite").partitionBy("__ctype").parquet(stage)
        for ctype in ctypes:
            prefix = f"v{version}_{ctype}_"
            for name in os.listdir(self.cdf_dir):
                if name.startswith(prefix):
                    os.remove(f"{self.cdf_dir}/{name}")
            part_dir = f"{stage}/__ctype={ctype}"
            if os.path.isdir(part_dir):
                for name in sorted(os.listdir(part_dir)):
                    if name.endswith(".parquet"):
                        os.rename(f"{part_dir}/{name}", f"{self.cdf_dir}/{prefix}{name}")
        shutil.rmtree(stage, ignore_errors=True)
        return True

    def vacuum(self, keep_last: int = 2) -> None:
        """D3: drop all but the newest ``keep_last`` state versions."""
        for v in self._versions()[:-keep_last]:
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
