"""round-8/9 registrations (arrow, soak, TTL, TWS, binaryFile, observe) — split from the monolithic queries.py (round 9,
VERDICT r8 ask #7).  Mechanical move: query bodies are verbatim;
registration order is preserved by the import order in
``kafka_streaming_spark/queries/__init__.py``, so ``REGISTRY`` /
``DRIVER_PRIORITY`` iteration is unchanged."""

from kafka_streaming_spark.queries._core import *  # noqa: F401,F403
from kafka_streaming_spark.queries._core import (  # noqa: F401
    _bucket_ms,
    _drain_live_sink,
    _fixed,
    _round_fixed,
    _tiny_stream_conf,
    _tws_stream_conf,
)

# =========================================================================
# ROUND-8 REGISTRATIONS — the freeze lifted per its own terms (never-checked
# 44 < 50 after r7).  The three surfaces built and pytest-green in r7 are
# registered here with oracles (VERDICT r7 ask #2), plus one genuine
# source-format gap found during the round (f_binaryfile_scan, below);
# all six queue for the r9 driver window (x_observed_metrics and
# f_binaryfile_scan are the two genuine-gap additions: DQ observability
# and raw-asset ingest).
# =========================================================================


@register(
    "x_arrow_grouped_stats",
    """
    SELECT l_suppkey,
           COUNT(l_quantity) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS total,
           CAST(MIN(l_quantity) AS DOUBLE) AS vmin,
           CAST(MAX(l_quantity) AS DOUBLE) AS vmax,
           CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS mean
    FROM lineitem GROUP BY l_suppkey
    """,
)
def x_arrow_grouped_stats(spark: SparkSession, sf: str) -> DataFrame:
    """ARROW-NATIVE grouped map (``applyInArrow``): per-supplier
    (count, sum, min, max, mean) over line-item quantities computed as
    ``pyarrow.compute`` kernels directly on the Arrow group table — zero
    pandas materialization on either edge of the batch (the pandas
    variant pays Arrow→pandas→Arrow on both).  The built-in
    ``groupBy().agg`` is what production code should use for THIS
    reduction (partial aggregation, no Python); this witness pins the
    template for grouped kernels built-ins can't express (per-group
    sketches over binary payloads, tokenizer-library passes).  Scale
    shape: identical to the pandas grouped-map path — exactly one
    Exchange on the group key, Python touched once per group batch.
    Determinism: l_quantity is integral (TPC-H 1..50), so the float64
    sums are exact at any accumulation order and the mean is one IEEE
    division on both engines."""
    from kafka_streaming_spark.functions.arrowops import grouped_stats_arrow

    li = load_table(spark, sf, "lineitem").select(
        "l_suppkey", F.col("l_quantity").cast("double").alias("qty")
    )
    return grouped_stats_arrow(li, "l_suppkey", "qty")


@register(
    "x_arrow_token_stats",
    """
    WITH t AS (
      SELECT doc_id, COALESCE(text, '') AS txt FROM documents
    ), tr AS (
      SELECT doc_id, txt,
             trim(txt, chr(9)||chr(10)||chr(11)||chr(12)||chr(13)||' ')
               AS trimmed
      FROM t
    )
    SELECT doc_id,
           CAST(length(txt) AS INT) AS char_len,
           CAST(CASE WHEN length(trimmed) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trimmed, '[\\t-\\r ]+'))
                END AS BIGINT) AS token_count
    FROM tr
    """,
)
def x_arrow_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """ARROW-NATIVE batch map (``mapInArrow``): per-document UTF-8 char
    length and whitespace-token count computed with Arrow compute kernels
    on the raw RecordBatches — the narrow (shuffle-free) sibling of
    ``x_arrow_grouped_stats`` and the template for Arrow-only tokenizer
    libraries on the 100 TB hot path.  The token definition is pinned
    bit-identical across three engines (Java ``\\s`` ≡ RE2 ``[\\t-\\r ]``
    spelled out ≡ DuckDB's RE2 — see ``functions/arrowops.py`` for the
    NBSP / vertical-tab traps the hypothesis suite guards)."""
    from kafka_streaming_spark.functions.arrowops import token_stats_arrow

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return token_stats_arrow(docs, "doc_id", "text")


@register(
    "t_stream_rate_soak",
    """
    WITH src AS (
      SELECT range AS value,
             1700000000000 + 1000 * (range // 512) AS ts_ms
      FROM range(0, 3072)
    )
    SELECT CAST(value // 512 AS BIGINT) AS batch_id,
           COUNT(*) AS n_rows,
           CAST(SUM(value) AS BIGINT) AS value_sum,
           MIN(ts_ms) AS ts_ms,
           COUNT(DISTINCT ts_ms) AS n_stamps
    FROM src GROUP BY 1
    """,
)
def t_stream_rate_soak(spark: SparkSession, sf: str) -> DataFrame:
    """DETERMINISTIC rate-source soak witness: a LIVE ``processingTime``
    stream over the ``rate-micro-batch`` source (exactly R rows per
    trigger, batch k = values [k·R, (k+1)·R) with one fixed timestamp
    ``start + k·1000ms`` — independent of wall clock), drained into a
    memory sink until the first K=6 batches have committed, then stopped.
    Because the input is closed-form, the per-batch row counts, value
    sums, and the one-stamp-per-batch invariant are oracle-checkable as
    pure DuckDB ``range()`` arithmetic — the reproducible stand-in for
    the wall-clock load soak (``streaming/soak.py``; sustained-load
    numbers live in SCALE.md — this witness checks DETERMINISM, the soak
    measures THROUGHPUT; reference deployment shape:
    stream-processor/main.py + publish_daemon.rs).  Rows from batches ≥ K
    that commit before the stop are filtered out by the closed-form
    bound, so the result is identical however long the stop takes.
    One fresh-sink retry on a poll-deadline miss (VERDICT r8 note #1);
    the K-row aggregate is materialized and the memory sink dropped
    before returning (ADVICE r8 — no temp-view retention)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streaming_spark.io.sources import rate_micro_batch_stream

    R, K = 512, 6
    stream = rate_micro_batch_stream(
        spark, R, num_partitions=4, start_timestamp_ms=1_700_000_000_000
    )
    with _tiny_stream_conf(spark):
        sink = _drain_live_sink(
            spark,
            "t_stream_rate_soak",
            lambda name: (
                stream.select(
                    "value", F.unix_millis("timestamp").alias("ts_ms")
                )
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            ),
            # Batch K's first row proves batches 0..K-1 committed fully
            # (memory-sink batches commit atomically, in order).
            lambda t: t.filter(F.col("value") >= R * K).limit(1).count() > 0,
        )
    rows = (
        spark.table(sink)
        .filter(F.col("value") < R * K)
        .groupBy(F.expr(f"CAST(value DIV {R} AS BIGINT)").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").cast("long").alias("value_sum"),
            F.min("ts_ms").alias("ts_ms"),
            F.countDistinct("ts_ms").alias("n_stamps"),
        )
        .collect()  # bounded: exactly K = 6 rows
    )
    spark.catalog.dropTempView(sink)
    schema = StructType(
        [
            StructField("batch_id", LongType()),
            StructField("n_rows", LongType()),
            StructField("value_sum", LongType()),
            StructField("ts_ms", LongType()),
            StructField("n_stamps", LongType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in rows], schema)


@register(
    "t_stream_ttl_counter",
    """
    SELECT CAST(user_id % 8 AS VARCHAR) AS group_id,
           COUNT(*) AS event_count,
           CAST(SUM(event_id % 1000) AS DOUBLE) AS cumulative_score
    FROM events GROUP BY 1
    """,
)
def t_stream_ttl_counter(spark: SparkSession, sf: str) -> DataFrame:
    """STATEFUL TTL witness (``applyInPandasWithState`` +
    ``ProcessingTimeTimeout``): every events row folds into a per-group
    running (count, sum) whose state carries a processing-time TTL; when
    a group goes idle past the TTL the state store invokes the operator
    with ``hasTimedOut`` and it emits ONE final ``expired = true`` row
    with the accumulated totals and removes the state — the
    idle-session-finalization / state-eviction pattern that keeps
    unbounded-key streams from growing state forever at 100 TB key
    cardinalities.  LIVE-TRIGGER-ONLY by construction: an armed
    processing-time timeout keeps the engine scheduling micro-batches, so
    ``availableNow`` drains never terminate (measured —
    ``streaming/stateful.py::expiring_counter`` docstring); this witness
    drives ``processingTime='0 seconds'``, polls the update-mode memory
    sink until every group has emitted its expiry row, then stops
    explicitly.  The expired rows ARE the full per-group aggregate
    (single-file source → single input batch → totals complete at
    expiry), so the oracle is the plain batch groupBy.  Determinism:
    scores are integral doubles (event_id % 1000), exact at any
    accumulation order."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_streaming_spark.streaming.stateful import expiring_counter

    ev = load_table(spark, sf, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_ttl_counter_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        staged = ev.select(
            (F.col("user_id") % 8).cast("string").alias("group_id"),
            (F.col("event_id") % 1000).cast("double").alias("score"),
        )
        staged.coalesce(1).write.parquet(f"{build}/p0")
        part = glob.glob(f"{build}/p0/*.parquet")[0]
        shutil.copy(part, f"{build}/src/f0.parquet")
        shutil.rmtree(f"{build}/p0")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    n_groups = (
        spark.read.parquet(src).select("group_id").distinct().count()
    )
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    with _tiny_stream_conf(spark):
        # One fresh-sink retry on a poll-deadline miss (VERDICT r8 note
        # #1): each attempt gets its own memory sink and (implicit)
        # checkpoint, and a second miss still fails loudly — partial
        # expiry would otherwise surface as a baffling row-count
        # mismatch in the driver compare.
        sink = _drain_live_sink(
            spark,
            "t_stream_ttl_counter",
            lambda name: (
                expiring_counter(stream, timeout_ms=500)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(processingTime="0 seconds")
                .start()
            ),
            lambda t: t.filter(F.col("expired")).count() >= n_groups,
            poll_sec=0.25,
        )
    rows = (
        spark.table(sink)
        .filter(F.col("expired"))
        .select("group_id", "event_count", "cumulative_score")
        .collect()  # bounded: one row per group (8 groups)
    )
    spark.catalog.dropTempView(sink)
    out_schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("event_count", LongType()),
            StructField("cumulative_score", DoubleType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in rows], out_schema)


@register(
    "f_binaryfile_scan",
    """
    SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.txt'
             AS filename,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 64 AND text IS NOT NULL
    """,
)
def f_binaryfile_scan(spark: SparkSession, sf: str) -> DataFrame:
    """RAW-ASSET ingest via the ``binaryFile`` source — the one scan
    format the source matrix was missing, and the canonical entry point
    for a multimodal corpus at 100 TB: image/audio/video dumps land as
    FILES, and ``binaryFile`` reads them partition-parallel as
    (path, modificationTime, length, content) rows with glob filtering
    (``pathGlobFilter``) and recursive directory walks, feeding the
    Arrow decode operators (``functions/multimodal.py``) without any
    driver-side file listing loop.  Witness: the first 64 documents'
    texts staged once as UTF-8 ``.txt`` files; the scan must recover
    every file's name, exact byte length, and content md5 — DuckDB
    reproduces all three analytically from the documents table
    (md5/octet_length over the same UTF-8 bytes), so a truncated,
    re-encoded, or dropped file breaks the hash.  Scale shape: listing
    and reading parallelize across executors; the 4 MB-per-row guard
    Spark applies to ``content`` is the right failure mode for stray
    oversized assets (fail loud, not OOM)."""
    import os
    import re
    import shutil
    import uuid

    d = load_table(spark, sf, "documents")
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/binaryfile_scan_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        rows = (
            d.filter((F.col("doc_id") < 64) & F.col("text").isNotNull())
            .select("doc_id", "text")
            .collect()  # bounded: ≤ 64 rows, staging only
        )
        for r in rows:
            name = f"doc_{int(r['doc_id']):05d}.txt"
            with open(os.path.join(build, "src", name), "wb") as fh:
                fh.write(r["text"].encode("utf-8"))
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(src)
    )
    return bf.select(
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "x_observed_metrics",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_props,
           MIN(epoch_ms(ts)) AS min_ts_ms,
           MAX(epoch_ms(ts)) AS max_ts_ms,
           CAST(SUM(event_id % 1000) AS BIGINT) AS id_checksum
    FROM events
    """,
)
def x_observed_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """DATA-QUALITY OBSERVABILITY via ``DataFrame.observe`` — the
    zero-extra-pass counter API every production pipeline wants at
    100 TB: named aggregate metrics (row counts, null counts, watermark
    min/max, integer checksums) are computed AS A SIDE EFFECT of the
    action the job already runs — no second scan, no ``.count()`` tax
    per metric — and surface through ``Observation.get`` (batch) or
    ``StreamingQueryProgress.observedMetrics`` (per micro-batch; pinned
    by ``test_streaming_observed_metrics``).  The witness attaches five
    metrics to an events scan, drives ONE action, and returns the
    observed values as a 1-row DataFrame; the oracle recomputes them as
    plain aggregates, so any metric the observation under- or
    over-counts breaks the hash.  Every metric is order-independent by
    construction (counts, min/max, and an exact integer checksum —
    never a float sum, whose accumulation order Spark does not pin)."""
    from pyspark.sql import Observation
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_props"),
        F.min(F.unix_millis("ts")).alias("min_ts_ms"),
        F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        F.sum(F.col("event_id") % 1000).cast("long").alias("id_checksum"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the one action
    got = obs.get
    schema = StructType(
        [
            StructField("n_rows", LongType()),
            StructField("n_null_props", LongType()),
            StructField("min_ts_ms", LongType()),
            StructField("max_ts_ms", LongType()),
            StructField("id_checksum", LongType()),
        ]
    )
    # On an empty table the observed aggregates come back as
    # n_rows=0 and None for sum/min/max — mirror the oracle's NULL row
    # instead of raising TypeError on int(None) (ADVICE r8).
    as_long = lambda v: None if v is None else int(v)  # noqa: E731
    return spark.createDataFrame(
        [
            (
                int(got["n_rows"]),
                as_long(got["n_null_props"]),
                as_long(got["min_ts_ms"]),
                as_long(got["max_ts_ms"]),
                as_long(got["id_checksum"]),
            )
        ],
        schema,
    )


@register(
    "t_stream_tws_counter",
    """
    SELECT CAST(user_id % 8 AS VARCHAR) AS group_id,
           COUNT(*) AS event_count,
           CAST(SUM(event_id % 1000) AS DOUBLE) AS cumulative_score
    FROM events GROUP BY 1
    """,
)
def t_stream_tws_counter(spark: SparkSession, sf: str) -> DataFrame:
    """TRANSFORMWITHSTATE witness (``transformWithStateInPandas`` —
    Spark 4.x's successor stateful API: typed value-state handles,
    composable state variables, timer hooks).  Gap closed (VERDICT r8
    ask #3): through round 8 this was the engine's only
    coded-but-never-executed runtime path, import-gated on a missing
    protobuf; ``streaming/protobuf_compat.py`` now locates the
    pure-Python runtime inside the public Google Cloud SDK and injects
    it into the TWS state-server workers, so the path EXECUTES here.
    The witness folds every events row into a per-group running
    (count, sum) via ``running_counter_tws`` — kept semantically
    identical to ``running_counter`` (applyInPandasWithState), with the
    two runtimes asserted equal row-for-row by
    ``test_tws_equiv_apply_in_pandas_with_state`` — and drains it with
    ``availableNow`` (TWS terminates under availableNow in
    ``timeMode="None"``; only armed processing-time timers prevent
    termination, see ``t_stream_ttl_counter``).  Requires the RocksDB
    state store (TWS state = multiple column families, which the
    HDFS-backed provider rejects) — ``_tws_stream_conf`` scopes that
    choice to the drain.  Oracle: the plain batch groupBy.
    Determinism: scores are integral doubles (event_id % 1000), exact
    at any accumulation order.  The per-group aggregate is materialized
    and the memory sink dropped before returning (no temp-view
    retention)."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_streaming_spark.streaming.stateful import running_counter_tws

    ev = load_table(spark, sf, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/t_stream_tws_counter_{slug}"
    src = f"{base}/src"
    if not os.path.isdir(src):  # deterministic content → safe to reuse
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        staged = ev.select(
            (F.col("user_id") % 8).cast("string").alias("group_id"),
            (F.col("event_id") % 1000).cast("double").alias("score"),
        )
        staged.coalesce(1).write.parquet(f"{build}/p0")
        part = glob.glob(f"{build}/p0/*.parquet")[0]
        shutil.copy(part, f"{build}/src/f0.parquet")
        shutil.rmtree(f"{build}/p0")
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/src", src)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    sink = f"t_stream_tws_counter_{uuid.uuid4().hex[:8]}"
    with _tws_stream_conf(spark):
        q = (
            running_counter_tws(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Update-mode sink holds one running row per group per batch; the
    # single staged file yields one batch, but take the final (max-count)
    # row per group anyway — counts are monotone, so the struct max is
    # the total whatever the batching.
    rows = (
        spark.table(sink)
        .groupBy("group_id")
        .agg(F.max(F.struct("event_count", "cumulative_score")).alias("f"))
        .select("group_id", "f.event_count", "f.cumulative_score")
        .collect()  # bounded: one row per group (8 groups)
    )
    spark.catalog.dropTempView(sink)
    out_schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("event_count", LongType()),
            StructField("cumulative_score", DoubleType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in rows], out_schema)



@register(
    "x_udtf_chunk_text",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 200 AND text IS NOT NULL AND length(text) > 0
    )
    SELECT d.doc_id,
           CAST(t.i AS INT) AS chunk_idx,
           md5(substring(d.text, CAST(t.i * 100 + 1 AS INT), 100))
             AS chunk_md5,
           CAST(length(substring(d.text, CAST(t.i * 100 + 1 AS INT), 100))
             AS INT) AS chunk_len
    FROM d, LATERAL unnest(
      range(CAST(ceil(length(d.text) / 100.0) AS BIGINT))
    ) AS t(i)
    """,
)
def x_udtf_chunk_text(spark: SparkSession, sf: str) -> DataFrame:
    """PYTHON UDTF template (Arrow-optimized, ``useArrow=True`` →
    ``ArrowEvalPythonUDTF``): the LATERAL table-function surface — one
    input row yields N output rows from arbitrary Python — which no
    other registered operator exercises (VERDICT r8 ask #6 named this
    the one candidate with arrowops-level justification).  The LLM-
    pipeline shape it templates is chunk-level preprocessing: split
    each document into fixed 100-char windows and emit per-chunk
    (index, md5, length); real users swap the body for tokenizer-
    library chunking, sentence splitting, or sliding-window embedding
    prep, keeping the same lateral-join plan.  Arrow-batched by
    construction (the decorator pins ``useArrow=True``, independent of
    session conf), so the plan gate's Python-node allow-list admits it
    by name next to ``MapInArrow``.  Scale shape: the UDTF is a narrow
    per-partition generate — zero exchanges; the documents scan prunes
    to (doc_id, text) with both filters pushed.  Oracle: DuckDB
    recomputes every chunk's md5/length analytically with
    substring+range, so a dropped, duplicated, or mis-sliced chunk
    breaks the hash.  Determinism: md5 over UTF-8 bytes and code-point
    slicing agree across engines; chunk strings themselves stay out of
    the output (hashes only) to keep the compare payload small."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx: int, chunk_md5: string, chunk_len: int",
        useArrow=True,
    )
    class ChunkText:
        def eval(self, text: str):
            size = 100
            for i in range((len(text) + size - 1) // size):
                piece = text[i * size : (i + 1) * size]
                yield (
                    i,
                    hashlib.md5(piece.encode("utf-8")).hexdigest(),
                    len(piece),
                )

    spark.udtf.register("x_chunk_text_udtf", ChunkText)
    d = (
        load_table(spark, sf, "documents")
        .filter(
            (F.col("doc_id") < 200)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .select("doc_id", "text")
    )
    view = "x_udtf_chunk_docs"
    d.createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_md5, c.chunk_len
        FROM {view} d, LATERAL x_chunk_text_udtf(d.text) c
        """
    )
    # The DataFrame resolved the view at analysis time; dropping it now
    # keeps the catalog clean (fixed name, no uuid accumulation).
    spark.catalog.dropTempView(view)
    return out


@register(
    "f_statestore_scan",
    """
    SELECT CAST(user_id % 8 AS VARCHAR) AS group_id,
           COUNT(*) AS count,
           CAST(SUM(event_id % 1000) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def f_statestore_scan(spark: SparkSession, sf: str) -> DataFrame:
    """STATE-STORE batch scan (``spark.read.format("statestore")``) —
    the source-format gap this registration closes (the
    ``f_binaryfile_scan`` precedent: a scan format the registry didn't
    exercise): reading a streaming checkpoint's STATE as a batch
    DataFrame, the offline-forensics surface every 100 TB stateful
    pipeline needs (is dedup state growing? which keys are hot? what
    does key X's fold hold?) without stopping the stream — wrapped by
    ``streaming/state_reader.py``.  Witness: stage the events fold
    (group_id = user_id % 8, score = event_id % 1000) as a single
    parquet file once per sf-dir, drain it through ``running_counter``
    (applyInPandasWithState) into a checkpoint built exactly once
    (rename-dance idempotent, same as the binaryFile staging), then
    SCAN THE CHECKPOINT'S STATE — the recovered per-key (count, total)
    must equal DuckDB's batch groupBy over the raw events, proving the
    state store holds exactly the fold the operator claims.
    Determinism: a single staged file → one availableNow batch → state
    is the complete fold; scores are integral doubles, exact at any
    accumulation order.  Scale shape: the state read is a
    partition-parallel batch scan over the checkpoint's store files
    (RocksDB SSTs / HDFS deltas) with snapshot/partition pinning for
    targeted forensics; no exchange in the returned plan."""
    import glob
    import os
    import re
    import shutil
    import uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_streaming_spark.io.sources import file_stream
    from kafka_streaming_spark.streaming.stateful import running_counter
    from kafka_streaming_spark.streaming.state_reader import read_state_flat

    ev = load_table(spark, sf, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf).strip("_")
    base = f"/root/repo/.tmp/f_statestore_scan_{slug}"
    ckpt = f"{base}/ckpt"
    schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    if not os.path.isdir(ckpt):  # deterministic content → build once
        build = f"{base}.build_{uuid.uuid4().hex[:8]}"
        os.makedirs(f"{build}/src")
        staged = ev.select(
            (F.col("user_id") % 8).cast("string").alias("group_id"),
            (F.col("event_id") % 1000).cast("double").alias("score"),
        )
        staged.coalesce(1).write.parquet(f"{build}/p0")
        shutil.copy(
            glob.glob(f"{build}/p0/*.parquet")[0], f"{build}/src/f0.parquet"
        )
        shutil.rmtree(f"{build}/p0")
        with _tiny_stream_conf(spark):
            stream = file_stream(spark, f"{build}/src", schema)
            (
                running_counter(stream)
                .writeStream.format("noop")
                .outputMode("update")
                .option("checkpointLocation", f"{build}/ckpt")
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(f"{build}/ckpt", ckpt)
        except OSError:
            pass  # concurrent builder won the rename; use theirs
        shutil.rmtree(build, ignore_errors=True)
    # Returned LAZY so the statestore relation stays visible in the
    # plan (the point of the witness); explicit casts pin the
    # driver-facing shape whatever the store's internal types evolve to.
    return read_state_flat(spark, ckpt).select(
        F.col("group_id").cast(StringType()).alias("group_id"),
        F.col("count").cast(LongType()).alias("count"),
        F.col("total").cast(DoubleType()).alias("total"),
    )


@register(
    "f_pydatasource_scan",
    """
    WITH src AS (
      SELECT range AS i,
             (range * 2654435761) % 4294967296 AS score_fp,
             1700000000000 + range * 250 AS ts
      FROM range(0, 20000)
    )
    SELECT 'w' || CAST(i % 8 AS VARCHAR) AS group_id,
           COUNT(*) AS n,
           CAST(SUM(score_fp) AS BIGINT) AS score_fp_sum,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts
    FROM src GROUP BY 1
    """,
)
def f_pydatasource_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PYTHON DATA SOURCE scan (Spark 4's ``pyspark.sql.datasource``
    API) — the custom-connector surface, and the last source-format gap
    in the registry's matrix (parquet/csv/json/xml/binaryFile/statestore
    all covered; this is the path for feeds with NO built-in connector —
    internal REST cursors, proprietary archives, synthetic load): a
    source defined entirely in Python with partition-parallel readers,
    planned as a plain ``BatchScan`` that Catalyst optimizes normally.
    The witness reads the engine's ``deterministic_events`` source
    (``io/pydatasource.py`` — the reference generator's closed form:
    publish_daemon.rs:78-147 shape, Knuth-hash uniform scores, monotone
    timestamps) and folds it per group; DuckDB reproduces every value
    from ``range()`` arithmetic, so a mis-sliced partition, a dropped
    row, or a float drift in the score round-trip breaks the hash.
    Determinism: ``score`` is score_fp / 2^32 with score_fp < 2^32 —
    exact in double, and ``score * 2^32`` recovers the integer exactly,
    summed as BIGINT (order-independent).  Scale shape: one Exchange
    for the groupBy; the scan itself is driver-free partition-parallel
    generation — the template's point at 100 TB is that ``partitions()``
    defines the parallelism of ANY wrapped feed.  The streaming half of
    the same source (micro-batch offsets saturating at ``rows``) is
    pinned by ``test_pydatasource_stream_matches_batch``."""
    from kafka_streaming_spark.io.pydatasource import (
        register_deterministic_events,
    )

    register_deterministic_events(spark)
    src = (
        spark.read.format("deterministic_events")
        .option("rows", 20_000)
        .option("partitions", 4)
        .load()
    )
    return src.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("score") * 4294967296).cast("long")).alias(
            "score_fp_sum"
        ),
        F.min("event_timestamp").alias("min_ts"),
        F.max("event_timestamp").alias("max_ts"),
    )
