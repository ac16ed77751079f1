"""real-codec multimodal queries — split from the monolithic queries.py (round 9,
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

# ===========================================================================
# Real-codec multimodal queries (round-trip through genuine PNG/WAV bytes,
# verified against ANALYTIC oracles — DuckDB recomputes the expected pixel/
# sample values from the generation formula, so a pass requires the whole
# encode → compress → decode → unfilter chain to be correct)
# ===========================================================================


@register(
    "x_image_pixel_stats",
    """
    WITH px AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id AS asset_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(flatten(list_transform(
             generate_series(0, h*w - 1),
             p -> list_transform([0, 1, 2],
                    c -> ((p // w) + 2*(p % w) + 37*c + doc_id) % 256)
           ))) AS BIGINT) AS pixel_sum
    FROM px
    """,
)
def x_image_pixel_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Real PNG decode, end to end: deterministic gradient images are
    encoded as genuine PNGs (zlib IDAT, per-row filters cycling through all
    five types), decoded back through the ``decode_image_pixels`` operator,
    and reduced to per-image pixel sums.  The oracle knows nothing about
    PNG — it recomputes the expected sum from the generation formula, so
    agreement proves the codec chain byte-exact."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from kafka_streaming_spark.functions.multimodal import (
        PIXELS_SCHEMA,
        decode_image_pixels,
        encode_png,
    )
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + d % 7
                i = np.arange(h).reshape(h, 1, 1)
                j = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((i + 2 * j + 37 * c + d) % 256).astype(np.uint8)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    decoded = decode_image_pixels(ids.mapInPandas(gen, gen_schema))

    byte_sum = F.pandas_udf(
        lambda b: b.map(lambda v: int(np.frombuffer(v, np.uint8).sum()) if v is not None else 0),
        "long",
    )

    return decoded.select(
        "asset_id", "width", "height", "channels", byte_sum("pixels").alias("pixel_sum")
    )


@register(
    "x_image_resize_stats",
    """
    WITH px AS (
      SELECT doc_id, 8 + doc_id % 9 AS w0, 8 + doc_id % 7 AS h0
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS asset_id,
           CAST(16 AS INTEGER) AS width,
           CAST(12 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(flatten(list_transform(
             generate_series(0, 12*16 - 1),
             p -> list_transform([0, 1, 2],
                    c -> (((p // 16) * h0) // 12
                          + 2 * (((p % 16) * w0) // 16)
                          + 37*c + doc_id) % 256)
           ))) AS BIGINT) AS pixel_sum
    FROM px
    """,
)
def x_image_resize_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Image RESIZE end to end through real codecs: gradient PNGs are
    decoded, nearest-neighbor resampled to 16x12 in numpy, re-encoded as
    PNG (``resize_images``), decoded AGAIN (``decode_image_pixels``), and
    reduced to pixel sums.  The oracle knows neither PNG nor numpy — it
    replays the nearest-neighbor index math ``src = (dst*extent)//target``
    against the generation formula, so agreement proves decode → resample
    → re-encode → decode is index-exact.  Everything stays in Arrow
    ``mapInPandas`` batches (the multimodal boundary pattern)."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from kafka_streaming_spark.functions.multimodal import (
        decode_image_pixels,
        encode_png,
        resize_images,
    )
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + d % 7
                i = np.arange(h).reshape(h, 1, 1)
                j = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((i + 2 * j + 37 * c + d) % 256).astype(np.uint8)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    resized = resize_images(ids.mapInPandas(gen, gen_schema), width=16, height=12)
    decoded = decode_image_pixels(resized)
    byte_sum = F.pandas_udf(
        lambda b: b.map(lambda v: int(np.frombuffer(v, np.uint8).sum()) if v is not None else 0),
        "long",
    )
    return decoded.select(
        "asset_id", "width", "height", "channels", byte_sum("pixels").alias("pixel_sum")
    )


@register(
    "x_audio_energy",
    """
    WITH t AS (
      SELECT doc_id,
             unnest(generate_series(0, 256 + (doc_id % 7) * 64 - 1)) AS t
      FROM documents WHERE doc_id < 300
    ), s AS (
      SELECT doc_id, t, (doc_id*31 + t*17) % 4001 - 2000 AS v FROM t
    ), w AS (
      SELECT doc_id, t // 64 AS window_idx, v,
             lag(v) OVER (PARTITION BY doc_id, t // 64 ORDER BY t) AS pv
      FROM s
    )
    SELECT doc_id AS asset_id, CAST(window_idx AS INTEGER) AS window_idx,
           CAST(SUM(v*v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) != (pv < 0)
                         THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
    FROM w GROUP BY doc_id, window_idx
    """,
)
def x_audio_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Real WAV decode, end to end: deterministic int16 PCM is encoded as
    genuine RIFF/WAV (stdlib ``wave``), decoded back inside
    ``extract_audio_features``, and reduced to per-window energy and
    zero-crossing counts.  The oracle recomputes both from the sample
    formula — agreement proves the PCM round-trip sample-exact."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from kafka_streaming_spark.functions.multimodal import encode_wav, extract_audio_features
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 256 + (d % 7) * 64
                t = np.arange(n, dtype=np.int64)
                s = ((d * 31 + t * 17) % 4001 - 2000).astype(np.int16)
                payloads.append(encode_wav(s))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    return extract_audio_features(ids.mapInPandas(gen, gen_schema), window_bytes=128)


@register(
    "x_video_frame_stats",
    """
    WITH a AS (
      SELECT doc_id, 4 + doc_id % 5 AS n, 8 + doc_id % 5 AS h, 8 + doc_id % 6 AS w
      FROM documents WHERE doc_id < 120
    ), fr AS (
      SELECT doc_id, h, w, unnest(generate_series(0, n - 1, 2)) AS f
      FROM a
    )
    SELECT doc_id AS asset_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(list_sum(flatten(list_transform(
             generate_series(0, h*w - 1),
             p -> list_transform([0, 1, 2],
                    c -> (doc_id + 11*f + 3*(p // w) + 5*(p % w) + 29*c) % 256)
           ))) AS BIGINT) AS pixel_sum
    FROM fr
    """,
)
def x_video_frame_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Real AVI decode, end to end: deterministic gradient frame stacks are
    encoded as genuine raw-frame AVI containers (RIFF/DIB), every 2nd frame
    is extracted through ``sample_frames`` (which re-emits each as a real
    PNG), the PNG is decoded back, and each sampled frame is reduced to its
    pixel sum.  The oracle knows neither container — it recomputes expected
    sums from the generation formula, so agreement proves the AVI encode →
    parse → DIB unflip → PNG encode → decode chain byte-exact."""
    import numpy as np  # worker-side
    import pandas as pd  # noqa: F811 (worker-side)

    from kafka_streaming_spark.functions.multimodal import (
        decode_png,
        encode_avi,
        sample_frames,
    )
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    ids = load_table(spark, sf, "documents").filter(F.col("doc_id") < 120).select("doc_id")

    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, h, w = 4 + d % 5, 8 + d % 5, 8 + d % 6
                f = np.arange(n).reshape(n, 1, 1, 1)
                y = np.arange(h).reshape(1, h, 1, 1)
                x = np.arange(w).reshape(1, 1, w, 1)
                c = np.arange(3).reshape(1, 1, 1, 3)
                px = ((d + 11 * f + 3 * y + 5 * x + 29 * c) % 256).astype(np.uint8)
                payloads.append(encode_avi(px, fps=25))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "video/avi",
                    "payload": payloads,
                }
            )

    frames = sample_frames(ids.mapInPandas(gen, gen_schema), every_n=2)
    png_sum = F.pandas_udf(
        lambda b: b.map(lambda v: int(decode_png(v)[3].sum())), "long"
    )
    return frames.select("asset_id", "frame_idx", png_sum("frame").alias("pixel_sum"))


@register(
    "x_quality_model_score",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), w AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('w:',
               CAST(CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 256
                    AS VARCHAR))), 1, 15)) AS BIGINT) % 2001 - 1000 AS wi
      FROM tok
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(wi) AS DOUBLE) / (1000.0 * COUNT(*)) AS model_score
    FROM w GROUP BY doc_id
    """,
)
def x_quality_model_score(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality scoring via the feature-hashing trick (fasttext
    shape): token → md5 bucket → deterministic integer weight → exact
    integer dot product per doc, one IEEE division at the end.  The oracle
    recomputes bucket assignment, weights, and accumulation independently;
    at scale the md5 stand-in weights become a trained model's literal
    weight map with the identical plan."""
    d = load_table(spark, sf, "documents")
    return T.hashed_feature_score(d)


_PROFILE_COLS = ("text", "lang", "source", "n_chars")


def _profile_oracle() -> str:
    parts = [
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN(length(CAST({c} AS VARCHAR))) AS BIGINT) AS min_len,
           CAST(MAX(length(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
    FROM documents"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register("x_column_profile", _profile_oracle())
def x_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiler (the data-quality / schema-drift staple): one row
    per column with row/null/distinct counts and value-length bounds,
    computed in a SINGLE corpus pass — all per-column aggregates in one
    ``agg``, unpivoted to rows with an explode of a struct array (no
    re-scan per column).  The multi-COUNT(DISTINCT) compiles to one
    Expand+aggregate (rows × n_profiled_columns through one shuffle) —
    the standard profiler trade; swap ``approx_count_distinct`` in at
    100 TB when exactness isn't required."""
    d = load_table(spark, sf, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.length(s)).cast("long").alias(f"__mn_{c}"),
            F.max(F.length(s)).cast("long").alias(f"__mx_{c}"),
        ]
    one = d.agg(*aggs)
    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_len"),
                        F.col(f"__mx_{c}").alias("max_len"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    )
    return rows.select("p.*")


@register(
    "x_bloom_filter_probe",
    """
    WITH members AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ), mk AS (
      SELECT c_custkey, j,
             CAST(concat('0x', substr(md5('bf' || j || ':' || c_custkey), 1, 15))
                  AS BIGINT) % 3840 AS h
      FROM members, unnest(generate_series(0, 2)) AS u(j)
    ), bloom AS (
      SELECT h // 60 AS word, bit_or(1::BIGINT << CAST(h % 60 AS INTEGER)) AS bits
      FROM mk GROUP BY h // 60
    ), cand AS (
      SELECT DISTINCT o_custkey FROM orders
    ), ck AS (
      SELECT o_custkey, j,
             CAST(concat('0x', substr(md5('bf' || j || ':' || o_custkey), 1, 15))
                  AS BIGINT) % 3840 AS h
      FROM cand, unnest(generate_series(0, 2)) AS u(j)
    ), probe AS (
      SELECT ck.o_custkey,
             MIN(CASE WHEN (bloom.bits & (1::BIGINT << CAST(ck.h % 60 AS INTEGER))) <> 0
                      THEN 1 ELSE 0 END) AS maybe_member
      FROM ck LEFT JOIN bloom ON ck.h // 60 = bloom.word
      GROUP BY ck.o_custkey
    )
    SELECT p.o_custkey AS cand_key, p.maybe_member,
           CAST(m.c_custkey IS NOT NULL AS BIGINT) AS actual_member
    FROM probe p LEFT JOIN members m ON p.o_custkey = m.c_custkey
    """,
)
def x_bloom_filter_probe(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter build + probe — the runtime-filter / semi-join-prune
    primitive: rich customers (c_acctbal > 9000) hash k=3 ways into a
    3,840-bit filter stored as 64 sixty-bit words via a ``bit_or``
    aggregate, then every distinct order customer probes it.  The filter
    is CONSTANT size at any member count and broadcasts everywhere; the
    output keeps (maybe, actual) side by side so the one-sided error
    contract — no false negatives, measurable false positives — is
    visible and oracle-checked.  Portable md5 hashing makes every bit of
    the filter identical in DuckDB (60-bit words keep the sign bit out
    of the shifts)."""
    c = load_table(spark, sf, "customer")
    members = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")

    def keyed(df: DataFrame, key: str) -> DataFrame:
        ks = df.select(
            F.col(key),
            F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j"),
        )
        h = (
            F.pmod(
                D.portable_hash60(
                    F.concat(F.lit("bf"), F.col("j"), F.lit(":"), F.col(key))
                ),
                F.lit(3840),
            )
        )
        return ks.select(F.col(key), h.alias("h"))

    mk = keyed(members, "c_custkey")
    bloom = mk.groupBy(F.expr("h DIV 60").alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 60 AS INT))")
        ).alias("bits")
    )
    cand = load_table(spark, sf, "orders").select("o_custkey").distinct()
    ck = keyed(cand, "o_custkey")
    probe = (
        ck.join(F.broadcast(bloom), F.expr("h DIV 60") == F.col("word"), "left")
        .select(
            "o_custkey",
            F.when(
                F.expr("bits & shiftleft(CAST(1 AS BIGINT), CAST(h % 60 AS INT))") != 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("__hit"),
        )
        .groupBy("o_custkey")
        .agg(F.min("__hit").alias("maybe_member"))
    )
    return probe.join(
        members.withColumnRenamed("c_custkey", "o_custkey").withColumn(
            "__m", F.lit(1)
        ),
        "o_custkey",
        "left",
    ).select(
        F.col("o_custkey").alias("cand_key"),
        "maybe_member",
        F.coalesce(F.col("__m"), F.lit(0)).cast("long").alias("actual_member"),
    )


@register(
    "x_fuzzy_match",
    """
    WITH names AS (
      SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS name_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM part GROUP BY p_name
    ), q AS (
      SELECT name_key AS query_key,
             concat(substr(p_name, 1, 1 + name_key % (length(p_name) - 2)),
                    substr(p_name, 3 + name_key % (length(p_name) - 2)))
               AS qname
      FROM names
    )
    SELECT q.query_key, q.qname, c.p_name AS matched_name, c.n_rows,
           CAST(levenshtein(q.qname, c.p_name) AS BIGINT) AS dist
    FROM q JOIN names c
      ON substr(q.qname, 1, 1) = substr(c.p_name, 1, 1)
     AND length(q.qname) + 1 = length(c.p_name)
    WHERE levenshtein(q.qname, c.p_name) <= 1
    """,
)
def x_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution by dedupe-then-blocked-fuzzy-join: names are
    first collapsed to distinct strings with a deterministic
    min-key + row count (real ER matches entity STRINGS — matching raw
    rows would square the duplicate groups: 64 distinct part names x
    300 copies each at sf0.1 means 6M pair rows done naively), then each
    name is deterministically corrupted (one char deleted at a
    key-dependent position past the first) and matched back with
    ``levenshtein <= 1`` ONLY within blocks sharing (first char,
    expected length).  Block-key equijoin → ordinary shuffle join at any
    scale; recall is exact for single-deletion errors because deletion
    preserves both block keys by construction.  Corruption and every
    distance are replayed verbatim by the oracle."""
    p = load_table(spark, sf, "part")
    # cached: the distinct-name table feeds both the corrupted-query and
    # candidate sides of the block join
    names = p.groupBy("p_name").agg(
        F.min("p_partkey").cast("long").alias("name_key"),
        F.count(F.lit(1)).alias("n_rows"),
    ).cache()
    q = names.select(
        F.col("name_key").alias("query_key"),
        F.concat(
            F.expr("substr(p_name, 1, 1 + name_key % (length(p_name) - 2))"),
            F.expr("substr(p_name, 3 + name_key % (length(p_name) - 2))"),
        ).alias("qname"),
    )
    c = names.select(F.col("p_name"), "n_rows")
    joined = q.join(
        c,
        (F.substring("qname", 1, 1) == F.substring("p_name", 1, 1))
        & (F.length("qname") + 1 == F.length("p_name")),
    )
    return joined.filter(F.levenshtein("qname", "p_name") <= 1).select(
        "query_key",
        "qname",
        F.col("p_name").alias("matched_name"),
        "n_rows",
        F.levenshtein("qname", "p_name").cast("long").alias("dist"),
    )


@register(
    "x_compression_ratio",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS raw_bytes,
           CAST(1 AS BIGINT) AS header_ok,
           CAST(1 AS BIGINT) AS roundtrip_ok,
           CAST(1 AS BIGINT) AS bounded_ok
    FROM documents
    """,
)
def x_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """zlib compression quality signal per document (the Gopher redundancy
    heuristic).  SQL has no DEFLATE, so the CHECKED output is the exact
    raw byte length plus three invariant flags the distributed zlib run
    must satisfy (magic header, lossless round-trip, DEFLATE size bound)
    — the oracle hard-codes the flags at 1, so a value-hash match
    certifies zlib executed correctly on every row.  The engine-specific
    ratio output stays on
    :func:`kafka_streaming_spark.functions.text.compression_ratios`,
    pinned byte-for-byte against direct ``zlib.compress`` in pytest."""
    return T.compression_invariants(load_table(spark, sf, "documents"))


@register(
    "x_bpe_tokenize",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(strlen(replace(text, ' ', '')) AS BIGINT) AS n_chars,
           CAST(1 AS BIGINT) AS reconstruct_ok,
           CAST(1 AS BIGINT) AS token_bounds_ok
    FROM documents
    """,
)
def x_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """REAL byte-pair encoding (not the regex proxy of
    `x_doc_bpe_tokens`): train 50 merges on the corpus word-frequency
    head (bounded driver top-k, deterministic tiebreaks), then encode
    every document with the GPT-2 merge loop in Arrow batches with
    per-batch word memoization.  The merge loop itself is not
    SQL-expressible, so the CHECKED output is its invariants: exact
    word/char counts (oracle-computable) plus lossless-reconstruction
    and token-count-bound flags the oracle hard-codes at 1 — a
    value-hash match certifies every document encoded losslessly.  The
    raw token counts stay on ``bpe_encode_counts``, pinned
    piece-for-piece to a driver-side reference encoder in pytest
    (`tests/test_text_ops.py`)."""
    d = load_table(spark, sf, "documents")
    merges = T.bpe_train(d, vocab_words=2000, num_merges=50)
    return T.bpe_invariants(d, merges)


@register(
    "x_scd2_history",
    """
    SELECT user_id,
           epoch_ms(ts) AS valid_from_ms,
           coalesce(epoch_ms(lead(ts) OVER w), 253402300800000) AS valid_to_ms,
           value AS score,
           CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def x_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: each key's update
    stream becomes versioned rows with ``[valid_from, valid_to)`` ranges
    (``lead`` over the per-key timeline; open version capped at the
    9999-12-31 sentinel) and a current-row flag — the warehouse-standard
    dimension-versioning operator.  One window shuffle on the key;
    deterministic (ts, event_id) tiebreak so equal timestamps version
    identically in both engines."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_millis(F.col("ts"))).over(w)
    return e.select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("valid_from_ms"),
        F.coalesce(nxt, F.lit(253402300800000)).alias("valid_to_ms"),
        F.col("value").alias("score"),
        nxt.isNull().cast("long").alias("is_current"),
    )


@register(
    "x_pit_join",
    """
    WITH d AS (
      SELECT user_id, ts, arg_max(value, event_id) AS dim_score
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ), f AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), j AS (
      SELECT f.event_id, f.user_id, f.ts, d.ts AS dts, d.dim_score,
             row_number() OVER (PARTITION BY f.event_id ORDER BY d.ts DESC) AS rn
      FROM f LEFT JOIN d ON f.user_id = d.user_id AND d.ts <= f.ts
    )
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, dim_score,
           epoch_ms(dts) AS valid_from_ms
    FROM j WHERE rn = 1
    """,
)
def x_pit_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase event picks up the
    dimension version valid AT its timestamp — the latest signup at or
    before it (facts before any version keep NULLs, left semantics).
    Runs on the union-sort as-of join (ONE window shuffle over
    facts+versions together — no per-fact range probe, no inequality
    join explosion); the dimension is deduped to unique (key, ts) with a
    deterministic max_by keeper first, as the as-of contract requires."""
    e = load_table(spark, sf, "events")
    f = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    d = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("dim_score"))
        .withColumn("vf_ms", F.unix_millis(F.col("ts")))
    )
    out = asof_join(f, d, ["user_id"], "ts", "ts", ["dim_score", "vf_ms"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.col("dim_score_asof").alias("dim_score"),
        F.col("vf_ms_asof").alias("valid_from_ms"),
    )


def _pagerank_oracle(iters: int = 2) -> str:
    """DuckDB replica of integer PageRank on the undirected supplier ↔
    customer trade graph: per-iteration contribution = ``r DIV degree``,
    new rank = ``150000 + (85 * inbound_sum) DIV 100`` (d=0.85 in exact
    integer micro-units), every iteration unrolled."""
    parts = [
        """
    WITH pairs AS (
      SELECT DISTINCT l_suppkey AS a, o_custkey + 100000 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ), deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg
    )"""
    ]
    for i in range(iters):
        parts.append(f""", r{i + 1} AS (
      SELECT e.dst AS node,
             150000 + (85 * CAST(SUM(r.r // d.degree) AS BIGINT)) // 100 AS r
      FROM edges e
      JOIN r{i} r ON e.src = r.node
      JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    )""")
    parts.append(f"""
    SELECT r.node, r.r AS rank_micro, d.degree
    FROM r{iters} r JOIN deg d ON r.node = d.node
    ORDER BY rank_micro DESC, r.node LIMIT 20
    """)
    return "".join(parts)


@register("x_pagerank_trade", _pagerank_oracle())
def x_pagerank_trade(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank (d=0.85, 2 iterations) over the undirected supplier ↔
    customer trade graph derived from lineitem⋈orders — the iterative
    graph-analytics workload beyond connected components.  Ranks live in
    exact integer micro-units (contribution = ``r DIV degree``), so every
    iteration is bit-identical in DuckDB with the rounds unrolled into
    CTEs.  Scale shape: the edge list materializes once and each round is
    one join + one groupBy shuffle, both partitioned on the node key —
    O(iters) passes over edges, no driver state; at 100 TB add lineage
    cuts every few rounds exactly as the connected-components solver
    does.  Top-20 by (rank, node) total order."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 100000).alias("v"),
        )
        .distinct()
    )
    ranks = G.pagerank(G.undirect(pairs), iters=2, broadcast_ranks=True)
    return ranks.orderBy(F.col("rank_micro").desc(), F.col("node").asc()).limit(20)


@register(
    "x_countmin_heavyhitters",
    """
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), keys AS (
      SELECT tok, j,
             CAST(concat('0x', substr(md5('cms' || j || ':' || tok), 1, 15))
                  AS BIGINT) % 512 AS bucket
      FROM tok, unnest(generate_series(0, 3)) AS u(j)
    ), cms AS (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM keys GROUP BY j, bucket
    ), vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count FROM tok GROUP BY tok
    ), vkeys AS (
      SELECT v.tok, v.true_count, u.j,
             CAST(concat('0x', substr(md5('cms' || u.j || ':' || v.tok), 1, 15))
                  AS BIGINT) % 512 AS bucket
      FROM vocab v, unnest(generate_series(0, 3)) AS u(j)
    ), est AS (
      SELECT k.tok AS token, k.true_count, MIN(c.cnt) AS est_count
      FROM vkeys k JOIN cms c ON k.j = c.j AND k.bucket = c.bucket
      GROUP BY k.tok, k.true_count
    )
    SELECT token, est_count, true_count
    FROM est ORDER BY est_count DESC, token LIMIT 20
    """,
)
def x_countmin_heavyhitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min sketch heavy hitters: a 4x512 CMS built over the token
    stream (each occurrence increments one cell per hash row), then top-20
    tokens by their CMS estimate (min over rows), reported next to the
    exact count — the mergeable-sketch workload with its one-sided error
    (estimate >= truth) visible in the output.  The sketch is bounded
    state: 2,048 cells regardless of corpus size, partial-aggregated
    map-side, and the estimate join broadcasts the sketch — at 100 TB
    only candidate tokens (per-partition top-k in practice; full vocab
    here) ever consult it.  Portable md5 bucket hashing makes the ENTIRE
    sketch — every cell count and every estimate — value-hash identical
    in DuckDB (the sketch family's first full oracle; the HLL/t-digest
    query stays rows-only by nature)."""
    d = load_table(spark, sf, "documents")
    tok = spread(d).select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))

    def cms_keys(tok_col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    F.pmod(
                        D.portable_hash60(F.concat(F.lit(f"cms{j}:"), tok_col)),
                        F.lit(512),
                    ).alias("bucket"),
                )
                for j in range(4)
            ]
        )

    keys = tok.select(F.explode(cms_keys(F.col("tok"))).alias("k"))
    cms = keys.groupBy("k.row", "k.bucket").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    vkeys = vocab.select(
        "tok", "true_count", F.explode(cms_keys(F.col("tok"))).alias("k")
    )
    est = (
        vkeys.select("tok", "true_count", F.col("k.row").alias("row"), F.col("k.bucket").alias("bucket"))
        .join(F.broadcast(cms), ["row", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.select(F.col("tok").alias("token"), "est_count", "true_count")
        .orderBy(F.col("est_count").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "x_dsir_weights",
    """
    WITH tok AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
             CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents)
    ), raw AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS rb FROM tok GROUP BY b
    ), tgt AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS tb FROM tok WHERE is_t = 1 GROUP BY b
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ttr, CAST(SUM(is_t) AS BIGINT) AS ttt
      FROM tok
    ), w AS (
      SELECT raw.b,
             ((coalesce(tgt.tb, 0) + 1) * (tot.ttr + 256) * 1000000)
               // ((raw.rb + 1) * (tot.ttt + 256)) AS wm
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w.wm) // COUNT(*) AS BIGINT) AS dsir_weight_micro
    FROM tok JOIN w ON tok.b = w.b GROUP BY doc_id
    """,
)
def x_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR data-selection importance weights: rate every document by the
    smoothed hashed-unigram probability ratio of the English subcorpus
    (target) vs the raw corpus, in exact integer micro-units — the
    pretraining-data resampling signal.  See
    :func:`kafka_streaming_spark.functions.text.dsir_importance_weights`
    for the log-free surrogate and the bounded-broadcast plan shape."""
    return T.dsir_importance_weights(
        load_table(spark, sf, "documents"), F.col("lang") == "en"
    )


_BM25_QUERIES = [(0, "hash join"), (1, "scan filter column"), (2, "stream window agg")]


def _bm25_oracle() -> str:
    terms = sorted({t for _, q in _BM25_QUERIES for t in q.split()})
    in_list = ", ".join(f"'{t}'" for t in terms)
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, q in _BM25_QUERIES for t in sorted(set(q.split()))
    )
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS L FROM tok GROUP BY doc_id
    ), st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS TT,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ND
      FROM tok
    ), q(query_id, term) AS (VALUES {qvals}),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({in_list}) GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), sc AS (
      SELECT q.query_id, tf.doc_id,
             (((2*st.ND - 2*dfreq.df + 1) * 1000000) // (2*dfreq.df + 1)
              * ((44 * st.TT * tf.tf * 1000000)
                 // (20 * st.TT * tf.tf + 6 * st.TT + 18 * dl.L * st.ND))
             ) // 1000000 AS s
      FROM tf
      JOIN dfreq USING (term)
      JOIN q USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN st
    ), agg AS (
      SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score_micro
      FROM sc GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score_micro, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score_micro DESC, doc_id) AS rn
          FROM agg)
    WHERE rn <= 10
    """


@register("x_bm25_search", _bm25_oracle())
def x_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 full-text search: three literal keyword queries ranked over
    the corpus, k1=1.2 / b=0.75 through exact fractions and a log-free
    rational idf so every score is an exact BIGINT in both engines (see
    :func:`kafka_streaming_spark.functions.text.bm25_topk` for the
    derivation and the single-tokenize-pass / pruned-postings plan)."""
    return T.bm25_topk(load_table(spark, sf, "documents"), _BM25_QUERIES, k=10)


@register(
    "x_ngram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), ucnt AS (
      SELECT w, COUNT(*) AS cw
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), vocab AS (
      SELECT COUNT(*) AS v FROM ucnt
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    ), bcnt AS (
      SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram
    ), scored AS (
      SELECT bg.doc_id,
             (1000000 * (bcnt.cb + 1)) // (ucnt.cw + vocab.v) AS p_micro
      FROM bg
      JOIN bcnt USING (bigram)
      JOIN ucnt ON ucnt.w = split_part(bg.bigram, ' ', 1)
      CROSS JOIN vocab
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS lm_score_micro
    FROM scored GROUP BY doc_id
    """,
)
def x_ngram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram language-model quality scoring (the KenLM-perplexity shape):
    fit add-one-smoothed bigram/unigram counts over the corpus, score each
    doc by mean smoothed bigram probability in exact integer micro-units —
    no float log in either engine, so bit-identical.  See
    :func:`kafka_streaming_spark.functions.text.bigram_lm_scores` for the
    100 TB shuffle analysis (two count shuffles + co-partitioned scoring
    joins + broadcast vocab scalar)."""
    return T.bigram_lm_scores(load_table(spark, sf, "documents"))


@register(
    "x_span_dedup",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), h AS (
      SELECT doc_id,
             list_transform(
               list_transform(generate_series(1, greatest(len(t) - 7, 1)),
                              i -> array_to_string(t[i:i+7], ' ')),
               s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
             ) AS hs
      FROM toks
    ), fps AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 3, 1)),
               i -> list_min(hs[i:i+3])))) AS fp
      FROM h
    ), buckets AS (
      SELECT fp, list(doc_id) AS ids FROM fps
      GROUP BY fp HAVING count(*) > 1 AND count(*) <= 50
    ), half AS (
      SELECT fp, unnest(ids) AS id_a, ids FROM buckets
    ), cand AS (
      SELECT fp, id_a, unnest(ids) AS id_b FROM half
    )
    SELECT id_a, id_b, count(*) AS shared_fps
    FROM cand WHERE id_a < id_b
    GROUP BY id_a, id_b
    """,
)
def x_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplication via winnowing fingerprints (8-token
    spans, window 4): document pairs sharing at least one selected span
    hash, with the shared-fingerprint count — the copied-paragraph detector
    whole-document MinHash dilutes away.  Portable md5 hash family, so span
    hashing, winnowing min-selection, bucket bound, and the pair counts are
    all value-hash checked against the independent DuckDB pipeline."""
    d = load_table(spark, sf, "documents")
    return D.duplicated_span_pairs(d, hash_family="md5")


