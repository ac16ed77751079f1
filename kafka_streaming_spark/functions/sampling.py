"""Deterministic sampling & dataset-assembly operators for training-data
pipelines: hash-based uniform sampling, stratified sampling, train/val/test
splits, weighted source mixing, and context-window token packing.

Everything is derived from ``md5`` of a stable key — no RNG, no seed state,
no ``rand()``: the same row lands in the same sample/split/pack on every
run, every engine, every retry (the property that matters when a 100 TB
pipeline stage is re-executed after a stage failure — ``rand()``-based
sampling silently changes the sample under retry; see the round-robin
repartition hazard class).

Cross-engine contract: the sampling predicate is a plain string comparison
on an md5-hex prefix (both Spark and DuckDB emit lowercase hex), so every
operator here is oracle-checkable with vanilla ANSI SQL.

Scale shape: all operators are narrow (per-row predicates) except packing,
which is a prefix-sum — run distributed via exact bucket-offset stitching
(see :func:`pack_sequential`), never a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

#: Hex-prefix width for sampling thresholds: 4 hex chars = 16-bit
#: granularity (rates resolve to 1/65536).
_PREFIX = 4


def _hash_prefix(key: Column) -> Column:
    """First 4 hex chars of md5(key) — a uniform 16-bit draw as a string."""
    return F.substring(F.md5(key.cast("string")), 1, _PREFIX)


def rate_threshold(rate: float) -> str:
    """The hex-string threshold t such that P(md5-prefix < t) == round(rate *
    65536) / 65536 under a uniform hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(round(rate * 16**_PREFIX)), 16**_PREFIX - 1), "04x")


def uniform_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``: keep the
    row iff its hash prefix falls below the rate threshold."""
    return df.filter(_hash_prefix(F.col(key_col)) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing primitive
    (e.g. downsample boilerplate-heavy sources, keep rare languages whole).
    Strata absent from ``rates`` are dropped (rate 0)."""
    expr = F.lit("0000")
    for stratum, rate in rates.items():
        expr = F.when(F.col(strata_col) == stratum, F.lit(rate_threshold(rate))).otherwise(
            expr
        )
    return df.filter(_hash_prefix(F.col(key_col)) < expr)


def hash_split(df: DataFrame, key_col: str, val_rate: float, test_rate: float) -> DataFrame:
    """Train/val/test assignment as a derived column ``split``: hash-range
    partitioning of the unit interval ([0, val) → val, [val, val+test) →
    test, rest → train).  Deterministic, disjoint, exhaustive — and stable
    under corpus growth (a doc's split never changes when other docs are
    added, unlike row_number()-based splits)."""
    h = _hash_prefix(F.col(key_col))
    val_t = rate_threshold(val_rate)
    test_t = rate_threshold(val_rate + test_rate)
    return df.withColumn(
        "split",
        F.when(h < F.lit(val_t), F.lit("val"))
        .when(h < F.lit(test_t), F.lit("test"))
        .otherwise(F.lit("train")),
    )


def weighted_mix(
    df: DataFrame, key_col: str, source_col: str, weights: dict[str, float]
) -> DataFrame:
    """Weighted dataset mixing: per-source keep-rates applied with the
    stratified predicate — the "N epochs of Wikipedia, 0.3 of CommonCrawl"
    recipe as one narrow filter (rates > 1 mean upsampling, which needs an
    explode pass — not expressible as a filter; this operator caps at 1)."""
    return stratified_sample(
        df, key_col, source_col, {s: min(w, 1.0) for s, w in weights.items()}
    )


def epoch_shuffle(df: DataFrame, key_col: str, seed: str = "0") -> DataFrame:
    """Deterministic training-order shuffle: every row gets ``epoch_pos`` =
    its 1-based rank under ``ORDER BY md5(seed || ':' || key)`` — a
    reproducible random permutation per epoch seed (change the seed, get an
    independent order; rerun a failed stage, get the SAME order — the
    property ``rand()``-based shuffles lose under retry).

    The global rank is computed DISTRIBUTED, never through a
    single-partition window: the first two hex chars of the sort key split
    rows into 256 ranges that are PREFIXES of the global order, so
    per-range ``row_number`` + exact range offsets (one 256-row collect)
    stitch into the exact global rank — the same decomposition as
    :func:`pack_sequential`, with the same input-determinism requirement
    (the offset job and the final pass must see the same rows)."""
    hk = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    staged = df.withColumn("__hk", hk).withColumn(
        "__b", F.conv(F.substring("__hk", 1, 2), 16, 10).cast("int")
    )
    counts = {
        r["__b"]: r["n"]
        for r in staged.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    local_rn = F.row_number().over(
        Window.partitionBy("__b").orderBy("__hk", key_col)
    )
    if len(offsets) > 1:
        off_map = F.create_map(
            *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
        )
        pos = F.element_at(off_map, F.col("__b")) + local_rn
    else:
        pos = local_rn.cast("long")
    return staged.select(*df.columns, pos.cast("long").alias("epoch_pos"))


def pack_sequential(
    df: DataFrame, order_col: str, token_col: str, budget: int, buckets: int | None = None
) -> DataFrame:
    """Context-window packing: assign docs (in ``order_col`` order) to
    consecutive packs of ~``budget`` tokens — ``pack_id = floor(
    (running_sum - tokens) / budget)``, the standard streaming-concat
    approximation (a doc may straddle a boundary; exact first-fit packing is
    inherently sequential and not worth a distributed pass).

    The global prefix sum runs DISTRIBUTED via exact offset stitching —
    a single-partition ``Window.orderBy`` would funnel the whole corpus
    through one task at scale:

    1. one min/max aggregate over ``order_col`` (1-row driver fetch);
    2. rows land in ``buckets`` contiguous ``order_col`` ranges by
       arithmetic position (bucket index is monotone in ``order_col``,
       so bucket-local order + bucket offsets = global order);
    3. per-bucket running sums — a PARTITIONED window, all buckets in
       parallel;
    4. per-bucket token totals → cumulative offsets (bounded collect of
       ``buckets`` rows);
    5. global running sum = bucket offset (map literal lookup) + local
       running sum.

    The decomposition is exact for ANY boundary placement — skewed
    ``order_col`` ranges affect parallelism, never results — so this is
    value-identical to the naive global window (pinned in
    ``tests/test_properties.py``) and keeps the DuckDB oracle unchanged.
    Non-numeric ``order_col`` falls back to one bucket (the naive form).

    DETERMINISM REQUIREMENT: steps 1 and 4 are separate eager jobs over
    ``df``, and their literal results are baked into the final pass — the
    input must therefore return the same rows on re-execution.  Parquet /
    Delta sources qualify; a ``.sample()`` without a seed, a shuffled
    ``LIMIT``, or files mutating under re-read do NOT — ``.cache()`` or
    checkpoint such inputs first, or the baked offsets can disagree with
    the rows the final pass sees and pack_ids come out silently wrong."""
    spark = df.sparkSession
    if buckets is None:
        buckets = spark.sparkContext.defaultParallelism
    numeric = isinstance(df.schema[order_col].dataType, NumericType)
    lo = hi = None
    if numeric and buckets > 1:
        stats = df.agg(
            F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
        ).collect()[0]
        lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None or lo == hi:
        bucket = F.lit(0)
    else:
        span = float(hi) - float(lo) + 1.0
        bucket = F.least(
            F.floor((F.col(order_col) - F.lit(lo)).cast("double") / span * buckets),
            F.lit(buckets - 1),
        ).cast("int")
    staged = df.select(order_col, token_col).withColumn("__b", bucket)
    w_local = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local_run = F.sum(F.col(token_col)).over(w_local)
    totals = {
        r["__b"]: r["t"]
        for r in staged.groupBy("__b").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    if len(offsets) > 1:
        off_map = F.create_map(
            *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
        )
        running = F.element_at(off_map, F.col("__b")) + local_run
    else:
        running = local_run
    return staged.select(
        order_col,
        F.col(token_col),
        F.floor((running - F.col(token_col)) / F.lit(budget)).cast("long").alias("pack_id"),
    )
