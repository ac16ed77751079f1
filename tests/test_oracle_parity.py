"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle, compare row count, column names, and the full
(order-insensitive) value multiset.

Values are canonicalized to strings the way a value-hash would see them —
exact equality required, no tolerance — so a pass here predicts a pass in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import decimal
import math

import pytest

from kafka_streaming_spark.queries import REGISTRY
from tests.conftest import SF_SMALL

ORACLE_QUERIES = sorted(name for name, (_f, sql) in REGISTRY.items() if sql is not None)


def canon(v):
    """Canonical string form for cross-engine value comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Deliberately strict: NO normalize().  Round 1 showed that a
        # scale-preserving hasher sees Decimal('1.50') != Decimal('1.5');
        # the registry policy is therefore "no DECIMAL in outputs at all"
        # (see test_no_decimal_outputs below).
        return str(v)
    return str(v)


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_SMALL)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    left = rows_to_multiset(spark_cols, spark_rows)
    right = rows_to_multiset(duck_cols, duck_rows)
    if left != right:
        diffs = [(l, r) for l, r in zip(left, right) if l != r][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


# (The rows-only runner is gone on purpose: since round 5 EVERY registry
# query ships an oracle — tests/test_registry.py::test_every_query_has_an_oracle
# pins the invariant, so a rows-only registration fails fast there.)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_decimal_or_timestamp_outputs(spark, name):
    """Canonicalization gate (round-1 lesson): DECIMAL and TIMESTAMP must
    never reach a checked output schema — hashers canonicalize them
    differently across engines even when values are identical.  Aggregates
    accumulate in DECIMAL internally but emit DOUBLE via the scaled-BIGINT
    fixed point (queries.dfix/dsum/r6)."""
    from pyspark.sql.types import DecimalType, TimestampType, TimestampNTZType

    fn, _sql = REGISTRY[name]
    schema = fn(spark, SF_SMALL).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (DecimalType, TimestampType, TimestampNTZType))
    ]
    assert not bad, f"{name}: DECIMAL/TIMESTAMP output columns {bad}"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_container_outputs(spark, name):
    """Canonicalization gate (round-3 lesson): the driver canonicalizes
    results through a pandas sort, which raises ``unhashable type: 'list'``
    on any array/map cell — the query loses even its rows/schema check.
    Serialize arrays with ``array_join`` (a_array_agg shows the pattern)."""
    from pyspark.sql.types import ArrayType, MapType

    fn, _sql = REGISTRY[name]
    schema = fn(spark, SF_SMALL).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, (ArrayType, MapType))]
    assert not bad, f"{name}: array/map output columns {bad} crash the driver canonicalizer"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_no_hugeint_or_list(duck, name):
    """Canonicalization gate (round-3 lesson): DuckDB SUM(BIGINT) returns
    HUGEINT, which pandas converts to float64 (2057.0) before the driver
    hashes — mismatching Spark's 2057 even when values are identical.
    Every integer aggregate in an oracle must be CAST(... AS BIGINT); list
    outputs must be serialized to strings."""
    _fn, sql = REGISTRY[name]
    types = [str(t).upper() for t in duck.sql(sql).types]
    bad = [t for t in types if "HUGEINT" in t or "[]" in t or t.startswith(("LIST", "MAP", "STRUCT"))]
    assert not bad, f"{name}: oracle produces driver-hostile types {bad}; CAST/serialize them"


def test_observed_metrics_empty_events(spark, tmp_path_factory):
    """ADVICE r8: on an EMPTY events table the observed sum/min/max come
    back as None — the witness must emit the same NULL row the DuckDB
    oracle produces instead of raising ``TypeError`` on ``int(None)``."""
    import pyspark.sql.types as T

    sf_dir = str(tmp_path_factory.mktemp("empty_sf"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame([], schema).write.parquet(f"{sf_dir}/events.parquet")
    fn, _sql = REGISTRY["x_observed_metrics"]
    row = fn(spark, sf_dir).collect()[0]
    assert row["n_rows"] == 0
    assert row["n_null_props"] is None
    assert row["min_ts_ms"] is None
    assert row["max_ts_ms"] is None
    assert row["id_checksum"] is None
