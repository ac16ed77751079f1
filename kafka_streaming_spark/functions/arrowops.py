"""Arrow-native grouped-map / batch-map operators (VERDICT r6 ask #7 item
2): ``applyInArrow`` / ``mapInArrow`` siblings of the existing
``applyInPandas`` operators.

Why they exist: the pandas variants pay an Arrow→pandas→Arrow conversion on
both edges of every batch (datetime/NA coercions, object-dtype
materialization for strings).  For kernels that are pure columnar arithmetic
— the multimodal decode boundary, token statistics, per-group numeric
reductions — operating directly on ``pyarrow.Table`` / ``RecordBatch``
skips both conversions while keeping the exact same vectorized-batch
execution shape (JVM ↔ Python via Arrow IPC, batches of
``spark.sql.execution.arrow.maxRecordsPerBatch``).

Scale shape: identical to the pandas UDF path — grouped variants shuffle on
the key (one Exchange), map variants are narrow.  Nothing here collects.

These kernels are deliberately oracle-able: each has a pure-DataFrame
equivalent the tests assert against, and each is written so a DuckDB SQL
oracle can reproduce it when registered as a query in r8 (registrations are
frozen this round).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame


def grouped_stats_arrow(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-group (count, sum, min, max, mean) computed as Arrow compute
    kernels inside an ``applyInArrow`` grouped map.

    Semantically identical to::

        df.groupBy(key_col).agg(count, sum, min, max, avg)

    — the built-in is what production code should use (partial aggregation,
    no Python); this operator is the *template* for grouped kernels the
    built-ins can't express (e.g. per-group sketches over binary payloads),
    wired and tested end to end.
    """

    def stats(key: tuple, table: pa.Table) -> pa.Table:
        col = table.column(value_col)
        n = len(table) - col.null_count
        return pa.table(
            {
                key_col: pa.array([key[0]], type=table.schema.field(key_col).type),
                "n": pa.array([n], type=pa.int64()),
                "total": pa.array([pc.sum(col).as_py()], type=pa.float64()),
                "vmin": pa.array([pc.min(col).as_py()], type=pa.float64()),
                "vmax": pa.array([pc.max(col).as_py()], type=pa.float64()),
                "mean": pa.array([pc.mean(col).as_py()], type=pa.float64()),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n bigint, total double, "
        "vmin double, vmax double, mean double"
    )
    return df.select(key_col, value_col).groupBy(key_col).applyInArrow(
        stats, schema=out_schema
    )


def token_stats_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row (char_len, token_count) over a text column as a narrow
    ``mapInArrow`` pass: UTF-8 length and whitespace-token count computed
    with Arrow compute kernels (``utf8_length``,
    ``split_pattern_regex`` + ``list_value_length``) — zero pandas
    materialization, zero shuffle.

    Equivalent built-in: ``F.length`` + ``F.size(F.split(...))``; this is
    the template for batch kernels that need an Arrow-only library (e.g.
    tokenizers operating on Arrow buffers) on the hot path.

    Token definition: maximal runs separated by Java-``\\s`` whitespace,
    i.e. exactly ``[\\t-\\r ]`` (tab, LF, VT, FF, CR, space).  Two
    whitespace-class traps are deliberately sidestepped so the count is
    bit-identical to Spark's ``split(regexp_replace(text,
    '^\\s+|\\s+$', ''), '\\s+')`` and to a DuckDB
    ``regexp_split_to_array(..., '[\\t-\\r ]+')`` oracle:

    - NOT ``utf8_trim_whitespace`` — it trims Unicode whitespace (U+00A0
      …) that Java/RE2 ``\\s`` never matches;
    - NOT RE2 ``\\s`` — it EXCLUDES U+000B vertical tab, which Java
      ``\\s`` includes, so the split pattern spells the class out as
      ``[\\t-\\r ]+`` (Arrow's regex engine is RE2; Spark's is Java).

    Both pinned by the hypothesis test in ``test_properties.py`` (its
    alphabet generates NBSP and VT).
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            # NULL text → 0 chars / 0 tokens (the SQL oracle's coalesce).
            text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
            chars = pc.utf8_length(text)
            # split("") and split("   ") both yield [""] — trim first and
            # report 0 tokens for rows that are empty after trimming.
            # ascii_trim_whitespace trims the C isspace() set = [\t-\r ],
            # the same class the split uses.
            trimmed = pc.ascii_trim_whitespace(text)
            tokens = pc.if_else(
                pc.equal(pc.utf8_length(trimmed), 0),
                pa.scalar(0, type=pa.int32()),
                pc.list_value_length(pc.split_pattern_regex(trimmed, r"[\t-\r ]+")),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), chars, pc.cast(tokens, pa.int64())],
                names=[id_col, "char_len", "token_count"],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInArrow(
        kernel, schema=f"{id_col} {id_type}, char_len int, token_count bigint"
    )
