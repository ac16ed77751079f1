"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline's gold
aggregate as one batch query) on sf0.001; ``queries()``/``oracle_sql()``
expose the full operator registry from ``kafka_streaming_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver loads this module by file path; make the package importable
# regardless of the caller's working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from kafka_streaming_spark.queries import driver_ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7 step 0):
    scan → project/derive (P4-P7) → dedup latest-per-key (W1) → grouped
    multi-aggregate (A1/A5) — the reference's silver→gold computation as
    one batch plan."""
    from pyspark.sql import functions as F

    from kafka_streaming_spark.ops.dedup import latest_per_key
    from kafka_streaming_spark.ops.aggregates import group_agg
    from kafka_streaming_spark.ops.projections import derive_event_columns, normalize_events
    from kafka_streaming_spark.schemas import load_table

    events = normalize_events(load_table(spark, "/root/testdata/sf0.001", "events"))
    derived = derive_event_columns(events)
    deduped = latest_per_key(derived, ["minute_timestamp", "id"], "event_timestamp", "id")
    return group_agg(deduped, keys=("group_id",), score_col="score", ts_col="event_timestamp")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    queries without prior driver CORRECTNESS rows come first (the driver
    checks a bounded prefix; see queries.DRIVER_PRIORITY)."""
    return {name: fn for name, (fn, _sql) in driver_ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    (MinHash/SimHash/LSH/streaming) get the driver's rows-only check."""
    return {name: sql for name, (_fn, sql) in driver_ordered().items() if sql is not None}
