"""Fixed, explicitly declared schemas (no inference anywhere).

Reference: ``stream-processor/config.py:24-56`` declares EVENT_SCHEMA (Kafka
message value), RAW_SCHEMA (silver) and AGGREGATION_SCHEMA (gold).  The engine
keeps the same three layers; aggregate value types are widened from float32 to
double because running-sum-vs-reaggregate float32 drift is a known hazard
(SURVEY.md §7 "watch list" item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- Reference pipeline schemas -------------------------------------------

#: Kafka message value, JSON-encoded (reference config.py:24-31).
EVENT_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("group_id", StringType(), nullable=False),
        StructField("score", DoubleType(), nullable=False),
        StructField("event_timestamp", LongType(), nullable=False),  # epoch millis
    ]
)

#: Silver table = EVENT_SCHEMA + ingest & bucket stamps (config.py:33-42).
SILVER_SCHEMA = StructType(
    list(EVENT_SCHEMA.fields)
    + [
        StructField("ingest_timestamp", LongType(), nullable=True),  # epoch seconds
        StructField("minute_timestamp", LongType(), nullable=True),  # 180 s bucket
    ]
)

#: Gold table: per-group running aggregates (config.py:44-56).  Double, not
#: float32, for deterministic accumulation.
GOLD_SCHEMA = StructType(
    [
        StructField("group_id", StringType(), nullable=False),
        StructField("cumulative_score", DoubleType(), nullable=True),
        StructField("event_count", LongType(), nullable=True),
        StructField("avg_score", DoubleType(), nullable=True),
        StructField("first_event_timestamp", LongType(), nullable=True),
        StructField("last_event_timestamp", LongType(), nullable=True),
        StructField("updated_at", LongType(), nullable=True),
    ]
)

#: CDF metadata columns added by a change-feed read (SURVEY.md §2 S2/S3).
CDF_COLUMNS = ("_change_type", "_commit_version", "_commit_timestamp")
CDF_CHANGE_TYPES = ("insert", "update_preimage", "update_postimage", "delete")

# --- Driver testdata tables (TESTDATA.md) ----------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: The seconds-per-bucket of the reference's "minute_timestamp" (actually a
#: 180-second bucket: silver.py:61 divides epoch millis by 1000*180).
BUCKET_SECONDS = 180


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table from ``{sf_dir}/{name}.parquet``.

    Timestamp normalization (driver sessions are not ours to configure, so
    this is done per-load with runtime-settable confs only):

    - the session time zone is pinned to UTC so epoch arithmetic
      (``unix_millis`` etc.) is deterministic and matches DuckDB, whose
      TIMESTAMP has no zone and whose ``epoch_ms`` treats wall-clock as UTC;
    - testdata generations have written ``ts``-like columns as either
      TIMESTAMP(NANOS) (readable only as long nanos via the nanosAsLong
      legacy conf; converted back with integer division — double arithmetic
      would lose precision above 2^53) or TIMESTAMP(MICROS) without the
      UTC-adjusted flag (read as TIMESTAMP_NTZ).  Both are normalized to
      plain TimestampType here so every downstream expression sees one type.
    """
    from pyspark.sql import functions as F  # local: keep module import light

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    for cname, dtype in df.dtypes:
        if dtype in ("timestamp_ntz", "date"):
            # NTZ wall-clock == UTC wall-clock under the pinned session
            # zone; DATE → midnight-UTC timestamp (what DuckDB's epoch_ms
            # yields for DATE too).  Either way downstream epoch arithmetic
            # sees one type across testdata generations.
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table; keys match DuckDB's pre-registered views."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


__all__ = [
    "EVENT_SCHEMA",
    "SILVER_SCHEMA",
    "GOLD_SCHEMA",
    "CDF_COLUMNS",
    "CDF_CHANGE_TYPES",
    "TESTDATA_TABLES",
    "BUCKET_SECONDS",
    "FloatType",
    "load_table",
    "load_all",
]
