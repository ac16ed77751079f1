"""Column-level function packs for the LLM-data-pipeline extension surface
(SURVEY.md §7 step 5): text analysis, document dedup, embedding similarity.

Everything here is built from ``pyspark.sql.functions`` higher-order
functions (transform / aggregate / zip_with) — JVM-side, Catalyst-visible,
no Python UDFs — so the same code runs unchanged on a 1000-executor cluster.
"""

from kafka_streaming_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
