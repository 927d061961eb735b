"""application_template — the pass-through app skeleton.

Spark-first re-expression of reference
``applications/application_template/application_template.py`` (115 LoC of
DStream boilerplate: Kafka in → json parse → identity transform → driver
collect → Kafka out). Here the skeleton is three lines of wiring around a
``DataFrame -> DataFrame`` transform, identical in batch and streaming —
this module is the template new analytics copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S


def template_transform(flows: DataFrame) -> DataFrame:
    """The 'analysis': identity plus the @type tag every app output
    carries (reference application_template.py's process_results just
    forwards records)."""
    return flows.withColumn("@type", F.lit("application_template"))


def to_output_json(result: DataFrame) -> DataFrame:
    """O1 — JSON-lines payload, the result-topic wire format."""
    return result.select(
        F.to_json(F.struct(*[F.col(c) for c in result.columns])).alias("value")
    )


def count_by_minute(flows: DataFrame) -> DataFrame:
    """The template's one illustrative computation: records per minute —
    the smallest windowed aggregation an app author grows from."""
    return (
        flows.select(F.timestamp_millis(F.col(S.T_START)).alias("ts"))
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("records"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "records")
    )
