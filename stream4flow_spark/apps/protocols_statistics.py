"""protocols_statistics — per-protocol flows/packets/bytes per time window.

Spark-first re-expression of reference
``applications/statistics/protocols_statistics/spark/protocols_statistics.py:99-132``:
the reference's filter → map → reduceByKey → window → reduceByKey chain
(a hand-rolled partial/final aggregation, its comment at :116) collapses to
one ``groupBy(window, protocol)`` — Catalyst emits the partial+final hash
aggregate automatically, so the map-side combine the reference hand-built
is free, and the whole pipeline is whole-stage-codegen'd.

Scale notes: single shuffle keyed by (window, protocol) — 3 protocol values
× bounded window count, so the reduced side is tiny regardless of input
size; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import protocol_name


def protocols_statistics(flows: DataFrame, window_duration: str = "10 seconds") -> DataFrame:
    """Windowed per-protocol traffic totals.

    Output: window_start_ms BIGINT, protocol STRING,
            flows/packets/bytes BIGINT.
    """
    return (
        flows
        # F1 key-presence guards (reference :109)
        .filter(
            F.col(S.PACKETS).isNotNull() & F.col(S.BYTES).isNotNull()
        )
        .select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            protocol_name(F.col(S.PROTO)).alias("protocol"),
            F.col(S.PACKETS).alias("packets"),
            F.col(S.BYTES).alias("bytes"),
        )
        # W1 tumbling window + A1/A2 grouped multi-measure sum (reference :112-129)
        .groupBy(F.window("ts", window_duration).alias("w"), "protocol")
        .agg(
            F.count("*").alias("flows"),
            F.sum("packets").alias("packets"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "protocol",
            "flows",
            "packets",
            "bytes",
        )
    )


def to_output_json(stats: DataFrame) -> DataFrame:
    """O1 — JSON-lines with @type tag (reference :52-79)."""
    return stats.select(
        F.to_json(
            F.struct(
                F.lit("protocols_statistics").alias("@type"),
                F.col("protocol"),
                F.col("flows"),
                F.col("packets"),
                F.col("bytes"),
                F.col("window_start_ms"),
            )
        ).alias("value")
    )
