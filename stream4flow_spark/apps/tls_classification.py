"""tls_classification — TLS fingerprint → OS / browser / application counts.

Spark-first re-expression of reference
``applications/statistics/tls_classification/spark/tls_classification.py``:
the cipher-suite formatting (:142-163) is pure Column work (functions.tls),
the broadcast classifier dict (:63-73) becomes a broadcast hash join, and
the per-attribute counting + union (:216-221) is one explode fan-out over
the three attributes. Unmatched fingerprints count as 'Unknown'
(reference :110-134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.tls import classify, format_cipher_suites


def tls_classification(
    flows: DataFrame,
    dim: DataFrame,
    window_duration: str = "300 seconds",
) -> DataFrame:
    """Output: window_start_ms, stat_type ∈ {os, browser, application},
    key, value (flow count)."""
    fingerprints = (
        flows.filter(
            F.col(S.TLS_SUITES).isNotNull()
            # reference :203 drops the all-zero suite string
            & (F.col(S.TLS_SUITES) != "0x00000000000000000000000000000000")
        )
        .select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            format_cipher_suites(F.col(S.TLS_SUITES)).alias("suites"),
        )
        .filter(F.col("suites") != "")
    )

    classified = classify(fingerprints, dim)  # C10 broadcast join

    arms = F.array(
        *[
            F.struct(
                F.lit(tag).alias("stat_type"),
                F.coalesce(F.col(col), F.lit("Unknown")).alias("key"),
            )
            for tag, col in [
                ("os", "operating_system"),
                ("browser", "browser"),
                ("application", "application"),
            ]
        ]
    )

    return (
        classified.select("ts", F.explode(arms).alias("s"))
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("s.stat_type").alias("stat_type"),
            F.col("s.key").alias("key"),
        )
        .agg(F.count("*").alias("value"))  # A6/A7
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "stat_type",
            "key",
            "value",
        )
    )
