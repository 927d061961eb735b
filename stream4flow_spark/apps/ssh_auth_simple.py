"""ssh_auth_simple — SSH brute-force detection by flow-shape thresholds.

Spark-first re-expression of reference
``applications/detection/ssh_auth_simple/spark/ssh_auth_simple.py``:
band filters (:170-179, F2), grouped aggregate per (attacker, victim) with
the flow count and packet average (:190-201), HAVING on the flow count
(:204, F10). The reference's hand-rolled "running average"
(:190-194) was order-dependent with Python-2 integer division
(SURVEY §7.2c); the intended semantics is a true mean, expressed here as
sum/count.

``window_duration=None`` runs the detector over the whole batch horizon
(one global bucket) — same pipeline, stable schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import ip_coalesce
from stream4flow_spark.operators.window_agg import with_window_start_ms


def ssh_auth_simple(
    flows: DataFrame,
    window_duration: str | None = "300 seconds",
    min_flows: int = 10,
    packets_band: tuple[int, int] = (10, 20),
    bytes_band: tuple[int, int] = (1800, 5000),
    max_duration_ms: int = 12_000,
) -> DataFrame:
    """Output: window_start_ms, src_ip, dst_ip, flows, avg_packet_count
    (double), duration_ms (summed)."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    dst = ip_coalesce(F.col(S.DST_IP4), F.col(S.DST_IP6))
    p_lo, p_hi = packets_band
    b_lo, b_hi = bytes_band
    filtered = flows.filter(
        # F2 equality/range predicates (reference :170-179)
        (F.col(S.PROTO) == 6)
        & (F.col(S.DST_PORT) == 22)
        & (F.col(S.SRC_PORT) > 1024)
        & (F.col(S.PACKETS) > p_lo)
        & (F.col(S.PACKETS) < p_hi)
        & (F.col(S.BYTES) > b_lo)
        & (F.col(S.BYTES) < b_hi)
        # C18 duration bound (reference :178-179)
        & ((F.col(S.T_END) - F.col(S.T_START)) < max_duration_ms)
    )
    return (
        with_window_start_ms(filtered, S.T_START, window_duration)
        .select(
            "window_start_ms",
            src.alias("src_ip"),
            dst.alias("dst_ip"),
            F.col(S.PACKETS).alias("packets"),
            (F.col(S.T_END) - F.col(S.T_START)).alias("duration_ms"),
        )
        .groupBy("window_start_ms", "src_ip", "dst_ip")
        .agg(
            F.count("*").alias("flows"),
            # A12 — true mean replaces the order-dependent running average
            (F.sum("packets").cast("double") / F.count("*")).alias("avg_packet_count"),
            F.sum("duration_ms").alias("duration_ms"),
        )
        # F10 HAVING (reference :204)
        .filter(F.col("flows") >= min_flows)
    )
