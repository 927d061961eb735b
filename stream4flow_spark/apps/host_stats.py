"""host_stats — per-host multi-statistic over a time window.

Spark-first re-expression of reference
``applications/statistics/hosts_statistics/spark/host_stats.py``. The
reference ran FIVE separate keyed pipelines (totals :159-179, distinct
peers :182-195, distinct dports :198-210, avg duration :213-226, TCP-flag
bitmap sums :230-245) and stitched them with a chain of four full outer
joins (:254-264, SURVEY J2). All five are aggregate families over the same
key, so here they are ONE ``groupBy(src_ip, window)`` — one shuffle, no
joins, partial aggregation map-side.

Deviations (intended semantics per SURVEY §7.2e): distinct dst-port count
uses a single window like the peers pipeline (the reference accidentally
double-windowed dports); duration average is a true mean.

Scale: the shuffle key is (host, window) — naturally high-cardinality and
well distributed; `countDistinct` expands to an internal two-phase
distinct aggregate. For 100 TB interactive use switch `exact_distinct=False`
to HLL (`approx_count_distinct`, 2% default error) — exact mode is the
correctness-gate default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import (
    ip_coalesce,
    ip_in_cidr,
    tcp_flag_bit,
)

FLAG_COLS = ["FIN", "SYN", "RST", "PSH", "ACK", "URG", "ECE", "CWR"]


def host_stats(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    window_duration: str = "10 seconds",
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-local-host windowed stats.

    Output: window_start_ms, src_ip, flows, packets, bytes,
    avg_duration_ms (double), dport_count, peer_number, f_fin..f_cwr.
    """
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    dst = ip_coalesce(F.col(S.DST_IP4), F.col(S.DST_IP6))
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct

    prepared = (
        flows
        # F1 presence guards + F5 CIDR membership (reference :148-153)
        .filter(
            F.col(S.PACKETS).isNotNull()
            & F.col(S.BYTES).isNotNull()
            & ip_in_cidr(F.col(S.SRC_IP4), local_cidr)
        )
        .select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            src.alias("src_ip"),
            dst.alias("dst_ip"),
            F.col(S.DST_PORT).alias("dst_port"),
            F.col(S.PACKETS).alias("packets"),
            F.col(S.BYTES).alias("bytes"),
            # C18 duration (reference :216)
            (F.col(S.T_END) - F.col(S.T_START)).alias("duration_ms"),
            F.coalesce(F.col(S.TCP_FLAGS), F.lit(0)).alias("tcp_flags"),
        )
    )

    flag_aggs = [
        F.sum(tcp_flag_bit(F.col("tcp_flags"), i)).alias(f"f_{name.lower()}")
        for i, name in enumerate(FLAG_COLS)
    ]

    return (
        prepared.groupBy(F.window("ts", window_duration).alias("w"), "src_ip")
        .agg(
            # A1 totals (reference :159-179)
            F.count("*").alias("flows"),
            F.sum("packets").alias("packets"),
            F.sum("bytes").alias("bytes"),
            # A4 average duration — sum/count so Spark and the SQL oracle
            # divide identical exact operands (reference :213-226)
            (F.sum("duration_ms").cast("double") / F.count("*")).alias("avg_duration_ms"),
            # A3 exact distinct ×2 (reference :182-210)
            distinct("dst_port").alias("dport_count"),
            distinct("dst_ip").alias("peer_number"),
            # A5 element-wise bitmap sum (reference :230-245)
            *flag_aggs,
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "src_ip",
            "flows",
            "packets",
            "bytes",
            "avg_duration_ms",
            "dport_count",
            "peer_number",
            *[f"f_{n.lower()}" for n in FLAG_COLS],
        )
    )


def to_output_json(stats: DataFrame) -> DataFrame:
    """O1/O2 — nested JSON per reference host_stats.py:79-138."""
    return stats.select(
        F.to_json(
            F.struct(
                F.lit("host_stats").alias("@type"),
                F.col("src_ip"),
                F.struct(
                    F.struct(
                        F.col("flows").alias("flow"),
                        F.col("packets"),
                        F.col("bytes"),
                    ).alias("total"),
                    F.col("avg_duration_ms").alias("avg_flow_duration"),
                    F.col("dport_count"),
                    F.col("peer_number"),
                    F.struct(
                        *[F.col(f"f_{n.lower()}").alias(n) for n in FLAG_COLS]
                    ).alias("tcp_flags"),
                ).alias("stats"),
                F.col("window_start_ms"),
            )
        ).alias("value")
    )
