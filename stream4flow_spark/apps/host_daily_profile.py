"""host_daily_profile — 24×1-hour temporal profile per host per day.

Spark-first re-expression of reference
``applications/statistics/hosts_profiling/spark/host_daily_profile.py``:
the reference cascaded three DStream windows (hourly agg :205, daily
collection :232, once-per-day emit gate :255 — W4) and tracked the hour
slot with a GLOBAL mutable counter (:73-92, W6), merging sparse 24-slot
arrays with a conflict sentinel of -1 (:108-133, A16). With event time
none of that machinery is needed: the slot IS ``hour(ts)``, the day is
``date_trunc``, and the pivot is a conditional-sum over 24 hour columns —
two shuffles total (hourly agg, then daily pivot), both keyed by host.

Missing hours are 0 (the reference emitted sparse arrays; documented
deviation for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import ip_coalesce, ip_in_cidr


def host_daily_profile(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
) -> DataFrame:
    """Output: day_ms, src_ip, h0..h23 (flows per hour slot, BIGINT)."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    hourly = (
        flows.filter(ip_in_cidr(F.col(S.SRC_IP4), local_cidr))
        .select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            src.alias("src_ip"),
        )
        # A1 hourly totals (reference :213-215)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.hour(F.col("ts")).alias("hour"),
            "src_ip",
        )
        .agg(F.count("*").alias("flows"))
    )
    # A16 pivot hour → 24 slots (conditional sums compile to one aggregate;
    # missing slots are 0)
    slot_aggs = [
        F.coalesce(
            F.sum(F.when(F.col("hour") == h, F.col("flows"))), F.lit(0)
        ).alias(f"h{h}")
        for h in range(24)
    ]
    return (
        hourly.groupBy("day", "src_ip")
        .agg(*slot_aggs)
        .select(
            F.unix_millis(F.col("day")).alias("day_ms"),
            "src_ip",
            *[f"h{h}" for h in range(24)],
        )
    )


def host_daily_profile_stream(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming W4 cascade: hourly windowed agg chained into a daily
    windowed pivot — two stacked stateful operators, legal in append mode
    since the hourly output carries event time via ``window_time`` (the
    reference emulated this with three DStream windows and a global hour
    counter, host_daily_profile.py:205,232,255,73-92). Only
    watermark-finalized days emit; the live day stays in state."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    base = (
        flows.filter(ip_in_cidr(F.col(S.SRC_IP4), local_cidr))
        .select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            src.alias("src_ip"),
        )
        .withWatermark("ts", watermark_delay)
    )
    hourly = base.groupBy(F.window("ts", "1 hour").alias("hw"), "src_ip").agg(
        F.count("*").alias("flows")
    )
    hwt = F.window_time("hw")
    slot_aggs = [
        F.coalesce(
            F.sum(F.when(F.hour(hwt) == h, F.col("flows"))), F.lit(0)
        ).alias(f"h{h}")
        for h in range(24)
    ]
    return (
        hourly.groupBy(F.window(hwt, "1 day").alias("dw"), "src_ip")
        .agg(*slot_aggs)
        .select(
            F.unix_millis(F.col("dw.start")).alias("day_ms"),
            "src_ip",
            *[f"h{h}" for h in range(24)],
        )
    )


def daily_profile_from_host_stats(host_stats_hourly: DataFrame) -> DataFrame:
    """S7 — the reference chained apps over Kafka: host_stats' hourly
    output topic WAS host_daily_profile's input (host_daily_profile.py:
    207-210, README statistics/hosts_profiling). Here the chain is a
    pivot over the stored hourly host_stats results (same 24-slot output
    schema as ``host_daily_profile``), so the profile never re-reads raw
    flows — at scale it aggregates result rows (hosts × hours), 4-6
    orders of magnitude smaller than the flow table."""
    hourly = host_stats_hourly.select(
        F.timestamp_millis(F.col("window_start_ms")).alias("wts"),
        "src_ip",
        F.col("flows"),
    )
    slot_aggs = [
        F.coalesce(
            F.sum(F.when(F.hour(F.col("wts")) == h, F.col("flows"))), F.lit(0)
        ).alias(f"h{h}")
        for h in range(24)
    ]
    return (
        hourly.groupBy(F.date_trunc("day", F.col("wts")).alias("day"), "src_ip")
        .agg(*slot_aggs)
        .select(
            F.unix_millis(F.col("day")).alias("day_ms"),
            "src_ip",
            *[f"h{h}" for h in range(24)],
        )
    )
