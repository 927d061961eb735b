"""ports_scan — horizontal + vertical TCP SYN-scan detection.

Spark-first re-expression of reference
``applications/detection/ports_scan/spark/ports_scan.py``: SYN-only filter
(:176-177, F3 bitmask), horizontal candidates keyed (src, dst_port) across
distinct target IPs and vertical candidates keyed (src, dst_ip) across
distinct ports (:180-208), threshold HAVING (:209-218, F10), union (J6).

The reference deduplicated targets by substring containment on a
comma-joined string, so port "80" suppressed "8080" and the target/
duration counts were wrong (:202-208, SURVEY §7.2b). Here distinctness is
a true ``countDistinct`` and the target list a sorted ``collect_set``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import ip_coalesce
from stream4flow_spark.operators.window_agg import with_window_start_ms


def ports_scan(
    flows: DataFrame,
    window_duration: str | None = "60 seconds",
    min_targets: int = 20,
) -> DataFrame:
    """Output: window_start_ms, scan_type ∈ {horizontal, vertical}, src_ip,
    key (scanned port / victim ip), flows, targets, targets_list,
    duration_ms."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    dst = ip_coalesce(F.col(S.DST_IP4), F.col(S.DST_IP6))
    syn_only = (
        # F3 — SYN and nothing else in the low 5 flag bits (reference :176-177)
        (F.col(S.PROTO) == 6)
        & (F.col(S.TCP_FLAGS).bitwiseAND(31) == 2)
    )
    base = with_window_start_ms(
        flows.filter(syn_only & F.col(S.DST_IP4).isNotNull()),
        S.T_START,
        window_duration,
    ).select(
        "window_start_ms",
        src.alias("src_ip"),
        dst.alias("dst_ip"),
        F.col(S.DST_PORT).cast("string").alias("dst_port"),
        (F.col(S.T_END) - F.col(S.T_START)).alias("duration_ms"),
    )

    def candidates(key_col: str, target_col: str, tag: str) -> DataFrame:
        return (
            base.groupBy("window_start_ms", "src_ip", key_col)
            .agg(
                F.count("*").alias("flows"),
                # A14 fixed: sorted distinct list; the distinct count is
                # the set's size — a separate countDistinct would add an
                # Expand pass in batch and is flatly unsupported in
                # streaming aggregation
                F.sort_array(F.collect_set(target_col)).alias("target_set"),
                F.sum("duration_ms").alias("duration_ms"),
            )
            .withColumn("targets", F.size("target_set").cast("long"))
            .withColumn("targets_list", F.concat_ws(",", "target_set"))
            .filter(F.col("targets") >= min_targets)  # F10 (reference :209-218)
            .select(
                "window_start_ms",
                F.lit(tag).alias("scan_type"),
                "src_ip",
                F.col(key_col).alias("key"),
                "flows",
                "targets",
                "targets_list",
                "duration_ms",
            )
        )

    horizontal = candidates("dst_port", "dst_ip", "horizontal")
    vertical = candidates("dst_ip", "dst_port", "vertical")
    return horizontal.unionByName(vertical)  # J6
