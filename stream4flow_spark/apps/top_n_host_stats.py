"""top_n_host_stats — per-host top-N dst ports / peers / HTTP hosts.

Spark-first re-expression of reference
``applications/statistics/hosts_statistics/spark/top_n_host_stats.py``.
The reference built three keyed count pipelines (:171-198), wrapped counts
into per-key Python lists (A8), chained two joins (:201-205, J1), then
sorted and truncated each list in the DRIVER (:55-61,124 — A9). Here each
family is a grouped count + rank-over-window (row_number ≤ N) that stays
distributed, and the three families are unioned with a `stat_type` tag
instead of joined — no driver collect, no join at all.

Also fixes (SURVEY §7.2a): the reference's output loop overwrote
`results_output` per host and only ever emitted the LAST host; here every
host is emitted.

Scale: two shuffles per family (count, then rank partitioned by host).
Rank windows partition by (window, src_ip) — high cardinality, no skew
concentration; nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import ip_coalesce, ip_in_cidr
from stream4flow_spark.operators.topk import top_k_per_key


def top_n_host_stats(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    window_duration: str = "10 seconds",
    n: int = 10,
) -> DataFrame:
    """Output: window_start_ms, src_ip, stat_type ∈ {dst_ports, dst_hosts,
    http_hosts}, key STRING, flows BIGINT, rank INT."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    dst = ip_coalesce(F.col(S.DST_IP4), F.col(S.DST_IP6))

    base = flows.filter(ip_in_cidr(F.col(S.SRC_IP4), local_cidr)).select(
        F.timestamp_millis(F.col(S.T_START)).alias("ts"),
        src.alias("src_ip"),
        dst.alias("dst_ip"),
        F.col(S.DST_PORT).cast("string").alias("dst_port"),
        F.col(S.HTTP_HOST).alias("http_host"),
    )

    def family(key_expr: str, tag: str, extra_filter=None) -> DataFrame:
        fam = base if extra_filter is None else base.filter(extra_filter)
        counted = (
            fam.filter(F.col(key_expr).isNotNull())
            # A7 grouped count on composite key (reference :171-194)
            .groupBy(F.window("ts", window_duration).alias("w"), "src_ip", key_expr)
            .agg(F.count("*").alias("flows"))
            .select(
                F.unix_millis(F.col("w.start")).alias("window_start_ms"),
                "src_ip",
                F.col(key_expr).alias("key"),
                "flows",
            )
        )
        # A9 top-K per key via rank window (replaces driver-side sort)
        ranked = top_k_per_key(
            counted,
            key_cols=["window_start_ms", "src_ip"],
            order_col="flows",
            k=n,
            tiebreak_cols=["key"],
        )
        return ranked.select(
            "window_start_ms",
            "src_ip",
            F.lit(tag).alias("stat_type"),
            "key",
            "flows",
            "rank",
        )

    ports = family("dst_port", "dst_ports")
    peers = family("dst_ip", "dst_hosts")
    http = family("http_host", "http_hosts")
    # J6 union of the three stat families (tagged, not joined)
    return ports.unionByName(peers).unionByName(http)
