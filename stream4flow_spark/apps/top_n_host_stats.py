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

Scale: ONE scan (the three stat families fan out via explode, A11-style)
and two shuffles total — count keyed by (window, host, stat_type, key),
then rank partitioned by (window, host, stat_type). High-cardinality
partitions, no skew concentration, nothing global.
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
    n: int | None = 10,
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

    # A11-style explode fan-out: ONE scan and one count/rank pipeline for
    # all three stat families (tagged rows, J6 semantics), instead of
    # three family pipelines (3 scans + 6 shuffles → 1 scan + 2 shuffles).
    arms = F.array(
        F.struct(F.lit("dst_ports").alias("stat_type"), F.col("dst_port").alias("key")),
        F.struct(F.lit("dst_hosts").alias("stat_type"), F.col("dst_ip").alias("key")),
        F.struct(F.lit("http_hosts").alias("stat_type"), F.col("http_host").alias("key")),
    )
    counted = (
        base.select("ts", "src_ip", F.explode(arms).alias("a"))
        .filter(F.col("a.key").isNotNull())
        # A7 grouped count on composite key (reference :171-194)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "src_ip",
            F.col("a.stat_type").alias("stat_type"),
            F.col("a.key").alias("key"),
        )
        .agg(F.count("*").alias("flows"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "src_ip",
            "stat_type",
            "key",
            "flows",
        )
    )
    # n=None → the streamable core (rank windows are unsupported on
    # streaming DataFrames; in streaming the top-N runs on the drained
    # result table / read-side instead — same split as dns_statistics)
    if n is None:
        return counted
    # A9 top-K per key via rank window (replaces driver-side sort)
    return top_k_per_key(
        counted,
        key_cols=["window_start_ms", "src_ip", "stat_type"],
        order_col="flows",
        k=n,
        tiebreak_cols=["key"],
    ).select("window_start_ms", "src_ip", "stat_type", "key", "flows", "rank")


def to_ranked_map(stats: DataFrame) -> DataFrame:
    """O4 — the reference emitted each host's top-N as an INDEXED DICT
    ``{"0": item, "1": item, ...}`` (top_n_host_stats.py:64-77); here a
    map column keyed by rank-1, built distributed via map_from_entries
    over the ranked rows."""
    entry = F.struct(
        (F.col("rank") - 1).cast("string").alias("key"),
        F.struct("key", "flows").alias("value"),
    )
    return (
        stats.groupBy("window_start_ms", "src_ip", "stat_type")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(entry))).alias("ranked"))
    )
