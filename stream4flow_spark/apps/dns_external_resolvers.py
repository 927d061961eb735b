"""dns_external_resolvers — clients using DNS servers outside the network,
confirmed by a follow-up connection to the resolved address.

Spark-first re-expression of reference
``applications/detection/dns_external_resolvers/spark/dns_external_resolvers.py``:
A-record answers from external resolvers are joined with TCP flows on
(client, resolved IP) keeping pairs within a time proximity
(:149-166, J4) — the canonical interval join, implemented scalably by
operators.interval_join (bucketized, not key-cartesian). Answer rows are
deduplicated on (client, resolved, ts) first (:155, A15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.dns import decode_rdata_ipv4, dns_is_response
from stream4flow_spark.functions.net import ip_in_cidr
from stream4flow_spark.operators.interval_join import interval_join


def dns_external_resolvers(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    proximity_ms: int = 5_000,
) -> DataFrame:
    """Output: client_ip, resolver_ip, pairs (matched answer→connection
    count)."""
    answers = (
        flows.filter(
            F.col(S.DNS_FLAGS).isNotNull()
            & dns_is_response(F.col(S.DNS_FLAGS))
            & (F.col(S.DNS_CRR_TYPE) == 1)
            & F.col(S.DNS_RDATA).isNotNull()
            & F.col(S.SRC_IP4).isNotNull()
            & F.col(S.DST_IP4).isNotNull()
            # external resolver (reference :189-191)
            & ~ip_in_cidr(F.col(S.DST_IP4), local_cidr)
        )
        .select(
            F.col(S.SRC_IP4).alias("client_ip"),
            F.col(S.DST_IP4).alias("resolver_ip"),
            decode_rdata_ipv4(F.col(S.DNS_RDATA)).alias("resolved_ip"),
            F.col(S.T_START).alias("answer_ms"),
        )
        # A15 — dedup over the full key so the survivor is deterministic
        .dropDuplicates(["client_ip", "resolver_ip", "resolved_ip", "answer_ms"])
    )

    tcp = flows.filter(
        (F.col(S.PROTO) == 6)
        & F.col(S.SRC_IP4).isNotNull()
        & F.col(S.DST_IP4).isNotNull()
    ).select(
        F.col(S.SRC_IP4).alias("client_ip"),
        F.col(S.DST_IP4).alias("resolved_ip"),
        F.col(S.T_START).alias("conn_ms"),
    )

    matched = interval_join(
        answers,
        tcp,
        on=["client_ip", "resolved_ip"],
        left_ts_ms="answer_ms",
        right_ts_ms="conn_ms",
        tolerance_ms=proximity_ms,
    )

    return (
        matched.groupBy("client_ip", "resolver_ip")
        .agg(F.count("*").alias("pairs"))
    )


def dns_external_resolvers_stream(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    proximity_ms: int = 5_000,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming form: the answers⋈connections interval join runs as a
    native stream-stream join (streaming.joins) and feeds a windowed
    per-(client, resolver) count — two stacked stateful operators, legal
    in append mode because the join output keeps the answer's event time.
    The reference could only pair answer and connection if they landed in
    the same micro-batch (dns_external_resolvers.py:149-166); this pairs
    across the full proximity window, fault-tolerantly. Output adds
    window_start_ms (the batch twin aggregates globally; in streaming an
    unwindowed aggregate would never finalize)."""
    from stream4flow_spark.streaming.joins import stream_interval_join

    answers = (
        flows.filter(
            F.col(S.DNS_FLAGS).isNotNull()
            & dns_is_response(F.col(S.DNS_FLAGS))
            & (F.col(S.DNS_CRR_TYPE) == 1)
            & F.col(S.DNS_RDATA).isNotNull()
            & F.col(S.SRC_IP4).isNotNull()
            & F.col(S.DST_IP4).isNotNull()
            & ~ip_in_cidr(F.col(S.DST_IP4), local_cidr)
        )
        .select(
            F.col(S.SRC_IP4).alias("client_ip"),
            F.col(S.DST_IP4).alias("resolver_ip"),
            decode_rdata_ipv4(F.col(S.DNS_RDATA)).alias("resolved_ip"),
            F.col(S.T_START).alias("answer_ms"),
        )
    )
    tcp = flows.filter(
        (F.col(S.PROTO) == 6)
        & F.col(S.SRC_IP4).isNotNull()
        & F.col(S.DST_IP4).isNotNull()
    ).select(
        F.col(S.SRC_IP4).alias("client_ip"),
        F.col(S.DST_IP4).alias("resolved_ip"),
        F.col(S.T_START).alias("conn_ms"),
    )
    matched = stream_interval_join(
        answers,
        tcp,
        on=["client_ip", "resolved_ip"],
        left_ts_ms="answer_ms",
        right_ts_ms="conn_ms",
        tolerance_ms=proximity_ms,
        watermark_delay=watermark_delay,
        event_time_col="ts",  # watermark lineage for the downstream agg
    )
    return (
        matched
        .groupBy(F.window("ts", window_duration).alias("w"), "client_ip", "resolver_ip")
        .agg(F.count("*").alias("pairs"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "client_ip",
            "resolver_ip",
            "pairs",
        )
    )
