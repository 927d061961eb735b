"""dns_open_resolvers — resolvers answering from outside whitelisted nets.

Spark-first re-expression of reference
``applications/detection/dns_open_resolvers/spark/dns_open_resolvers.py``:
A-record responses (:133-140, F4 bit tests), RData hex→IP decode
(modules/DNSResponseConverter.py:30-72, C8), whitelist filters — domain
regex (:150, C7) and resolver-network membership (:184-186, F5) — then a
per-resolver aggregate. Examples are deterministic ``min`` picks instead
of the reference's keep-first reduce (A15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.dns import decode_rdata_ipv4, dns_is_response
from stream4flow_spark.functions.net import ip_in_cidr


def dns_open_resolvers(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    domain_whitelist_regex: str | None = None,
    window_duration: str = "60 seconds",
) -> DataFrame:
    """Output: window_start_ms, resolver_ip, flows, resolved_data (min
    decoded IPv4), resolved_query (min domain)."""
    responses = flows.filter(
        F.col(S.DNS_FLAGS).isNotNull()
        & dns_is_response(F.col(S.DNS_FLAGS))
        & (F.col(S.DNS_CRR_TYPE) == 1)  # A records (reference :134-137)
        & F.col(S.DNS_RDATA).isNotNull()
        & F.col(S.DST_IP4).isNotNull()
        # resolver outside the whitelisted network → open (reference :184-186)
        & ~ip_in_cidr(F.col(S.DST_IP4), local_cidr)
    )
    if domain_whitelist_regex:
        # C7 — whitelist regex built from file (reference :207-216)
        responses = responses.filter(~F.col(S.DNS_CRR_NAME).rlike(domain_whitelist_regex))

    return (
        responses.select(
            F.timestamp_millis(F.col(S.T_START)).alias("ts"),
            F.col(S.DST_IP4).alias("resolver_ip"),
            decode_rdata_ipv4(F.col(S.DNS_RDATA)).alias("resolved"),  # C8
            F.col(S.DNS_CRR_NAME).alias("domain"),
        )
        .groupBy(F.window("ts", window_duration).alias("w"), "resolver_ip")
        .agg(
            F.count("*").alias("flows"),
            F.min("resolved").alias("resolved_data"),
            F.min("domain").alias("resolved_query"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "resolver_ip",
            "flows",
            "resolved_data",
            "resolved_query",
        )
    )
