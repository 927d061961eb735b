"""dns_statistics — 7 DNS statistics in one pass via explode fan-out.

Spark-first re-expression of reference
``applications/statistics/dns_statistics/spark/dns_statistics.py``. The
reference flatMapped each flow into 0..7 ``((key, stat_type), 1)`` pairs
(:169-219, A11), reduced them (:254-260), regrouped per type in the driver
(:63-93, O3) and truncated to the top 100 (:86-90, A10). Here the fan-out
is `explode(array(struct(...)))` with `when()` guards — one scan, one
shuffle — followed by a rank-window top-100 per stat type.

Stat types (reference :169-219): queried_domain, nonexisting_domain,
response_code, record_type, queried_local, external_dns, queried_by_ip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.dns import (
    dns_is_query,
    dns_is_response,
    dns_rcode,
    is_domain_in_list,
    qtype_name,
    rcode_name,
)
from stream4flow_spark.functions.net import ip_in_cidr
from stream4flow_spark.operators.topk import top_k_per_key


def dns_statistics(
    flows: DataFrame,
    local_cidr: str = "10.0.0.0/16",
    window_duration: str = "60 seconds",
    top: int | None = 100,
    filtered_domains: list[str] | None = None,
) -> DataFrame:
    """Output: window_start_ms, stat_type, key, value (count), rank."""
    dns = flows.filter(
        # F1 presence gate (reference :251) + F7-ish port filter
        F.col(S.DNS_NAME).isNotNull() & (F.col(S.DST_PORT) == 53)
    ).select(
        F.timestamp_millis(F.col(S.T_START)).alias("ts"),
        F.col(S.SRC_IP4).alias("src_ip"),
        F.col(S.DST_IP4).alias("dst_ip"),
        F.col(S.DNS_NAME).alias("domain"),
        F.col(S.DNS_QTYPE).alias("qtype"),
        F.col(S.DNS_FLAGS).alias("flags"),
    )

    # materialize the CIDR predicates as projected columns: inlined as
    # Column trees they are re-evaluated per fan-out arm inside the
    # explode (src 3x, dst 2x — each evaluation is an rlike + 4
    # split/try_cast passes over the ip string; the r15 before-plan
    # shows the whole subtree copied into every Generate branch). A
    # projected alias is computed once per row and referenced by
    # attribute from the generator (guide §1.2 step 2 — same
    # multiplicative-inlining fix as net_cidr_v6_classify's _let, but
    # codegen-friendly: a plain Project, no interpreted HOF).
    dns = dns.withColumns(
        {
            "src_local": ip_in_cidr(F.col("src_ip"), local_cidr),
            "dst_local": ip_in_cidr(F.col("dst_ip"), local_cidr),
        }
    )
    src_local = F.col("src_local")
    dst_local = F.col("dst_local")
    is_q = dns_is_query(F.col("flags"))
    is_r = dns_is_response(F.col("flags"))
    not_filtered = ~is_domain_in_list(F.col("domain"), filtered_domains or [])

    def stat(tag: str, cond: Column, key: Column) -> Column:
        """One fan-out arm: NULL when the guard fails (filtered post-explode)."""
        return F.when(
            cond & key.isNotNull(),
            F.struct(F.lit(tag).alias("stat_type"), key.alias("key")),
        )

    arms = F.array(
        stat("queried_domain", is_q & not_filtered, F.col("domain")),
        stat("nonexisting_domain", is_r & (dns_rcode(F.col("flags")) == 3), F.col("domain")),
        stat("response_code", is_r, rcode_name(dns_rcode(F.col("flags")))),
        stat("record_type", is_q, qtype_name(F.col("qtype"))),
        stat("queried_local", is_q & src_local & dst_local, F.col("domain")),
        stat("external_dns", is_q & src_local & ~dst_local, F.col("dst_ip")),
        stat("queried_by_ip", is_q & src_local, F.col("src_ip")),
    )

    counted = (
        dns.select("ts", F.explode(arms).alias("s"))  # A11 fan-out
        .filter(F.col("s").isNotNull())
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("s.stat_type").alias("stat_type"),
            F.col("s.key").alias("key"),
        )
        .agg(F.count("*").alias("value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "stat_type",
            "key",
            "value",
        )
    )
    # top=None → the streamable core (no rank window; in streaming the
    # top-N runs on the result store via plans.readside, not in-stream)
    if top is None:
        return counted
    # A10 top-N per stat type within each window (reference kept top 100)
    return top_k_per_key(
        counted,
        key_cols=["window_start_ms", "stat_type"],
        order_col="value",
        k=top,
        tiebreak_cols=["key"],
    )
