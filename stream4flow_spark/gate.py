"""Gate queries — one entry per implemented operator family.

Each entry pairs a Spark DataFrame pipeline with a DuckDB oracle over the
same inputs. Flow-domain queries run on the deterministic `flows`
derivation (fixtures.flows) so the oracle and the engine see bit-identical
input. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream4flow_spark.apps.dns_statistics import dns_statistics
from stream4flow_spark.apps.host_daily_profile import host_daily_profile
from stream4flow_spark.apps.host_stats import host_stats
from stream4flow_spark.apps.protocols_statistics import protocols_statistics
from stream4flow_spark.apps.tls_classification import tls_classification
from stream4flow_spark.apps.top_n_host_stats import top_n_host_stats
from stream4flow_spark.fixtures.flows import flows_df, oracle_query
from stream4flow_spark.registry import register

HOUR_MS = 3_600_000
DAY_MS = 86_400_000

# Oracle-side equivalents over the derived flows (see fixtures.flows for
# why LIKE '10.0.%' is an exact stand-in for the 10.0.0.0/16 CIDR check on
# this data — boundary behavior is unit-tested in tests/test_functions.py).
_T = "ipfix_flowStartMilliseconds"
_SRC_LOCAL = "ipfix_sourceIPv4Address LIKE '10.0.%'"
_DST_LOCAL = "ipfix_destinationIPv4Address LIKE '10.0.%'"


def _win(col: str, ms: int = HOUR_MS) -> str:
    return f"{col} - {col} % {ms}"


@register(
    "protocols_statistics",
    covers="S2 F1 C1 A1 A2 W1 O1",
    oracle=oracle_query(
        f"""
        SELECT {_win('ipfix_flowStartMilliseconds')} AS window_start_ms,
               CASE ipfix_protocolIdentifier WHEN 6 THEN 'tcp'
                    WHEN 17 THEN 'udp' ELSE 'other' END AS protocol,
               CAST(COUNT(*) AS BIGINT) AS flows,
               CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets,
               CAST(SUM(ipfix_octetDeltaCount) AS BIGINT) AS bytes
        FROM flows
        WHERE ipfix_packetDeltaCount IS NOT NULL
          AND ipfix_octetDeltaCount IS NOT NULL
        GROUP BY 1, 2
        """
    ),
)
def q_protocols_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return protocols_statistics(flows_df(spark, sf_dir), "1 hour")


_FLAG_SUMS = ",\n               ".join(
    f"CAST(SUM((ipfix_tcpControlBits >> {i}) & 1) AS BIGINT) AS f_{n}"
    for i, n in enumerate(["fin", "syn", "rst", "psh", "ack", "urg", "ece", "cwr"])
)


@register(
    "host_stats",
    covers="F1 F5 C2 C3 C18 A1 A3 A4 A5 J2 W2 O2",
    oracle=oracle_query(
        f"""
        SELECT {_win(_T)} AS window_start_ms,
               ipfix_sourceIPv4Address AS src_ip,
               CAST(COUNT(*) AS BIGINT) AS flows,
               CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets,
               CAST(SUM(ipfix_octetDeltaCount) AS BIGINT) AS bytes,
               CAST(SUM(ipfix_flowEndMilliseconds - ipfix_flowStartMilliseconds) AS DOUBLE)
                 / COUNT(*) AS avg_duration_ms,
               CAST(COUNT(DISTINCT ipfix_destinationTransportPort) AS BIGINT) AS dport_count,
               CAST(COUNT(DISTINCT COALESCE(ipfix_destinationIPv4Address,
                                            ipfix_destinationIPv6Address)) AS BIGINT) AS peer_number,
               {_FLAG_SUMS}
        FROM flows
        WHERE ipfix_packetDeltaCount IS NOT NULL
          AND ipfix_octetDeltaCount IS NOT NULL
          AND {_SRC_LOCAL}
        GROUP BY 1, 2
        """
    ),
)
def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return host_stats(flows_df(spark, sf_dir), window_duration="1 hour")


@register(
    "top_n_host_stats",
    covers="F1 F5 A7 A8 A9 J1 J6 O4",
    oracle=oracle_query(
        f"""
        WITH counted AS (
            SELECT {_win(_T)} AS window_start_ms,
                   ipfix_sourceIPv4Address AS src_ip,
                   'dst_ports' AS stat_type,
                   CAST(ipfix_destinationTransportPort AS STRING) AS key,
                   CAST(COUNT(*) AS BIGINT) AS flows
            FROM flows WHERE {_SRC_LOCAL} AND ipfix_destinationTransportPort IS NOT NULL
            GROUP BY 1, 2, 4
            UNION ALL
            SELECT {_win(_T)}, ipfix_sourceIPv4Address, 'dst_hosts',
                   COALESCE(ipfix_destinationIPv4Address, ipfix_destinationIPv6Address),
                   CAST(COUNT(*) AS BIGINT)
            FROM flows WHERE {_SRC_LOCAL}
              AND COALESCE(ipfix_destinationIPv4Address, ipfix_destinationIPv6Address) IS NOT NULL
            GROUP BY 1, 2, 4
            UNION ALL
            SELECT {_win(_T)}, ipfix_sourceIPv4Address, 'http_hosts',
                   ipfix_HTTPRequestHost, CAST(COUNT(*) AS BIGINT)
            FROM flows WHERE {_SRC_LOCAL} AND ipfix_HTTPRequestHost IS NOT NULL
            GROUP BY 1, 2, 4
        ),
        ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
                       PARTITION BY window_start_ms, src_ip, stat_type
                       ORDER BY flows DESC, key ASC) AS INT) AS rank
            FROM counted
        )
        SELECT window_start_ms, src_ip, stat_type, key, flows, rank
        FROM ranked WHERE rank <= 10
        """
    ),
)
def q_top_n_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_n_host_stats(flows_df(spark, sf_dir), window_duration="1 hour", n=10)


_DNS_BASE = f"""
        dns AS (
            SELECT {_win(_T)} AS window_start_ms,
                   ipfix_sourceIPv4Address AS src_ip,
                   ipfix_destinationIPv4Address AS dst_ip,
                   ipfix_DNSName AS domain,
                   ipfix_DNSQType AS qtype,
                   (ipfix_DNSFlagsCodes >> 15) & 1 = 1 AS is_r,
                   ipfix_DNSFlagsCodes & 15 AS rcode
            FROM flows
            WHERE ipfix_DNSName IS NOT NULL AND ipfix_destinationTransportPort = 53
        ),
        arms AS (
            SELECT window_start_ms, 'queried_domain' AS stat_type, domain AS key
            FROM dns WHERE NOT is_r AND NOT (domain LIKE '%dom1.%')
            UNION ALL
            SELECT window_start_ms, 'nonexisting_domain', domain
            FROM dns WHERE is_r AND rcode = 3
            UNION ALL
            SELECT window_start_ms, 'response_code',
                   CASE rcode WHEN 0 THEN 'NoError' WHEN 1 THEN 'FormErr'
                        WHEN 2 THEN 'ServFail' WHEN 3 THEN 'NXDomain'
                        WHEN 4 THEN 'NotImp' WHEN 5 THEN 'Refused' ELSE 'Other' END
            FROM dns WHERE is_r
            UNION ALL
            SELECT window_start_ms, 'record_type',
                   CASE qtype WHEN 1 THEN 'A' WHEN 2 THEN 'NS' WHEN 5 THEN 'CNAME'
                        WHEN 15 THEN 'MX' WHEN 16 THEN 'TXT' WHEN 28 THEN 'AAAA'
                        ELSE 'OTHER' END
            FROM dns WHERE NOT is_r AND qtype IS NOT NULL
            UNION ALL
            SELECT window_start_ms, 'queried_local', domain
            FROM dns WHERE NOT is_r AND src_ip LIKE '10.0.%' AND dst_ip LIKE '10.0.%'
            UNION ALL
            SELECT window_start_ms, 'external_dns', dst_ip
            FROM dns WHERE NOT is_r AND src_ip LIKE '10.0.%' AND NOT (dst_ip LIKE '10.0.%')
            UNION ALL
            SELECT window_start_ms, 'queried_by_ip', src_ip
            FROM dns WHERE NOT is_r AND src_ip LIKE '10.0.%'
        )
"""


@register(
    "dns_statistics",
    covers="F1 F4 F5 C4 C5 C6 A10 A11 O3 W1",
    oracle=oracle_query(
        f"""
        WITH {_DNS_BASE},
        counted AS (
            SELECT window_start_ms, stat_type, key, CAST(COUNT(*) AS BIGINT) AS value
            FROM arms WHERE key IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
                       PARTITION BY window_start_ms, stat_type
                       ORDER BY value DESC, key ASC) AS INT) AS rank
            FROM counted
        )
        SELECT window_start_ms, stat_type, key, value, rank
        FROM ranked WHERE rank <= 100
        """
    ),
)
def q_dns_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dns_statistics(
        flows_df(spark, sf_dir),
        window_duration="1 hour",
        top=100,
        filtered_domains=["dom1."],
    )


@register(
    "tls_classification",
    covers="S5 S6 C9 C10 A6 J1 J6 O3",
    oracle=oracle_query(
        f"""
        WITH tls AS (
            SELECT {_win(_T)} AS window_start_ms,
                   CASE ipfix_TLSClientCipherSuites
                        WHEN '0x2bc0' THEN 'c02b'
                        WHEN '0x2fc01301' THEN 'c02f,0113'
                        WHEN '0x1413' THEN '1314' END AS suites
            FROM flows
            WHERE ipfix_TLSClientCipherSuites IS NOT NULL
        ),
        dim (suites, operating_system, application, browser) AS (
            VALUES ('c02b', 'Linux', 'Web browser', 'Firefox'),
                   ('c02f,0113', 'Windows', 'Web browser', 'Chrome'),
                   ('1314', 'Android', 'Application', 'Unknown')
        ),
        joined AS (
            SELECT t.window_start_ms, d.operating_system, d.application, d.browser
            FROM tls t LEFT JOIN dim d USING (suites)
            WHERE t.suites IS NOT NULL
        ),
        arms AS (
            SELECT window_start_ms, 'os' AS stat_type,
                   COALESCE(operating_system, 'Unknown') AS key FROM joined
            UNION ALL
            SELECT window_start_ms, 'browser', COALESCE(browser, 'Unknown') FROM joined
            UNION ALL
            SELECT window_start_ms, 'application', COALESCE(application, 'Unknown') FROM joined
        )
        SELECT window_start_ms, stat_type, key, CAST(COUNT(*) AS BIGINT) AS value
        FROM arms GROUP BY 1, 2, 3
        """
    ),
)
def q_tls_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream4flow_spark.functions.tls import tls_dimension

    return tls_classification(
        flows_df(spark, sf_dir), tls_dimension(spark), window_duration="1 hour"
    )


_H_SLOTS = ",\n               ".join(
    f"CAST(COALESCE(SUM(CASE WHEN hr = {h} THEN flows END), 0) AS BIGINT) AS h{h}"
    for h in range(24)
)


@register(
    "host_daily_profile",
    covers="A16 W4 W6 S7",
    oracle=oracle_query(
        f"""
        WITH hourly AS (
            SELECT {_win(_T, DAY_MS)} AS day_ms,
                   ({_T} % {DAY_MS}) // {HOUR_MS} AS hr,
                   ipfix_sourceIPv4Address AS src_ip,
                   COUNT(*) AS flows
            FROM flows WHERE {_SRC_LOCAL}
            GROUP BY 1, 2, 3
        )
        SELECT day_ms, src_ip,
               {_H_SLOTS}
        FROM hourly GROUP BY 1, 2
        """
    ),
)
def q_host_daily_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return host_daily_profile(flows_df(spark, sf_dir))
