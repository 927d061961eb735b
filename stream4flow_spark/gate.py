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
from stream4flow_spark.fixtures.flows import LOCAL_CIDR, flows_df, oracle_query
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


# --------------------------------------------------------------------------
# Detection tier. Detection thresholds are tuned to the derived-flows data
# so the gate queries produce non-empty results at sf≥0.01 (each app's
# reference-default thresholds stay the function defaults; scenario-shaped
# threshold behavior is unit-tested against hand-built fixtures).
# --------------------------------------------------------------------------

from stream4flow_spark.apps.detection_ddos import detection_ddos  # noqa: E402
from stream4flow_spark.apps.dns_external_resolvers import dns_external_resolvers  # noqa: E402
from stream4flow_spark.apps.dns_open_resolvers import dns_open_resolvers  # noqa: E402
from stream4flow_spark.apps.ports_scan import ports_scan  # noqa: E402
from stream4flow_spark.apps.reflect_ddos import reflect_ddos  # noqa: E402
from stream4flow_spark.apps.ssh_auth_simple import ssh_auth_simple  # noqa: E402

_COAL_SRC = "COALESCE(ipfix_sourceIPv4Address, ipfix_sourceIPv6Address)"
_COAL_DST = "COALESCE(ipfix_destinationIPv4Address, ipfix_destinationIPv6Address)"


@register(
    "ssh_auth_simple",
    covers="F2 C2 C18 A12 F10 W2",
    oracle=oracle_query(
        f"""
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS window_start_ms,
                   {_COAL_SRC} AS src_ip,
                   {_COAL_DST} AS dst_ip,
                   CAST(COUNT(*) AS BIGINT) AS flows,
                   CAST(SUM(ipfix_packetDeltaCount) AS DOUBLE) / COUNT(*) AS avg_packet_count,
                   CAST(SUM(ipfix_flowEndMilliseconds - ipfix_flowStartMilliseconds) AS BIGINT) AS duration_ms
            FROM flows
            WHERE ipfix_protocolIdentifier = 6 AND ipfix_destinationTransportPort = 22
              AND ipfix_sourceTransportPort > 1024
              AND ipfix_packetDeltaCount > 1 AND ipfix_packetDeltaCount < 200
              AND ipfix_octetDeltaCount > 40 AND ipfix_octetDeltaCount < 30000
              AND (ipfix_flowEndMilliseconds - ipfix_flowStartMilliseconds) < 12000
            GROUP BY 2, 3
        ) WHERE flows >= 2
        """
    ),
)
def q_ssh_auth_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ssh_auth_simple(
        flows_df(spark, sf_dir),
        window_duration=None,
        min_flows=2,
        packets_band=(1, 200),
        bytes_band=(40, 30000),
    )


@register(
    "ports_scan",
    covers="F3 A14 A15 F10 J6 ST1",
    oracle=oracle_query(
        f"""
        WITH pscan AS (
            SELECT {_COAL_SRC} AS src_ip,
                   {_COAL_DST} AS dst_ip,
                   CAST(ipfix_destinationTransportPort AS STRING) AS dst_port,
                   ipfix_flowEndMilliseconds - ipfix_flowStartMilliseconds AS duration_ms
            FROM flows
            WHERE ipfix_protocolIdentifier = 6 AND (ipfix_tcpControlBits & 31) = 2
              AND ipfix_destinationIPv4Address IS NOT NULL
        ),
        horizontal AS (
            SELECT CAST(0 AS BIGINT) AS window_start_ms, 'horizontal' AS scan_type,
                   src_ip, dst_port AS key,
                   CAST(COUNT(*) AS BIGINT) AS flows,
                   CAST(COUNT(DISTINCT dst_ip) AS BIGINT) AS targets,
                   array_to_string(list_sort(array_agg(DISTINCT dst_ip)), ',') AS targets_list,
                   CAST(SUM(duration_ms) AS BIGINT) AS duration_ms
            FROM pscan GROUP BY src_ip, dst_port
        ),
        vertical AS (
            SELECT CAST(0 AS BIGINT) AS window_start_ms, 'vertical' AS scan_type,
                   src_ip, dst_ip AS key,
                   CAST(COUNT(*) AS BIGINT) AS flows,
                   CAST(COUNT(DISTINCT dst_port) AS BIGINT) AS targets,
                   array_to_string(list_sort(array_agg(DISTINCT dst_port)), ',') AS targets_list,
                   CAST(SUM(duration_ms) AS BIGINT) AS duration_ms
            FROM pscan GROUP BY src_ip, dst_ip
        )
        SELECT * FROM horizontal WHERE targets >= 3
        UNION ALL
        SELECT * FROM vertical WHERE targets >= 3
        """
    ),
)
def q_ports_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ports_scan(flows_df(spark, sf_dir), window_duration=None, min_targets=3)


@register(
    "detection_ddos",
    covers="F6 A13 J3 J6 W3 F10",
    oracle=oracle_query(
        f"""
        WITH c AS (
            SELECT {_win(_T)} AS window_start_ms,
                   ipfix_destinationIPv4Address AS host,
                   ipfix_packetDeltaCount AS inc,
                   CAST(0 AS BIGINT) AS out,
                   ipfix_sourceIPv4Address AS attacker
            FROM flows
            WHERE ipfix_packetDeltaCount IS NOT NULL
              AND ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND regexp_matches(ipfix_destinationIPv4Address, '^10\\.0\\.')
            UNION ALL
            SELECT {_win(_T)}, ipfix_sourceIPv4Address,
                   CAST(0 AS BIGINT), ipfix_packetDeltaCount, NULL
            FROM flows
            WHERE ipfix_packetDeltaCount IS NOT NULL
              AND ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND regexp_matches(ipfix_sourceIPv4Address, '^10\\.0\\.')
        ),
        agg AS (
            SELECT window_start_ms, host,
                   CAST(SUM(inc) AS BIGINT) AS inc,
                   CAST(SUM(out) AS BIGINT) AS out,
                   array_to_string(list_sort(array_agg(DISTINCT attacker)
                       FILTER (attacker IS NOT NULL)), ',') AS attackers,
                   CAST(COUNT(DISTINCT attacker) AS BIGINT) AS attacker_count
            FROM c GROUP BY 1, 2
        ),
        l AS (
            SELECT *,
                   CAST(SUM(inc) OVER w AS BIGINT) AS long_inc,
                   CAST(SUM(out) OVER w AS BIGINT) AS long_out
            FROM agg
            WINDOW w AS (PARTITION BY host ORDER BY window_start_ms
                         RANGE BETWEEN {DAY_MS - HOUR_MS} PRECEDING
                               AND CURRENT ROW)
        )
        SELECT window_start_ms, host AS dst_ip, inc AS packets,
               CAST(inc AS DOUBLE) / out AS shortratio,
               CAST(long_inc AS DOUBLE) / long_out AS longratio,
               attackers, attacker_count
        FROM l
        WHERE out <> 0 AND long_out <> 0 AND inc > 100
          AND CAST(inc AS DOUBLE) / out
              > CAST(long_inc AS DOUBLE) / long_out * 1.2
        """
    ),
)
def q_detection_ddos(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detection_ddos(
        flows_df(spark, sf_dir),
        window_duration="1 hour",
        long_window="1 day",
        network_filter=r"^10\.0\.",
        min_ratio=1.2,
        min_packets=100,
    )


_DNS_SERVERS = ["10.0.3.96", "10.0.2.47", "10.0.0.61"]
_SERVERS_SQL = "('" + "', '".join(_DNS_SERVERS) + "')"


@register(
    "reflect_ddos",
    covers="F2 F7 A1 J6 F10",
    oracle=oracle_query(
        f"""
        WITH u AS (
            SELECT ipfix_destinationIPv4Address AS dns_ip,
                   ipfix_sourceIPv4Address AS client_ip,
                   ipfix_octetDeltaCount AS query_bytes,
                   CAST(0 AS BIGINT) AS reply_bytes, CAST(0 AS BIGINT) AS replies
            FROM flows
            WHERE ipfix_protocolIdentifier = 17
              AND (ipfix_destinationTransportPort = 53 OR ipfix_sourceTransportPort = 53)
              AND ipfix_destinationIPv4Address IN {_SERVERS_SQL}
            UNION ALL
            SELECT ipfix_sourceIPv4Address, ipfix_destinationIPv4Address,
                   CAST(0 AS BIGINT), ipfix_octetDeltaCount, CAST(1 AS BIGINT)
            FROM flows
            WHERE ipfix_protocolIdentifier = 17
              AND (ipfix_destinationTransportPort = 53 OR ipfix_sourceTransportPort = 53)
              AND ipfix_sourceIPv4Address IN {_SERVERS_SQL}
        ),
        agg AS (
            SELECT CAST(0 AS BIGINT) AS window_start_ms, dns_ip, client_ip,
                   CAST(SUM(query_bytes) AS BIGINT) AS data_received,
                   CAST(SUM(reply_bytes) AS BIGINT) AS data_sent,
                   CAST(SUM(replies) AS BIGINT) AS outgoing_connections
            FROM u GROUP BY dns_ip, client_ip
        )
        SELECT *, CAST(data_sent AS DOUBLE) / data_received AS amplification
        FROM agg
        WHERE data_received > 0 AND outgoing_connections >= 1
          AND CAST(data_sent AS DOUBLE) / data_received > 0.5
        """
    ),
)
def q_reflect_ddos(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reflect_ddos(
        flows_df(spark, sf_dir),
        dns_servers=_DNS_SERVERS,
        window_duration=None,
        min_ratio=0.5,
        min_replies=1,
    )


# hex pair -> int, oracle-side (DuckDB lacks conv(); strpos arithmetic)
def _hex2int(expr: str) -> str:
    h = "'0123456789abcdef'"
    return (
        f"((strpos({h}, substr({expr}, 1, 1)) - 1) * 16"
        f" + strpos({h}, substr({expr}, 2, 1)) - 1)"
    )


_DECODED_V4 = (
    f"'10.0.' || CAST({_hex2int('substr(ipfix_DNSRData, 5, 2)')} AS STRING)"
    f" || '.' || CAST({_hex2int('substr(ipfix_DNSRData, 7, 2)')} AS STRING)"
)


@register(
    "dns_open_resolvers",
    covers="F4 F5 C7 C8 A15 W1",
    oracle=oracle_query(
        f"""
        SELECT {_win(_T)} AS window_start_ms,
               ipfix_destinationIPv4Address AS resolver_ip,
               CAST(COUNT(*) AS BIGINT) AS flows,
               MIN({_DECODED_V4}) AS resolved_data,
               MIN(ipfix_DNSCrrName) AS resolved_query
        FROM flows
        WHERE ipfix_DNSFlagsCodes IS NOT NULL
          AND (ipfix_DNSFlagsCodes >> 15) & 1 = 1
          AND ipfix_DNSCrrType = 1 AND ipfix_DNSRData IS NOT NULL
          AND ipfix_destinationIPv4Address IS NOT NULL
          AND NOT (ipfix_destinationIPv4Address LIKE '10.0.%')
          AND NOT regexp_matches(ipfix_DNSCrrName, '\\.local\\.example$')
        GROUP BY 1, 2
        """
    ),
)
def q_dns_open_resolvers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dns_open_resolvers(
        flows_df(spark, sf_dir),
        window_duration="1 hour",
        domain_whitelist_regex=r"\.local\.example$",
    )


@register(
    "dns_external_resolvers",
    covers="J4 A15 F5 ST1",
    oracle=oracle_query(
        f"""
        WITH a AS (
            SELECT DISTINCT ipfix_sourceIPv4Address AS client_ip,
                   ipfix_destinationIPv4Address AS resolver_ip,
                   {_DECODED_V4} AS resolved_ip,
                   ipfix_flowStartMilliseconds AS answer_ms
            FROM flows
            WHERE ipfix_DNSFlagsCodes IS NOT NULL
              AND (ipfix_DNSFlagsCodes >> 15) & 1 = 1
              AND ipfix_DNSCrrType = 1 AND ipfix_DNSRData IS NOT NULL
              AND ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND NOT (ipfix_destinationIPv4Address LIKE '10.0.%')
        )
        SELECT a.client_ip, a.resolver_ip, CAST(COUNT(*) AS BIGINT) AS pairs
        FROM a JOIN flows f
          ON f.ipfix_protocolIdentifier = 6
         AND f.ipfix_sourceIPv4Address = a.client_ip
         AND f.ipfix_destinationIPv4Address = a.resolved_ip
         AND ABS(f.ipfix_flowStartMilliseconds - a.answer_ms) <= 604800000
        GROUP BY 1, 2
        """
    ),
)
def q_dns_external_resolvers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dns_external_resolvers(
        flows_df(spark, sf_dir), proximity_ms=604_800_000
    )


# --------------------------------------------------------------------------
# pattern_finder (config-driven similarity detector) + entropy (C12)
# --------------------------------------------------------------------------

from stream4flow_spark.apps.pattern_finder import (  # noqa: E402
    PatternFinderConfig,
    pattern_finder,
)

_PF_PATTERNS = {"p_big": [100.0, 50.0, 100.0, 50.0], "p_small": [10.0, 5.0, 10.0, 5.0]}
_PF_THRESH = [1.0, 2.0, 4.0, 8.0]
_PF_WEIGHTS = [5, 4, 3, 2, 1]

_PF_VEC_SQL = [
    "CAST(f1.ipfix_packetDeltaCount AS DOUBLE)",
    "CAST(f1.ipfix_octetDeltaCount AS DOUBLE) / 100",
    "CAST(f2.ipfix_packetDeltaCount AS DOUBLE)",
    "CAST(f2.ipfix_octetDeltaCount AS DOUBLE) / 100",
]


def _pf_distance_sql(pattern: list[float]) -> str:
    terms = [
        f"((({v}) - {p}) / {p}) * ((({v}) - {p}) / {p})"
        for v, p in zip(_PF_VEC_SQL, pattern)
    ]
    return f"sqrt({' + '.join(terms)})"


def _pf_arm_sql(name: str, pattern: list[float]) -> str:
    d = _pf_distance_sql(pattern)
    bucket = "CASE "
    for i, t in enumerate(_PF_THRESH):
        bucket += f"WHEN {d} < {t} THEN {i} "
    bucket += f"ELSE {len(_PF_THRESH)} END"
    slots = ", ".join(
        f"CASE WHEN ({bucket}) = {i} THEN {w} ELSE 0 END AS b{i}"
        for i, w in enumerate(_PF_WEIGHTS)
    )
    return f"""
        SELECT f1.ipfix_sourceIPv4Address AS src_ip,
               f1.ipfix_destinationIPv4Address AS dst_ip,
               '{name}' AS pattern, {slots}
        FROM tcp f1 JOIN tcp f2
          ON f1.ipfix_sourceIPv4Address = f2.ipfix_destinationIPv4Address
         AND f1.ipfix_destinationIPv4Address = f2.ipfix_sourceIPv4Address
         AND f2.ipfix_flowStartMilliseconds > f1.ipfix_flowStartMilliseconds
         AND f2.ipfix_flowStartMilliseconds - f1.ipfix_flowStartMilliseconds <= 86400000
    """


@register(
    "pattern_finder",
    covers="F8 C13 C14 C15 C16 C17 J5 A17 ST3",
    oracle=oracle_query(
        f"""
        WITH tcp AS (
            SELECT * FROM flows
            WHERE ipfix_protocolIdentifier = 6
              AND ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND ipfix_sourceIPv4Address <> ipfix_destinationIPv4Address
        ),
        fanout AS (
            {_pf_arm_sql('p_big', _PF_PATTERNS['p_big'])}
            UNION ALL
            {_pf_arm_sql('p_small', _PF_PATTERNS['p_small'])}
        ),
        summed AS (
            SELECT src_ip, dst_ip, pattern,
                   CAST(COUNT(*) AS BIGINT) AS pairs,
                   CAST(SUM(b0) AS BIGINT) AS b0, CAST(SUM(b1) AS BIGINT) AS b1,
                   CAST(SUM(b2) AS BIGINT) AS b2, CAST(SUM(b3) AS BIGINT) AS b3,
                   CAST(SUM(b4) AS BIGINT) AS b4
            FROM fanout GROUP BY 1, 2, 3
        )
        SELECT *, (b0 + b1 >= 1 AND b0 + b1 > b3 + b4) AS anomaly FROM summed
        """
    ),
)
def q_pattern_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = PatternFinderConfig(
        filters=[[{"element": "ipfix_protocolIdentifier", "type": "eq", "value": 6}]],
        vector=[
            {"kind": "expr", "sql": "req_packets"},
            {"kind": "expr", "sql": "req_bytes / 100"},
            {"kind": "expr", "sql": "rsp_packets"},
            {"kind": "expr", "sql": "rsp_bytes / 100"},
        ],
        patterns=_PF_PATTERNS,
        thresholds=_PF_THRESH,
        weights=_PF_WEIGHTS,
        time_difference_ms=86_400_000,
        anomaly_limit=1,
    )
    return pattern_finder(flows_df(spark, sf_dir), cfg)


@register(
    "domain_entropy",
    covers="C12",
    oracle=oracle_query(
        """
        WITH doms AS (
            SELECT DISTINCT ipfix_DNSName AS domain FROM flows
            WHERE ipfix_DNSName IS NOT NULL
        ),
        cnt AS (
            SELECT domain, ch, COUNT(*)::DOUBLE AS c
            FROM (SELECT domain, unnest(string_split(domain, '')) AS ch FROM doms)
            GROUP BY 1, 2
        ),
        tot AS (SELECT domain, SUM(c) AS n FROM cnt GROUP BY 1)
        SELECT cnt.domain, ROUND(-SUM((c / n) * log2(c / n)), 6) AS entropy
        FROM cnt JOIN tot USING (domain) GROUP BY 1
        """
    ),
)
def q_domain_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from stream4flow_spark import schema as S
    from stream4flow_spark.functions.textfn import element_entropy

    return (
        flows_df(spark, sf_dir)
        .filter(F.col(S.DNS_NAME).isNotNull())
        .select(F.col(S.DNS_NAME).alias("domain"))
        .distinct()
        .select("domain", F.round(element_entropy(F.col("domain")), 6).alias("entropy"))
    )


@register(
    "iso_timestamps",
    covers="C11",
    oracle=oracle_query(
        f"""
        SELECT DISTINCT {_win(_T)} AS window_start_ms,
               strftime(epoch_ms({_win(_T)}), '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso_ts
        FROM flows
        """
    ),
)
def q_iso_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — every alert/report timestamp the reference emitted was
    unix-ms rendered as ISO-8601 'Z' (ports_scan.py:93-94 and twins)."""
    import pyspark.sql.functions as F

    from stream4flow_spark import schema as S
    from stream4flow_spark.functions.net import ms_to_iso

    win = (F.col(S.T_START) - F.col(S.T_START) % HOUR_MS).alias("window_start_ms")
    return (
        flows_df(spark, sf_dir)
        .select(win)
        .distinct()
        .select("window_start_ms", ms_to_iso(F.col("window_start_ms")).alias("iso_ts"))
    )


@register(
    "alert_suppression",
    covers="ST1 ST2",
    oracle=oracle_query(
        """
        WITH RECURSIVE alerts AS (
            SELECT ipfix_sourceIPv4Address AS src_ip,
                   ipfix_destinationIPv4Address AS dst_ip,
                   ipfix_flowStartMilliseconds AS ts_ms,
                   ipfix_packetDeltaCount AS packets
            FROM flows
            WHERE ipfix_destinationTransportPort = 22
              AND ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
        ),
        chain AS (
            SELECT src_ip, dst_ip, MIN(ts_ms) AS report_ms, 0 AS report_seq
            FROM alerts GROUP BY 1, 2
            UNION ALL
            SELECT c.src_ip, c.dst_ip,
                   (SELECT MIN(a.ts_ms) FROM alerts a
                     WHERE a.src_ip = c.src_ip AND a.dst_ip = c.dst_ip
                       AND a.ts_ms >= c.report_ms + 3600000),
                   c.report_seq + 1
            FROM chain c
            WHERE EXISTS (SELECT 1 FROM alerts a
                           WHERE a.src_ip = c.src_ip AND a.dst_ip = c.dst_ip
                             AND a.ts_ms >= c.report_ms + 3600000)
        ),
        assigned AS (
            SELECT a.src_ip, a.dst_ip, a.packets,
                   (SELECT MIN(c.report_ms) FROM chain c
                     WHERE c.src_ip = a.src_ip AND c.dst_ip = a.dst_ip
                       AND c.report_ms >= a.ts_ms) AS report_ms
            FROM alerts a
        )
        SELECT c.src_ip, c.dst_ip, c.report_ms AS ts_ms,
               CAST(c.report_seq AS INT) AS report_seq,
               CAST(s.packets AS BIGINT) AS packets
        FROM chain c JOIN (
            SELECT src_ip, dst_ip, report_ms, SUM(packets) AS packets
            FROM assigned WHERE report_ms IS NOT NULL GROUP BY 1, 2, 3
        ) s USING (src_ip, dst_ip, report_ms)
        """
    ),
)
def q_alert_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 report-once-with-increments as a first-class gate query: the
    greedy per-key report chain (reference ports_scan.py:109-141 and
    twins) oracle-checked against a DuckDB RECURSIVE CTE. The recursive
    WITH is the SQL expression of what the reference's driver dict did —
    sequential per key, which is exactly why the Spark side is a
    hash-repartition + partition-chained ``mapInPandas`` scan
    (operators/suppression.py:12-19 — one vectorized call per partition,
    not one applyInPandas call per key) rather than a window function."""
    import pyspark.sql.functions as F

    from stream4flow_spark import schema as S
    from stream4flow_spark.operators.suppression import suppress_reports

    alerts = (
        flows_df(spark, sf_dir)
        .filter(
            (F.col(S.DST_PORT) == 22)
            & F.col(S.SRC_IP4).isNotNull()
            & F.col(S.DST_IP4).isNotNull()
        )
        .select(
            F.col(S.SRC_IP4).alias("src_ip"),
            F.col(S.DST_IP4).alias("dst_ip"),
            F.col(S.T_START).alias("ts_ms"),
            F.col(S.PACKETS).alias("packets"),
        )
    )
    return suppress_reports(
        alerts, ["src_ip", "dst_ip"], "ts_ms", 3_600_000, ["packets"]
    )


@register(
    "application_template",
    covers="S2 O1 template",
    oracle=oracle_query(
        f"""
        SELECT {_win(_T, 60_000)} AS window_start_ms,
               CAST(COUNT(*) AS BIGINT) AS records
        FROM flows GROUP BY 1
        """
    ),
)
def q_application_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream4flow_spark.apps.template import count_by_minute

    return count_by_minute(flows_df(spark, sf_dir))


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Replays operators/pagerank.py CTE-for-CTE: fixed power iterations
    over the distinct src→dst host graph of the derived flows."""
    head = """
        WITH edges AS (
            SELECT DISTINCT ipfix_sourceIPv4Address AS src,
                            ipfix_destinationIPv4Address AS dst
            FROM flows
            WHERE ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
        ),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ),
        outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
        nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        pr0 AS (SELECT node, 1.0 / nv.n AS r FROM nodes, nv)
    """
    steps = []
    for i in range(iterations):
        steps.append(f"""
        pr{i + 1} AS (
            SELECT nodes.node,
                   (1.0 - {damping}) / nv.n
                   + {damping} * COALESCE(c.in_mass, 0.0) AS r
            FROM nodes CROSS JOIN nv
            LEFT JOIN (
                SELECT e.dst AS node, SUM(p.r / od.deg) AS in_mass
                FROM pr{i} p
                JOIN edges e ON p.node = e.src
                JOIN outdeg od ON od.src = e.src
                GROUP BY 1
            ) c ON c.node = nodes.node
        )""")
    tail = f"""
        SELECT node AS host, ROUND(r * 1000, 6) + 0.0 AS pagerank_milli
        FROM pr{iterations}
    """
    return oracle_query(head.strip() + "," + ",".join(steps) + tail)


@register(
    "host_pagerank",
    covers="net:graph-centrality J1 A2",
    oracle=_pagerank_oracle(),
)
def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-importance ranking: 5 power iterations of PageRank over the
    distinct src→dst communication graph (operators/pagerank.py) — the
    'which hosts are hubs' view that follows top-talkers, and on the
    LLM side the same operator ranks documents in citation/near-dup
    graphs. The DuckDB oracle replays the identical fixed-iteration
    arithmetic CTE-for-CTE, so the green row certifies an ITERATIVE
    multi-join pipeline end to end (ranks reported ×1000 and rounded,
    both sides)."""
    import pyspark.sql.functions as F

    from stream4flow_spark.operators.pagerank import pagerank

    fl = flows_df(spark, sf_dir)
    edges = fl.filter(
        F.col("ipfix_sourceIPv4Address").isNotNull()
        & F.col("ipfix_destinationIPv4Address").isNotNull()
    ).select(
        F.col("ipfix_sourceIPv4Address").alias("src"),
        F.col("ipfix_destinationIPv4Address").alias("dst"),
    )
    pr = pagerank(edges, iterations=5, damping=0.85)
    return pr.select(
        F.col("node").alias("host"),
        (F.round(F.col("pagerank") * 1000, 6) + 0.0).alias(
            "pagerank_milli"
        ),
    )


@register(
    "host_triangles",
    covers="net:graph-triangles J1 A2",
    # oracle: canonical x<y<z three-way self-join over the distinct
    # undirected host graph, then corner counts — the brute-force
    # enumeration the degree-oriented Spark plan must reproduce exactly
    oracle=oracle_query("""
        WITH und AS (
            SELECT DISTINCT
                   LEAST(ipfix_sourceIPv4Address,
                         ipfix_destinationIPv4Address) AS a,
                   GREATEST(ipfix_sourceIPv4Address,
                            ipfix_destinationIPv4Address) AS b
            FROM flows
            WHERE ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND ipfix_sourceIPv4Address <> ipfix_destinationIPv4Address
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
            SELECT x AS host FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        )
        SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY 1
        """),
)
def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle participation over the communication graph
    (operators/triangles.py) — the peer-group density signal next to
    host_pagerank's hub signal: scanners have many edges but no
    triangles, service clusters are triangle-dense. Spark plan uses the
    published degree-ordered orientation (Suri & Vassilvitskii WWW'11):
    every edge points low→high in (degree, id) order, so each triangle
    is enumerated once from its lowest corner and the wedge join's
    fan-out is O(sqrt(m)) per node no matter how large a hub the raw
    graph has — the property that survives a 100 TB flow graph. The
    oracle brute-forces the canonical x<y<z enumeration."""
    import pyspark.sql.functions as F

    from stream4flow_spark.operators.triangles import triangle_count

    fl = flows_df(spark, sf_dir)
    edges = fl.filter(
        F.col("ipfix_sourceIPv4Address").isNotNull()
        & F.col("ipfix_destinationIPv4Address").isNotNull()
    ).select(
        F.col("ipfix_sourceIPv4Address").alias("src"),
        F.col("ipfix_destinationIPv4Address").alias("dst"),
    )
    return triangle_count(edges)


def _kcore_oracle(k: int = 6, rounds: int = 5) -> str:
    """Replays operators/kcore.py fixed_rounds CTE-for-CTE: R peel
    rounds (degree filter + both-endpoint semi-join) over the distinct
    undirected host graph."""
    head = """
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT
                   LEAST(ipfix_sourceIPv4Address,
                         ipfix_destinationIPv4Address) AS a,
                   GREATEST(ipfix_sourceIPv4Address,
                            ipfix_destinationIPv4Address) AS b
            FROM flows
            WHERE ipfix_sourceIPv4Address IS NOT NULL
              AND ipfix_destinationIPv4Address IS NOT NULL
              AND ipfix_sourceIPv4Address <> ipfix_destinationIPv4Address
        )
    """
    steps = []
    for i in range(rounds):
        steps.append(f"""
        d{i} AS MATERIALIZED (
            SELECT n, COUNT(*) AS deg FROM (
                SELECT a AS n FROM e{i} UNION ALL SELECT b FROM e{i}
            ) GROUP BY 1
        ),
        k{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE deg >= {k}),
        e{i + 1} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{i} e
            JOIN k{i} x ON e.a = x.n
            JOIN k{i} y ON e.b = y.n
        )""")
    tail = f"""
        SELECT n AS host, CAST(COUNT(*) AS BIGINT) AS core_degree
        FROM (
            SELECT a AS n FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
        ) GROUP BY 1
    """
    return oracle_query(head.strip() + "," + ",".join(steps) + tail)


@register(
    "host_kcore",
    covers="net:graph-kcore J1 A2",
    oracle=_kcore_oracle(),
)
def q_host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-backbone extraction: the subgraph left after 5 fixed peel
    rounds toward the 6-core of the host communication graph
    (operators/kcore.py) — scanners and leaf hosts peel out in the
    first rounds, infrastructure meshes survive; the third graph lens
    next to host_pagerank (hubs) and host_triangles (local density).
    fixed_rounds composes the peel as ONE static plan with no
    driver-side state, which is what lets the DuckDB oracle replay all
    5 rounds CTE-for-CTE and the driver hash-certify an ITERATIVE
    pipeline — the host_pagerank device. Each round is a degree
    aggregate + two semi-joins over (id, id) edges; payloads never
    travel."""
    import pyspark.sql.functions as F

    from stream4flow_spark.operators.kcore import kcore

    fl = flows_df(spark, sf_dir)
    edges = fl.filter(
        F.col("ipfix_sourceIPv4Address").isNotNull()
        & F.col("ipfix_destinationIPv4Address").isNotNull()
    ).select(
        F.col("ipfix_sourceIPv4Address").alias("src"),
        F.col("ipfix_destinationIPv4Address").alias("dst"),
    )
    return kcore(edges, k=6, fixed_rounds=5)


@register(
    "net_cidr_v6_classify",
    covers="F5 F5v6 C2 A1 F9",
    oracle=oracle_query(
        f"""
        SELECT CASE WHEN {_SRC_LOCAL} THEN 'local_v4'
                    WHEN ipfix_sourceIPv4Address IS NOT NULL THEN 'external_v4'
                    WHEN CAST(substr(ipfix_sourceIPv6Address, 7) AS INT) <= 19
                         THEN 'local_v6'
                    WHEN ipfix_sourceIPv6Address IS NOT NULL THEN 'external_v6'
                    ELSE 'none' END AS src_class,
               CASE WHEN {_DST_LOCAL} THEN 'local_v4'
                    WHEN ipfix_destinationIPv4Address IS NOT NULL THEN 'external_v4'
                    WHEN CAST(substr(ipfix_destinationIPv6Address, 9) AS INT)
                         BETWEEN 40 AND 79 THEN 'local_v6'
                    WHEN ipfix_destinationIPv6Address IS NOT NULL THEN 'external_v6'
                    ELSE 'none' END AS dst_class,
               CAST(COUNT(*) AS BIGINT) AS flows,
               CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets
        FROM flows
        GROUP BY 1, 2
        """
    ),
)
def q_net_cidr_v6_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed v4/v6 CIDR classification through ``ip_in_cidr_any`` — the
    driver-green certification of the IPv6 Column-math path (F5-v6,
    functions/net.py:191): the reference apps only ever test v4 CIDRs
    (reference host_stats.py:152), so this query routes BOTH families
    of the fixture's addresses through the same public predicate, with
    the v6 branch exercised by two non-trivial prefixes that cut
    through a hex group (fd00::/123 on sources, fd00::1:40/122 on
    destinations).

    Oracle honesty (COVERAGE.md replay rule): the DuckDB side derives
    membership in the DECIMAL domain — the fixture's v6 tails are
    decimal digit strings read as hex groups, and because the
    digit-string -> hex-value map is monotonic, fd00::/123 membership
    is exactly ``tail <= 19`` and fd00::1:40/122 is ``tail BETWEEN 40
    AND 79`` — an independent derivation sharing no code with the
    128-bit word parse it certifies. The per-address differential test
    against the retired ipaddress pandas oracle (tests/test_functions)
    remains the adversarial gate for arbitrary textual forms.

    Plan shape (SCALE.md): the v6 parse projects ONCE per side into a
    words column, gated behind ``v4 IS NULL`` (CaseWhen is lazy per
    row, and the fixture — like real IPFIX — carries at most one
    family per leg), and the two prefix tests are literal array
    compares on that column (``words_in_cidr``). The first cut called
    ``ip_in_cidr_any`` once per branch, re-instantiating the whole
    parse tree four times per side — a 3.7 MB task binary and 4× the
    wall time for identical results."""
    import pyspark.sql.functions as F

    from stream4flow_spark.functions.net import (
        ip6_to_words,
        ip_in_cidr,
        ip_in_cidr_any,
        words_in_cidr,
    )

    fl = flows_df(spark, sf_dir)

    def parsed_side(v4: str, v6: str, tag: str):
        w = F.when(F.col(v4).isNull(), ip6_to_words(F.col(v6)))
        return [F.col(v4).alias(f"__v4_{tag}"), w.alias(f"__w_{tag}")]

    parsed = fl.select(
        *parsed_side("ipfix_sourceIPv4Address", "ipfix_sourceIPv6Address", "s"),
        *parsed_side(
            "ipfix_destinationIPv4Address", "ipfix_destinationIPv6Address", "d"
        ),
        F.col("ipfix_packetDeltaCount").alias("pk"),
    )

    def classify(tag: str, v6_cidr: str):
        v4, w = F.col(f"__v4_{tag}"), F.col(f"__w_{tag}")
        return (
            F.when(ip_in_cidr_any(v4, LOCAL_CIDR), "local_v4")
            .when(ip_in_cidr(v4, "0.0.0.0/0"), "external_v4")
            .when(words_in_cidr(w, v6_cidr), "local_v6")
            .when(w.isNotNull(), "external_v6")
            .otherwise("none")
        )

    return (
        parsed.select(
            classify("s", "fd00::/123").alias("src_class"),
            classify("d", "fd00::1:40/122").alias("dst_class"),
            "pk",
        )
        .groupBy("src_class", "dst_class")
        .agg(
            F.count("*").alias("flows"),
            F.sum("pk").cast("long").alias("packets"),
        )
    )
