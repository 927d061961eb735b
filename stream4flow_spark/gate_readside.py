"""Gate queries for the read-side surface (SURVEY.md §2.9 Q1-Q9).

Each runs the corresponding plans.readside shape over an app RESULT
DataFrame (computed in-session from the derived flows), with the oracle
re-stating result-table + query in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream4flow_spark.apps.dns_statistics import dns_statistics
from stream4flow_spark.apps.host_stats import host_stats
from stream4flow_spark.apps.protocols_statistics import protocols_statistics
from stream4flow_spark.fixtures.flows import flows_df, oracle_query
from stream4flow_spark.plans import readside as R
from stream4flow_spark.registry import register

HOUR_MS = 3_600_000
DAY_MS = 86_400_000

# Epoch-ms constants over the Jan-2024 test horizon
JAN_01 = 1_704_067_200_000
JAN_08 = 1_704_672_000_000
JAN_25 = 1_706_140_800_000

_PROTO_RESULT = """
proto AS (
    SELECT ipfix_flowStartMilliseconds - ipfix_flowStartMilliseconds % 3600000 AS window_start_ms,
           CASE ipfix_protocolIdentifier WHEN 6 THEN 'tcp'
                WHEN 17 THEN 'udp' ELSE 'other' END AS protocol,
           CAST(COUNT(*) AS BIGINT) AS flows,
           CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets,
           CAST(SUM(ipfix_octetDeltaCount) AS BIGINT) AS bytes
    FROM flows
    WHERE ipfix_packetDeltaCount IS NOT NULL AND ipfix_octetDeltaCount IS NOT NULL
    GROUP BY 1, 2
)"""

_HOST_RESULT = """
hosts AS (
    SELECT ipfix_flowStartMilliseconds - ipfix_flowStartMilliseconds % 3600000 AS window_start_ms,
           ipfix_sourceIPv4Address AS src_ip,
           CAST(COUNT(*) AS BIGINT) AS flows,
           CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets,
           CAST(SUM(ipfix_octetDeltaCount) AS BIGINT) AS bytes
    FROM flows
    WHERE ipfix_packetDeltaCount IS NOT NULL AND ipfix_octetDeltaCount IS NOT NULL
      AND ipfix_sourceIPv4Address LIKE '10.0.%'
    GROUP BY 1, 2
)"""


def _proto_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    return protocols_statistics(flows_df(spark, sf_dir), "1 hour")


def _host_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    return host_stats(flows_df(spark, sf_dir), window_duration="1 hour").select(
        "window_start_ms", "src_ip", "flows", "packets", "bytes"
    )


@register(
    "readside_q1_range_term",
    covers="Q1",
    oracle=oracle_query(
        f"""
        WITH {_PROTO_RESULT.lstrip()}
        SELECT * FROM proto
        WHERE window_start_ms BETWEEN {JAN_01} AND {JAN_08} AND protocol = 'tcp'
        """
    ),
)
def q_readside_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q1_range_term(
        _proto_result(spark, sf_dir), "window_start_ms", JAN_01, JAN_08,
        term=("protocol", "tcp"),
    )


@register(
    "readside_q2_histogram_terms_sum",
    covers="Q2",
    oracle=oracle_query(
        f"""
        WITH {_PROTO_RESULT.lstrip()}
        SELECT window_start_ms - window_start_ms % {DAY_MS} AS bucket_ms, protocol,
               CAST(SUM(flows) AS BIGINT) AS flows,
               CAST(SUM(packets) AS BIGINT) AS packets,
               CAST(SUM(bytes) AS BIGINT) AS bytes
        FROM proto GROUP BY 1, 2
        """
    ),
)
def q_readside_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q2_histogram_terms_sum(
        _proto_result(spark, sf_dir), "window_start_ms", DAY_MS,
        "protocol", ["flows", "packets", "bytes"],
    )


@register(
    "readside_q3_global_sums",
    covers="Q3",
    oracle=oracle_query(
        f"""
        WITH {_PROTO_RESULT.lstrip()}
        SELECT CAST(SUM(flows) AS BIGINT) AS flows,
               CAST(SUM(packets) AS BIGINT) AS packets,
               CAST(SUM(bytes) AS BIGINT) AS bytes
        FROM proto WHERE window_start_ms >= {JAN_25}
        """
    ),
)
def q_readside_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q3_global_sums(
        _proto_result(spark, sf_dir), "window_start_ms", JAN_25,
        ["flows", "packets", "bytes"],
    )


@register(
    "readside_q4_per_host_sums",
    covers="Q4",
    oracle=oracle_query(
        f"""
        WITH {_HOST_RESULT.lstrip()}
        SELECT src_ip,
               CAST(SUM(flows) AS BIGINT) AS flows,
               CAST(SUM(packets) AS BIGINT) AS packets,
               CAST(SUM(bytes) AS BIGINT) AS bytes
        FROM hosts GROUP BY 1
        """
    ),
)
def q_readside_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q4_per_key_sums(
        _host_result(spark, sf_dir), "src_ip", ["flows", "packets", "bytes"]
    )


@register(
    "readside_q5_histogram_multimetric",
    covers="Q5",
    oracle=oracle_query(
        f"""
        WITH {_HOST_RESULT.lstrip()}
        SELECT window_start_ms - window_start_ms % {DAY_MS} AS bucket_ms,
               CAST(SUM(bytes) AS BIGINT) AS total,
               CAST(SUM(bytes) AS DOUBLE) / COUNT(*) AS mean,
               CAST(MIN(bytes) AS BIGINT) AS mn,
               CAST(MAX(bytes) AS BIGINT) AS mx
        FROM hosts GROUP BY 1
        """
    ),
)
def q_readside_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q5_histogram_multimetric(
        _host_result(spark, sf_dir), "window_start_ms", DAY_MS, "bytes"
    )


@register(
    "readside_q6_top1_per_type",
    covers="Q6",
    oracle=oracle_query(
        """
        WITH dnsr AS (
            SELECT ipfix_flowStartMilliseconds - ipfix_flowStartMilliseconds % 3600000 AS window_start_ms,
                   'queried_domain' AS stat_type, ipfix_DNSName AS key,
                   CAST(COUNT(*) AS BIGINT) AS value
            FROM flows
            WHERE ipfix_DNSName IS NOT NULL AND ipfix_destinationTransportPort = 53
              AND (ipfix_DNSFlagsCodes >> 15) & 1 = 0
            GROUP BY 1, 3
        ),
        summed AS (
            SELECT stat_type, key, CAST(SUM(value) AS BIGINT) AS total
            FROM dnsr GROUP BY 1, 2
        )
        SELECT stat_type, key, total FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY stat_type
                       ORDER BY total DESC, key ASC) AS rn
            FROM summed
        ) WHERE rn = 1
        """
    ),
)
def q_readside_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    dns = dns_statistics(
        flows_df(spark, sf_dir), window_duration="1 hour", top=1_000_000
    ).filter(F.col("stat_type") == "queried_domain")
    return R.q6_top1_key_by_value(dns, "stat_type", "key", "value")


@register(
    "readside_q7_latest_per_group",
    covers="Q7",
    oracle=oracle_query(
        f"""
        WITH {_PROTO_RESULT.lstrip()}
        SELECT window_start_ms, protocol, flows, packets, bytes FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY protocol
                       ORDER BY window_start_ms DESC) AS rn
            FROM proto
        ) WHERE rn = 1
        """
    ),
)
def q_readside_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q7_latest_per_group(
        _proto_result(spark, sf_dir), ["protocol"], "window_start_ms"
    )


@register(
    "readside_q8_either_term",
    covers="Q8",
    oracle=oracle_query(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS flows,
               CAST(SUM(ipfix_packetDeltaCount) AS BIGINT) AS packets
        FROM flows
        WHERE ipfix_sourceIPv4Address = '10.0.2.87'
           OR ipfix_destinationIPv4Address = '10.0.2.87'
        """
    ),
)
def q_readside_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream4flow_spark import schema as S

    hits = R.q8_either_term(flows_df(spark, sf_dir), S.SRC_IP4, S.DST_IP4, "10.0.2.87")
    return hits.agg(
        F.count("*").alias("flows"), F.sum(S.PACKETS).alias("packets")
    )


@register(
    "readside_q9_ordered",
    covers="Q9",
    oracle=oracle_query(
        f"""
        WITH {_PROTO_RESULT.lstrip()}
        SELECT *, CAST(ROW_NUMBER() OVER (
                   ORDER BY window_start_ms ASC, protocol ASC) AS BIGINT) AS order_rank
        FROM proto WHERE window_start_ms < {JAN_01} + {DAY_MS}
        """
    ),
)
def q_readside_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    day1 = _proto_result(spark, sf_dir).filter(
        F.col("window_start_ms") < JAN_01 + DAY_MS
    )
    return R.q9_ordered_rank(day1, "window_start_ms", ["protocol"])
