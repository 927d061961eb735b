"""Gate queries — one entry per implemented operator family.

Each entry pairs a Spark DataFrame pipeline with a DuckDB oracle over the
same inputs. Flow-domain queries run on the deterministic `flows`
derivation (fixtures.flows) so the oracle and the engine see bit-identical
input. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream4flow_spark.apps.protocols_statistics import protocols_statistics
from stream4flow_spark.fixtures.flows import flows_df, oracle_query
from stream4flow_spark.registry import register

HOUR_MS = 3_600_000


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
