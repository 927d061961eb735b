"""Deterministic `flows` table derived from the driver's `events` testdata.

The driver testdata (`TESTDATA.md`) has no IPFIX flow table, so the flow
surface (FIXTURES.md §1) is derived from `events` by pure column arithmetic.
The derivation is ONE SQL template written in the dialect-common subset of
Spark SQL and DuckDB SQL; the only divergent expressions are injected via
placeholders. Running the same text in both engines guarantees that the
Spark pipelines and the DuckDB oracle see bit-identical input — so the
driver's hash-compare exercises the *query* semantics, not fixture drift.

Design of the derivation (all modular arithmetic on event_id/user_id/k):

- ``k`` = the integer in ``props`` (0..99), the per-event entropy source.
- src IP keyed by user_id (hosts repeat), 2/3 inside CIDR 10.0.0.0/16,
  1/3 external 203.0.113.0/24; every 29th row is IPv6-only (exercises the
  ``get_ip`` coalesce, reference ssh_auth_simple.py:139-150).
- dst IP keyed by k, 4/5 local, 1/5 external 198.51.100.0/24; every 31st
  row IPv6-only.
- dst port: 22 / 53 / 80 / 443 / high ports by event_id residues; port 53
  forces protocol 17 (UDP) so the DNS apps see UDP/53 traffic
  (reference reflectdos_main.py:122-123).
- protocol otherwise from event_type (click/view/purchase→TCP, error→UDP,
  signup→ICMP) — exercises all arms of ``protocol_name``
  (reference protocols_statistics.py:82-96).
- TCP flags: pure-SYN (==2) for k%3==0 TCP rows (ports_scan candidates,
  reference ports_scan.py:176-177), else a varied 6-bit mask.
- DNS fields only on port-53 rows: queries (even event_id) carry QType,
  responses (odd) carry QR=1 flags with RCODE 3 for k%4==0 (NXDomain mix,
  reference dns_statistics.py:184-199), CRR type/name, and for A-records a
  4-byte hex RData that decodes to a 10.0.x.y address
  (reference DNSResponseConverter.py:30-72).
- TLS cipher-suite strings on 443, HTTP host on 80.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Placeholders:
#   {EVENTS}   — name of the events relation
#   {EPOCH_MS} — expression: epoch milliseconds (BIGINT) of column ``ts``
#   {X2A}/{X2B} — expression: 2-digit lowercase hex of an int expression
_TEMPLATE = """
base AS (
  SELECT event_id AS e,
         user_id AS u,
         event_type AS et,
         CAST(FLOOR(value) AS BIGINT) AS fv,
         {EPOCH_MS} AS t_ms,
         CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
  FROM {EVENTS}
),
p1 AS (
  SELECT base.*,
         CAST(CASE WHEN e % 11 = 0 THEN 22
                   WHEN e % 13 = 0 THEN 53
                   WHEN e % 7  = 0 THEN 80
                   WHEN e % 17 = 0 THEN 443
                   ELSE 1024 + e % 1024 END AS INT) AS dport
  FROM base
),
p2 AS (
  SELECT p1.*,
         CAST(CASE WHEN dport = 53 THEN 17
                   WHEN et = 'click' THEN 6
                   WHEN et = 'view' THEN 6
                   WHEN et = 'purchase' THEN 6
                   WHEN et = 'error' THEN 17
                   ELSE 1 END AS INT) AS proto,
         CAST(1024 + (e * 7) % 60000 AS INT) AS sport
  FROM p1
),
flows AS (
  SELECT
    CASE WHEN e % 29 = 0 THEN NULL
         WHEN e % 3 <> 0 THEN '10.0.' || CAST(u % 4 AS STRING) || '.' || CAST(1 + u % 250 AS STRING)
         ELSE '203.0.113.' || CAST(1 + u % 250 AS STRING) END AS ipfix_sourceIPv4Address,
    CASE WHEN e % 31 = 0 THEN NULL
         WHEN e % 5 <> 0 THEN '10.0.' || CAST(k % 4 AS STRING) || '.' || CAST(1 + k % 250 AS STRING)
         ELSE '198.51.100.' || CAST(1 + k % 250 AS STRING) END AS ipfix_destinationIPv4Address,
    CASE WHEN e % 29 = 0 THEN 'fd00::' || CAST(u % 100 AS STRING) ELSE NULL END AS ipfix_sourceIPv6Address,
    CASE WHEN e % 31 = 0 THEN 'fd00::1:' || CAST(k % 100 AS STRING) ELSE NULL END AS ipfix_destinationIPv6Address,
    proto AS ipfix_protocolIdentifier,
    sport AS ipfix_sourceTransportPort,
    dport AS ipfix_destinationTransportPort,
    fv + 1 AS ipfix_packetDeltaCount,
    (fv + 1) * (40 + k) AS ipfix_octetDeltaCount,
    t_ms AS ipfix_flowStartMilliseconds,
    t_ms + k * 100 + e % 1000 AS ipfix_flowEndMilliseconds,
    CAST(CASE WHEN proto = 6 THEN CASE WHEN k % 3 = 0 THEN 2 ELSE e % 64 END
              ELSE 0 END AS INT) AS ipfix_tcpControlBits,
    CASE WHEN dport = 53 THEN 'dom' || CAST(k % 20 AS STRING) ||
           CASE WHEN k % 5 = 0 THEN '.local.example'
                ELSE '.ext' || CAST(k % 7 AS STRING) || '.com' END
         ELSE NULL END AS ipfix_DNSName,
    CAST(CASE WHEN dport = 53 AND e % 2 = 0 THEN
           CASE k % 5 WHEN 0 THEN 1 WHEN 1 THEN 28 WHEN 2 THEN 15 WHEN 3 THEN 5 ELSE 16 END
         ELSE NULL END AS INT) AS ipfix_DNSQType,
    CAST(CASE WHEN dport = 53 THEN
           CASE WHEN e % 2 = 1 THEN 32768 + CASE WHEN k % 4 = 0 THEN 3 ELSE 0 END ELSE 0 END
         ELSE NULL END AS INT) AS ipfix_DNSFlagsCodes,
    CAST(CASE WHEN dport = 53 AND e % 2 = 1 THEN
           CASE k % 3 WHEN 0 THEN 1 WHEN 1 THEN 28 ELSE 5 END
         ELSE NULL END AS INT) AS ipfix_DNSCrrType,
    CASE WHEN dport = 53 AND e % 2 = 1 THEN 'dom' || CAST(k % 20 AS STRING) ||
           CASE WHEN k % 5 = 0 THEN '.local.example'
                ELSE '.ext' || CAST(k % 7 AS STRING) || '.com' END
         ELSE NULL END AS ipfix_DNSCrrName,
    CASE WHEN dport = 53 AND e % 2 = 1 AND k % 3 = 0 THEN '0a00' || {X2A} || {X2B}
         ELSE NULL END AS ipfix_DNSRData,
    CAST(CASE WHEN dport = 53 AND e % 2 = 1 THEN
           CASE k % 3 WHEN 0 THEN 4 WHEN 1 THEN 16 ELSE 20 END
         ELSE NULL END AS INT) AS ipfix_DNSRDataLength,
    CASE WHEN dport = 443 AND proto = 6 THEN
           CASE k % 4 WHEN 0 THEN '0x2bc0' WHEN 1 THEN '0x2fc01301'
                      WHEN 2 THEN '0x00000000' ELSE '0x1413' END
         ELSE NULL END AS ipfix_TLSClientCipherSuites,
    CASE WHEN dport = 80 AND proto = 6 THEN
           'web' || CAST(k % 10 AS STRING) || '.example.com'
         ELSE NULL END AS ipfix_HTTPRequestHost
  FROM p2
)
"""

#: CIDR considered "local network" by the apps run over derived flows.
LOCAL_CIDR = "10.0.0.0/16"

_SPARK_VIEW = "__s4f_events"


def spark_flows_cte() -> str:
    """The WITH-clause body for Spark SQL (events view pre-registered)."""
    return _TEMPLATE.format(
        EVENTS=_SPARK_VIEW,
        EPOCH_MS="unix_millis(ts)",
        X2A="format_string('%02x', k % 4)",
        X2B="format_string('%02x', 1 + k % 250)",
    )


def duckdb_flows_cte() -> str:
    """The WITH-clause body for DuckDB (driver pre-registers view `events`)."""
    return _TEMPLATE.format(
        EVENTS="events",
        EPOCH_MS="epoch_ms(ts)",
        X2A="printf('%02x', k % 4)",
        X2B="printf('%02x', 1 + k % 250)",
    )


def oracle_query(body: str) -> str:
    """Wrap an oracle query that references the ``flows`` CTE.

    ``body`` may itself start with ``WITH more_ctes AS (...) SELECT ...`` —
    its CTE list is merged into the flows CTE list.
    """
    body = body.strip()
    if body[:14].upper() == "WITH RECURSIVE":
        # RECURSIVE prefixes the whole WITH list (non-recursive members ok)
        return f"WITH RECURSIVE {duckdb_flows_cte()}, {body[14:].lstrip()}"
    if body[:4].upper() == "WITH":
        return f"WITH {duckdb_flows_cte()}, {body[4:].lstrip()}"
    return f"WITH {duckdb_flows_cte()} {body}"


def flows_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived flows DataFrame for one scale-factor directory.

    The derivation itself is a single project over the parquet scan — no
    shuffle, fully codegen'd, and at 100 TB it parallelizes per input split.
    """
    from stream4flow_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView(_SPARK_VIEW)
    return spark.sql(f"WITH {spark_flows_cte()} SELECT * FROM flows")
