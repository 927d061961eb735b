"""The IPFIX flow-record schema.

Mirrors the reference's dynamic JSON flow record (FIXTURES.md §1; reference
contract: applications/application_template/modules/kafkaIO.py:57-61 — every
field may be absent, hence every field here is nullable and apps guard with
``isNotNull`` instead of the reference's ``"ipfix.X" in flow.keys()``).

Column names replace the ``ipfix.`` prefix with ``ipfix_`` so they are legal
unquoted identifiers in Parquet/SQL.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (name, type) in the canonical order. LongType for counters/timestamps,
# IntegerType for small codes, StringType for addresses/names.
_FIELDS: list[tuple[str, T.DataType]] = [
    ("ipfix_sourceIPv4Address", T.StringType()),
    ("ipfix_destinationIPv4Address", T.StringType()),
    ("ipfix_sourceIPv6Address", T.StringType()),
    ("ipfix_destinationIPv6Address", T.StringType()),
    ("ipfix_protocolIdentifier", T.IntegerType()),
    ("ipfix_sourceTransportPort", T.IntegerType()),
    ("ipfix_destinationTransportPort", T.IntegerType()),
    ("ipfix_packetDeltaCount", T.LongType()),
    ("ipfix_octetDeltaCount", T.LongType()),
    ("ipfix_flowStartMilliseconds", T.LongType()),
    ("ipfix_flowEndMilliseconds", T.LongType()),
    ("ipfix_tcpControlBits", T.IntegerType()),
    ("ipfix_DNSName", T.StringType()),
    ("ipfix_DNSQType", T.IntegerType()),
    ("ipfix_DNSFlagsCodes", T.IntegerType()),
    ("ipfix_DNSCrrType", T.IntegerType()),
    ("ipfix_DNSCrrName", T.StringType()),
    ("ipfix_DNSRData", T.StringType()),
    ("ipfix_DNSRDataLength", T.IntegerType()),
    ("ipfix_TLSClientCipherSuites", T.StringType()),
    ("ipfix_HTTPRequestHost", T.StringType()),
]

FLOW_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in _FIELDS])

FLOW_COLUMNS = [n for n, _ in _FIELDS]

# Short aliases used throughout the apps.
SRC_IP4 = "ipfix_sourceIPv4Address"
DST_IP4 = "ipfix_destinationIPv4Address"
SRC_IP6 = "ipfix_sourceIPv6Address"
DST_IP6 = "ipfix_destinationIPv6Address"
PROTO = "ipfix_protocolIdentifier"
SRC_PORT = "ipfix_sourceTransportPort"
DST_PORT = "ipfix_destinationTransportPort"
PACKETS = "ipfix_packetDeltaCount"
BYTES = "ipfix_octetDeltaCount"
T_START = "ipfix_flowStartMilliseconds"
T_END = "ipfix_flowEndMilliseconds"
TCP_FLAGS = "ipfix_tcpControlBits"
DNS_NAME = "ipfix_DNSName"
DNS_QTYPE = "ipfix_DNSQType"
DNS_FLAGS = "ipfix_DNSFlagsCodes"
DNS_CRR_TYPE = "ipfix_DNSCrrType"
DNS_CRR_NAME = "ipfix_DNSCrrName"
DNS_RDATA = "ipfix_DNSRData"
DNS_RDATA_LEN = "ipfix_DNSRDataLength"
TLS_SUITES = "ipfix_TLSClientCipherSuites"
HTTP_HOST = "ipfix_HTTPRequestHost"
