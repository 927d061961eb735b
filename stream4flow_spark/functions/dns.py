"""DNS-domain scalar functions (SURVEY.md §2.7 C4-C8, §2.2 F4).

All pure Column expressions; the RData hex decode (C8) is the one place a
tiny UDF would be tempting, but unhex/conv built-ins cover it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C4 — reference dns_statistics.py:118-135 (subset of the IANA RR registry;
# codes outside the map → 'OTHER', matching the reference default)
DNS_QTYPE_NAMES: dict[int, str] = {
    1: "A",
    2: "NS",
    5: "CNAME",
    6: "SOA",
    12: "PTR",
    15: "MX",
    16: "TXT",
    28: "AAAA",
    33: "SRV",
    35: "NAPTR",
    43: "DS",
    46: "RRSIG",
    47: "NSEC",
    48: "DNSKEY",
    255: "ANY",
}

# C5 — reference dns_statistics.py:138-149
DNS_RCODE_NAMES: dict[int, str] = {
    0: "NoError",
    1: "FormErr",
    2: "ServFail",
    3: "NXDomain",
    4: "NotImp",
    5: "Refused",
    6: "YXDomain",
    7: "YXRRSet",
    8: "NXRRSet",
    9: "NotAuth",
    10: "NotZone",
}


def _map_lookup(col: Column, mapping: dict[int, str], default: str) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.coalesce(F.element_at(F.create_map(*pairs), col), F.lit(default))


def qtype_name(qtype: Column) -> Column:
    """RR type code → name, default 'OTHER' (C4)."""
    return _map_lookup(qtype, DNS_QTYPE_NAMES, "OTHER")


def rcode_name(rcode: Column) -> Column:
    """DNS response code → name, default 'Other' (C5)."""
    return _map_lookup(rcode, DNS_RCODE_NAMES, "Other")


# F4 — reference dns_statistics.py:184-185 (QR = bit 15, RCODE = bits 0-3)
def dns_is_response(flags: Column) -> Column:
    return F.shiftright(flags, 15).bitwiseAND(F.lit(1)) == 1


def dns_is_query(flags: Column) -> Column:
    return F.shiftright(flags, 15).bitwiseAND(F.lit(1)) == 0


def dns_rcode(flags: Column) -> Column:
    return flags.bitwiseAND(F.lit(15))


# C6 — reference dns_statistics.py:152-166 (substring containment against a
# driver-side domain list; list folded into the plan as literals)
def is_domain_in_list(domain: Column, substrings: list[str]) -> Column:
    if not substrings:
        return F.lit(False)
    cond = F.lit(False)
    for s in substrings:
        cond = cond | domain.contains(s)
    return cond


# C8 — reference dns_open_resolvers/spark/modules/DNSResponseConverter.py:30-72.
# Deviation (documented): input is plain hex (no 0x prefix); 8 hex chars →
# IPv4 dotted quad, 32 → IPv6 groups, anything else → ASCII of the bytes.
def decode_rdata_ipv4(rdata: Column) -> Column:
    """8-hex-char RData → dotted-quad IPv4 string (NULL otherwise)."""
    octet = lambda i: F.conv(F.substring(rdata, i, 2), 16, 10)  # noqa: E731
    return F.when(
        rdata.rlike("^[0-9a-fA-F]{8}$"),
        F.concat_ws(".", octet(1), octet(3), octet(5), octet(7)),
    )


def decode_rdata_ipv6(rdata: Column) -> Column:
    """32-hex-char RData → colon-grouped IPv6 string (NULL otherwise)."""
    grp = lambda i: F.lower(F.substring(rdata, i, 4))  # noqa: E731
    return F.when(
        rdata.rlike("^[0-9a-fA-F]{32}$"),
        F.concat_ws(":", *[grp(1 + 4 * j) for j in range(8)]),
    )


def decode_rdata_text(rdata: Column) -> Column:
    """Hex → ASCII text (for CNAME/TXT payloads)."""
    return F.decode(F.unhex(rdata), "UTF-8")


def decode_rdata(rdata: Column, crr_type: Column) -> Column:
    """Type-directed decode: A(1)→IPv4, AAAA(28)→IPv6, else ASCII."""
    return (
        F.when(crr_type == 1, decode_rdata_ipv4(rdata))
        .when(crr_type == 28, decode_rdata_ipv6(rdata))
        .otherwise(decode_rdata_text(rdata))
    )
