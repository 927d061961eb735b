"""Network-domain scalar functions (SURVEY.md §2.7), as Column expressions.

Everything here is pure `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Reference semantics cited
per function; each is unit-tested against an independent Python model in
tests/test_functions.py.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

# C1 — reference protocols_statistics.py:82-96
def protocol_name(proto: Column) -> Column:
    """6→'tcp', 17→'udp', anything else (incl. NULL) → 'other'."""
    return F.when(proto == 6, "tcp").when(proto == 17, "udp").otherwise("other")


# C2 — reference ssh_auth_simple.py:139-150 (get_ip, v4 preferred)
def ip_coalesce(v4: Column, v6: Column) -> Column:
    return F.coalesce(v4, v6)


#: TCP flag names by bit position (LSB first), reference host_stats.py:54-71
TCP_FLAG_NAMES = ["FIN", "SYN", "RST", "PSH", "ACK", "URG", "ECE", "CWR"]


# C3 helper
def tcp_flag_bit(flags: Column, bit: int) -> Column:
    """The 0/1 value of one flag bit (LSB=FIN … bit7=CWR)."""
    return F.shiftright(flags, bit).bitwiseAND(F.lit(1))


# C3 — reference host_stats.py:54-71 (map_tcp_flags)
def tcp_flags_struct(flags: Column) -> Column:
    """8-bit mask → struct<FIN:int, …, CWR:int> of 0/1 fields."""
    return F.struct(
        *[tcp_flag_bit(flags, i).alias(name) for i, name in enumerate(TCP_FLAG_NAMES)]
    )


def ip4_to_long(ip: Column) -> Column:
    """Dotted-quad string → 32-bit value as BIGINT (NULL-safe).

    Pure column math so CIDR predicates stay inside codegen and can be
    pushed toward the scan — the reference instead re-built a netaddr
    ``IPNetwork`` per record (host_stats.py:152, an anti-optimization).
    """
    parts = F.split(ip, r"\.")
    # try_cast: non-IPv4 strings (e.g. IPv6) yield NULL instead of an ANSI
    # cast error (spark.sql.ansi.enabled is on by default in Spark 4).
    return (
        parts.getItem(0).try_cast("long") * 16777216
        + parts.getItem(1).try_cast("long") * 65536
        + parts.getItem(2).try_cast("long") * 256
        + parts.getItem(3).try_cast("long")
    )


def cidr_range(cidr: str) -> tuple[int, int]:
    """'10.0.0.0/16' → (lo, hi) inclusive numeric bounds (driver-side)."""
    net = ipaddress.ip_network(cidr, strict=False)
    return int(net.network_address), int(net.broadcast_address)


# F5 — reference host_stats.py:152 etc. (IPAddress in IPNetwork, v4 only)
def ip_in_cidr(ip: Column, cidr: str) -> Column:
    """True iff `ip` (IPv4 dotted quad) is inside `cidr`.

    IPv6 strings produce NULL→false (reference silently assumed v4 too,
    SURVEY.md §7.2). The CIDR is folded to two literal longs at plan time.
    """
    lo, hi = cidr_range(cidr)
    n = ip4_to_long(ip)
    # Guard: only dotted-quads convert; anything else → NULL. coalesce
    # pins NULL to false so the predicate is also usable as a projection.
    return F.coalesce(
        ip.rlike(r"^\d+\.\d+\.\d+\.\d+$") & n.between(F.lit(lo), F.lit(hi)),
        F.lit(False),
    )


# C11 — reference ports_scan.py:93-94 (unix ms → ISO-8601 Z)
def ms_to_iso(ms: Column) -> Column:
    return F.date_format(
        F.timestamp_millis(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    )


# F5 extension — IPv6-capable CIDR membership (SURVEY.md §7.2: the
# reference silently assumed v4; the v6 path is the documented deviation).
def ip_in_cidr_any(ip: Column, cidr: str) -> Column:
    """True iff `ip` (IPv4 dotted quad OR IPv6 string) is inside `cidr`.

    v4 CIDRs take the pure-Column fast path (codegen, pushdown-friendly).
    v6 CIDRs normalize to a 128-bit range compare inside an Arrow-batched
    pandas UDF (``ipaddress`` handles `::` expansion); malformed strings
    are false. Keep v4 filters on ``ip_in_cidr`` — this is the
    mixed-family surface."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        return ip_in_cidr(ip, cidr)

    lo, hi = int(net.network_address), int(net.broadcast_address)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _in6(s):  # type: ignore[no-untyped-def]
        def check(v):
            if v is None:
                return False
            try:
                a = ipaddress.ip_address(v)
            except ValueError:
                return False
            return a.version == 6 and lo <= int(a) <= hi

        return s.map(check)

    return _in6(ip)
