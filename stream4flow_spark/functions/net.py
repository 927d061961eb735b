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
    # try_cast: non-IPv4 strings (e.g. IPv6) yield NULL instead of an ANSI
    # cast error (spark.sql.ansi.enabled is on by default in Spark 4).
    # r15: the split is _let-bound — referenced as plain Column reuse it
    # was inlined (and re-evaluated) once per octet, and when callers
    # apply this to a DERIVED ip column the whole producing expression
    # was copied into each of the four split sites (host_stats' pushed
    # filter carried ~16 copies of the synthetic-src_ip CASE).
    return _let(
        F.split(ip, r"\."),
        lambda parts: (
            parts.getItem(0).try_cast("long") * 16777216
            + parts.getItem(1).try_cast("long") * 65536
            + parts.getItem(2).try_cast("long") * 256
            + parts.getItem(3).try_cast("long")
        ),
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
    # Guard: only dotted-quads convert; anything else → NULL. coalesce
    # pins NULL to false so the predicate is also usable as a projection.
    # r15: ``ip`` is _let-bound — the predicate references it twice
    # (rlike + the numeric conversion) and ``between`` references the
    # converted value twice more; on derived ip columns each reference
    # inlined the whole producing expression (multiplicative blowup,
    # same fix as ip6_to_words).
    return _let(
        ip,
        lambda v: F.coalesce(
            v.rlike(r"^\d+\.\d+\.\d+\.\d+$")
            & _let(
                ip4_to_long(v), lambda n: n.between(F.lit(lo), F.lit(hi))
            ),
            F.lit(False),
        ),
    )


# C11 — reference ports_scan.py:93-94 (unix ms → ISO-8601 Z)
def ms_to_iso(ms: Column) -> Column:
    return F.date_format(
        F.timestamp_millis(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    )


# valid IPv6 text AFTER the embedded-v4 tail is rewritten to hex groups:
# either the full 8-group form, or a `::` form whose sides are themselves
# valid group runs (group counts are enforced arithmetically on top —
# the regex alone would admit 7+7 groups around the `::`).
_V6_RE = (
    "^("
    "[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){7}"
    "|([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6})?"
    "::"
    "([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6})?"
    ")$"
)
# octets must not carry leading zeros — ipaddress rejects "01.2.3.4"
# (post-CVE-2021-29921 ambiguity rule) and the Column math must agree
_OCT = r"(\d|[1-9]\d{1,2})"
_QUAD_RE = rf"{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}$"


def _let(value: Column, body) -> Column:
    """Let-binding for Column trees: evaluate ``value`` once per row and
    let ``body`` reference it as a lambda variable instead of inlining
    the whole producing expression at every reference site.

    ``transform(array(v), body)[0]`` — the lambda variable is a real
    variable in the expression tree, so N references cost N attribute
    reads at runtime and ~0 bytes in the plan, where plain Column reuse
    costs N full copies of the subtree (the multiplicative blowup that
    put ``ip6_to_words`` at ~95 KB per call site, r14). The wrapper adds
    one single-element array allocation per row. NULL-safe: a NULL
    ``value`` becomes ``[NULL]``, the body sees NULL — identical to
    inlining for the pure expressions used here."""
    return F.get(F.transform(F.array(value), body), F.lit(0))


def ip6_to_words(ip: Column) -> Column:
    """IPv6 string → ``array<long>`` of four 32-bit words (big-endian),
    NULL for anything that is not a valid IPv6 address — as PURE Column
    math (SURVEY.md §7.2's 128-bit-as-longs design), so v6 CIDR
    predicates run inside whole-stage codegen like the v4 path instead
    of detouring through Python per batch.

    Handles the textual forms ``ipaddress`` accepts: full 8-group,
    ``::`` zero-compression (expanded by padding the group array), the
    embedded dotted-quad tail (``::ffff:1.2.3.4`` — rewritten to two
    hex groups up front), and a single non-empty ``%zone`` suffix
    (stripped, like ``IPv6Address.scope_id``). Malformed strings yield
    NULL. Two longs would hold the 128 bits, but the sign bit breaks
    ordered comparison at ``8000::``; four unsigned-safe 32-bit words
    compare lexicographically with no sign traps.

    r14: every pipeline stage is ``_let``-bound, so each sub-expression
    appears ONCE in the tree and evaluates ONCE per row. Plain Column
    reuse inlines the whole upstream parse at every reference site —
    multiplicatively: the pre-r14 "referenced at most twice" form still
    compounded to ~95 KB per call site (~200 KB plans in
    net_cidr_v6_classify, with every regexp re-evaluated up to 8× per
    row inside an interpreted projection — higher-order functions are
    CodegenFallback), and the naive 8× form had produced a 4 MiB tree
    (the [[collapse-project-lambda-inlining]] failure mode)."""
    # 0) strip one non-empty zone suffix ("fe80::1%eth0"); a bare or
    # repeated '%' stays in the string and fails the v6 regex below
    stripped = F.when(
        ip.rlike("^[^%]+%[^%]+$"), F.substring_index(ip, "%", 1)
    ).otherwise(ip)

    _tail_re = (
        r"^[0-9A-Fa-f:]+:"
        + r"\.".join([_OCT.replace("(", "(?:")] * 4)
        + "$"
    )

    def with_ip(ipv: Column) -> Column:
        # 1) rewrite an embedded v4 tail to two hex groups
        octets = F.array(
            *[
                F.regexp_extract(ipv, _QUAD_RE, i + 1).try_cast("long")
                for i in range(4)
            ]
        )

        def with_octets(o: Column) -> Column:
            tail_ok = (
                ipv.rlike(_tail_re)
                & (o[0] <= 255) & (o[1] <= 255)
                & (o[2] <= 255) & (o[3] <= 255)
            )
            v4val = o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]
            return F.when(
                tail_ok,
                F.concat(
                    F.regexp_replace(
                        ipv, r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$", ""
                    ),
                    F.format_string(
                        "%x:%x",
                        F.shiftright(v4val, 16),
                        v4val.bitwiseAND(F.lit(65535)),
                    ),
                ),
            ).when(~ipv.contains("."), ipv)  # no dot: plain v6; else NULL

        return _let(octets, with_octets)

    def with_norm(nrm: Column) -> Column:
        # 2) expand `::` by padding zeros between the two halves
        def with_halves(h: Column) -> Column:
            left = F.filter(
                F.split(F.try_element_at(h, F.lit(1)), ":"), lambda x: x != ""
            )
            right = F.when(
                F.size(h) == 2,
                F.filter(
                    F.split(F.try_element_at(h, F.lit(2)), ":"),
                    lambda x: x != "",
                ),
            ).otherwise(F.array().cast("array<string>"))

            def with_pair(p: Column) -> Column:
                l, r = p["l"], p["r"]

                def with_total(t: Column) -> Column:
                    ok = nrm.rlike(_V6_RE) & (
                        ((F.size(h) == 2) & (t <= 7))
                        | ((F.size(h) == 1) & (t == 8))
                    )
                    groups = F.concat(
                        l, F.array_repeat(F.lit("0"), F.lit(8) - t), r
                    )

                    def with_groups(g: Column) -> Column:
                        # 3) hex groups → four 32-bit words (conv is
                        # gated behind `ok`, so ANSI mode never sees a
                        # non-hex group — CaseWhen branches evaluate
                        # lazily per row)
                        words = F.transform(
                            F.sequence(F.lit(0), F.lit(3)),
                            lambda i: (
                                F.conv(
                                    F.try_element_at(g, i * 2 + 1), 16, 10
                                ).cast("long")
                                * 65536
                                + F.conv(
                                    F.try_element_at(g, i * 2 + 2), 16, 10
                                ).cast("long")
                            ),
                        )
                        return F.when(ok, words)

                    return _let(groups, with_groups)

                return _let(F.size(l) + F.size(r), with_total)

            return _let(
                F.struct(left.alias("l"), right.alias("r")), with_pair
            )

        return _let(F.split(nrm, "::", -1), with_halves)

    return _let(_let(stripped, with_ip), with_norm)


def cidr_words_bounds(cidr: str) -> tuple[list[int], list[int]]:
    """An IPv6 CIDR's inclusive (lo, hi) bounds as four big-endian
    32-bit words each (driver-side; the word form ``ip6_to_words``
    parses to). Raises on an IPv4 CIDR: the word compare would
    otherwise silently match only ::x.x.x.x-compatible addresses —
    route v4 prefixes through ``ip_in_cidr``/``ip_in_cidr_any``, which
    dispatch on the family explicitly."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version != 6:
        raise ValueError(
            f"words_in_cidr/cidr_words_bounds need an IPv6 CIDR, got "
            f"{cidr!r} — use ip_in_cidr/ip_in_cidr_any for IPv4"
        )
    lo, hi = int(net.network_address), int(net.broadcast_address)
    return (
        [(lo >> (96 - 32 * i)) & 0xFFFFFFFF for i in range(4)],
        [(hi >> (96 - 32 * i)) & 0xFFFFFFFF for i in range(4)],
    )


def words_in_cidr(words: Column, cidr: str) -> Column:
    """True iff an ALREADY-PARSED ``ip6_to_words`` array is inside the
    IPv6 ``cidr`` — the parse-once/test-many form for pipelines that
    check several prefixes per address (route classifiers, ACL chains):
    project ``ip6_to_words(ip)`` ONCE into a column in its own select
    (Catalyst keeps a non-trivial multi-referenced alias materialized
    rather than inlining it per consumer), then each prefix test is two
    literal array compares. ``ip_in_cidr_any`` composes this with the
    parse for the single-test case; calling THAT once per prefix
    re-instantiates the whole parse tree per test — measured 4× slower
    at two prefixes per address (SCALE.md, net_cidr_v6_classify).

    Arrays of longs compare lexicographically in Spark — equal length
    by construction, so this is exactly the 128-bit range test; a NULL
    parse makes the comparison NULL, coalesced to false."""
    lo_w, hi_w = cidr_words_bounds(cidr)
    lo_a = F.array(*[F.lit(v).cast("long") for v in lo_w])
    hi_a = F.array(*[F.lit(v).cast("long") for v in hi_w])
    return F.coalesce((words >= lo_a) & (words <= hi_a), F.lit(False))


# F5 extension — IPv6-capable CIDR membership (SURVEY.md §7.2: the
# reference silently assumed v4; the v6 path is the documented deviation).
def ip_in_cidr_any(ip: Column, cidr: str) -> Column:
    """True iff `ip` (IPv4 dotted quad OR IPv6 string) is inside `cidr`.

    Both families are pure-Column fast paths (codegen,
    pushdown-friendly): v4 folds the CIDR to two literal longs
    (``ip_in_cidr``); v6 parses to four 32-bit words (``ip6_to_words``)
    and compares lexicographically against the bounds as literal arrays
    (``words_in_cidr`` — use that directly with a projected parse when
    testing multiple prefixes per address). Malformed strings are
    false. The retired pandas-UDF implementation survives as
    ``ip6_in_cidr_pandas_oracle`` for differential tests only."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        return ip_in_cidr(ip, cidr)
    # the parse is referenced twice by the compare (see ip6_to_words on
    # why references are rationed)
    return words_in_cidr(ip6_to_words(ip), cidr)


def ip6_in_cidr_pandas_oracle(ip: Column, cidr: str) -> Column:
    """TEST ORACLE ONLY: the original Arrow-batched ``ipaddress``-backed
    v6 membership check, kept as the independent model
    ``ip_in_cidr_any``'s Column math is differential-tested against
    (tests/test_functions.py). Never use in a pipeline — it is the
    Python detour the Column form exists to remove."""
    net = ipaddress.ip_network(cidr, strict=False)
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
