"""Unit tests for the scalar function library against independent Python
models (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream4flow_spark.functions.net import (
    cidr_range,
    ip4_to_long,
    ip_coalesce,
    ip_in_cidr,
    ms_to_iso,
    protocol_name,
    tcp_flags_struct,
)


def test_protocol_name(spark):
    df = spark.createDataFrame([(6,), (17,), (1,), (None,)], "p int")
    got = [r[0] for r in df.select(protocol_name(F.col("p"))).collect()]
    assert got == ["tcp", "udp", "other", "other"]


def test_ip_coalesce(spark):
    df = spark.createDataFrame(
        [("1.2.3.4", None), (None, "fd00::1"), (None, None)], "v4 string, v6 string"
    )
    got = [r[0] for r in df.select(ip_coalesce(F.col("v4"), F.col("v6"))).collect()]
    assert got == ["1.2.3.4", "fd00::1", None]


def test_tcp_flags_struct(spark):
    # 2 = SYN only; 18 = SYN+ACK; 255 = all
    df = spark.createDataFrame([(2,), (18,), (255,)], "f int")
    rows = df.select(tcp_flags_struct(F.col("f")).alias("s")).collect()
    assert rows[0].s.asDict() == {
        "FIN": 0, "SYN": 1, "RST": 0, "PSH": 0, "ACK": 0, "URG": 0, "ECE": 0, "CWR": 0,
    }
    assert rows[1].s.SYN == 1 and rows[1].s.ACK == 1 and rows[1].s.FIN == 0
    assert all(v == 1 for v in rows[2].s.asDict().values())


def test_ip4_to_long_and_cidr(spark):
    df = spark.createDataFrame(
        [("10.0.1.2",), ("203.0.113.9",), ("fd00::1",), (None,)], "ip string"
    )
    longs = [r[0] for r in df.select(ip4_to_long(F.col("ip"))).collect()]
    assert longs[0] == (10 << 24) + (1 << 8) + 2
    assert longs[1] == (203 << 24) + (113 << 8) + 9

    assert cidr_range("10.0.0.0/16") == ((10 << 24), (10 << 24) + 65535)

    inside = [
        r[0] for r in df.select(
            F.coalesce(ip_in_cidr(F.col("ip"), "10.0.0.0/16"), F.lit(False))
        ).collect()
    ]
    assert inside == [True, False, False, False]


def test_ms_to_iso(spark):
    df = spark.createDataFrame([(1704067200000,)], "ms long")
    got = df.select(ms_to_iso(F.col("ms"))).collect()[0][0]
    assert got == "2024-01-01T00:00:00.000Z"


def test_format_cipher_suites_edges(spark):
    from pyspark.sql import functions as F

    from stream4flow_spark.functions.tls import format_cipher_suites

    rows = [
        ("0x2bc01301",), ("2bc01301",), ("0x",), ("",), ("0x00002bc0",),
        ("0xab",),  # shorter than one group -> dropped entirely
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = [
        r.out
        for r in df.select(format_cipher_suites(F.col("raw")).alias("out")).collect()
    ]
    assert got == ["c02b,0113", "c02b,0113", "", "", "c02b", ""]


def test_ip_in_cidr_any_v6(spark):
    from pyspark.sql import functions as F

    from stream4flow_spark.functions.net import ip_in_cidr_any

    rows = [
        ("fd00::5",), ("fd00::1:5",), ("FD00:0000::0005",),  # expansion/case
        ("10.0.1.2",), ("garbage",), (None,),
    ]
    df = spark.createDataFrame(rows, "ip string")
    got = [
        r.hit
        for r in df.select(
            ip_in_cidr_any(F.col("ip"), "fd00::/32").alias("hit")
        ).collect()
    ]
    assert got == [True, True, True, False, False, False]
    # and the v4 fast path still works through the same entry point
    got4 = [
        r.hit
        for r in df.select(
            ip_in_cidr_any(F.col("ip"), "10.0.0.0/16").alias("hit")
        ).collect()
    ]
    assert got4 == [False, False, False, True, False, False]


def test_decode_rdata_all_types(spark):
    """C8 — type-directed RData decode: A->IPv4, AAAA->IPv6, else ASCII
    (reference DNSResponseConverter.py:30-72 semantics)."""
    from pyspark.sql import functions as F

    from stream4flow_spark.functions.dns import decode_rdata

    rows = [
        ("0a000102", 1),                           # A -> 10.0.1.2
        ("FD000000000000000000000000000005", 28),  # AAAA (32 hex chars)
        ("7777772e6578616d706c652e636f6d", 5),      # CNAME hex->ascii
    ]
    df = spark.createDataFrame(rows, "rdata string, t int")
    got = [
        r.out
        for r in df.select(
            decode_rdata(F.col("rdata"), F.col("t")).alias("out")
        ).collect()
    ]
    assert got == [
        "10.0.1.2",
        "fd00:0000:0000:0000:0000:0000:0000:0005",
        "www.example.com",
    ]


def test_ip6_cidr_column_math_matches_ipaddress_oracle(spark):
    """r9 verdict item 6: the v6 CIDR path is pure Column math
    (SURVEY.md §7.2's 128-bit-as-words design). Differential-test it
    against the retired pandas-UDF ``ipaddress`` implementation across
    adversarial literals and a seeded random corpus of valid,
    compressed, v4-embedded, zoned, and corrupted addresses, over CIDRs
    whose bounds cross the 64-bit sign boundary — then pin that the
    plan carries no Python eval node."""
    import random

    from pyspark.sql import functions as F

    from stream4flow_spark.functions.net import (
        ip6_in_cidr_pandas_oracle,
        ip_in_cidr_any,
    )

    rng = random.Random(0xF6)
    cases = [
        "fd00::1", "fd00:0:0:0:0:0:0:1", "fd00::", "::1", "::",
        "fe80::1%eth0", "fe80::1%", "a%b%c", "1.2.3.4%eth0", "not an ip",
        None, "10.0.1.2", "::ffff:10.0.1.2", "fd00::ffff:1.2.3.4",
        "FD00::A", "fd00:1:2:3:4:5:6:7", "fd00:1:2:3:4:5:6:7:8",
        "1:::2", ":::", "fd00::1::2", "fd00:1.2.3.4", "::256.1.1.1",
        "8000::1", "7fff:ffff::1",
        "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
        "0:0:0:0:0:ffff:1.2.3.4", "fe80::2%0", "::ffff:1.2.3",
        "12345::1", "g000::1", "",
        # leading-zero octets: ipaddress rejects post-CVE-2021-29921,
        # the Column math must agree (r10 review)
        "::ffff:01.2.3.4", "::ffff:1.02.3.4", "::ffff:001.2.3.4",
        "::ffff:0.2.3.4", "::ffff:1234.5.6.7", "0:0:0:0:0:ffff:010.0.0.1",
    ]
    for _ in range(150):
        n_groups = rng.randint(1, 8)
        groups = [f"{rng.randint(0, 0xFFFF):x}" for _ in range(n_groups)]
        s = ":".join(groups)
        form = rng.random()
        if n_groups < 8 and form < 0.6:
            cut = rng.randint(0, n_groups)
            s = ":".join(groups[:cut]) + "::" + ":".join(groups[cut:])
        elif form < 0.7:
            s += f":{rng.randint(0, 299)}.{rng.randint(0, 255)}.1.2"
        if rng.random() < 0.1:
            s += "%zone0"
        if rng.random() < 0.1:  # corrupt
            s = s.replace(":", "::", 1) if rng.random() < 0.5 else "x" + s
        cases.append(s)

    df = spark.createDataFrame([(c,) for c in cases], "ip string").cache()
    for cidr in ["fd00::/32", "::/0", "8000::/1", "fe80::/10",
                 "::ffff:0:0/96", "fd00:12::/47"]:
        out = df.select(
            "ip",
            ip_in_cidr_any(F.col("ip"), cidr).alias("col"),
            ip6_in_cidr_pandas_oracle(F.col("ip"), cidr).alias("udf"),
        ).collect()
        bad = [(r.ip, r.col, r.udf) for r in out if r.col != r.udf]
        assert not bad, f"{cidr}: column math diverges from ipaddress: {bad}"

    plan = (
        df.filter(ip_in_cidr_any(F.col("ip"), "fd00::/32"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan
    df.unpersist()


def test_words_in_cidr_rejects_ipv4_prefix(spark):
    # the fixture is unused directly, but F.lit(...).cast(...) below
    # needs an active SparkContext — without it this test only passes
    # when ordered after a session-creating one (r11 ADVICE)
    """r11 review: the parse-once v6 membership helpers must fail loud
    on an IPv4 CIDR — the word compare would otherwise silently match
    only ::x.x.x.x-compatible addresses (wrong classifications, no
    error). v4 prefixes go through ip_in_cidr/ip_in_cidr_any."""
    import pytest
    from pyspark.sql import functions as F

    from stream4flow_spark.functions.net import (
        cidr_words_bounds,
        words_in_cidr,
    )

    with pytest.raises(ValueError, match="IPv6"):
        cidr_words_bounds("10.0.0.0/8")
    with pytest.raises(ValueError, match="IPv6"):
        words_in_cidr(F.lit(None).cast("array<bigint>"), "10.0.0.0/8")
    lo, hi = cidr_words_bounds("fd00::/123")  # v6 still fine
    assert lo == [0xFD000000, 0, 0, 0] and hi == [0xFD000000, 0, 0, 0x1F]
