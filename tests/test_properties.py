"""Property-based tests (hypothesis) for the scalar/operator semantics
that have clean algebraic invariants. Spark evaluation is batched per
property (one DataFrame per example set, not per example) to keep JVM
round-trips off the hot path."""

from __future__ import annotations

import ipaddress
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ips = st.ip_addresses(v=4).map(str)
texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=80
)


@settings(max_examples=20, deadline=None)
@given(st.lists(ips, min_size=1, max_size=20, unique=True))
def test_ip4_to_long_matches_python(spark, ip_list):
    from stream4flow_spark.functions.net import ip4_to_long

    df = spark.createDataFrame([(i,) for i in ip_list], "ip string")
    got = {
        r.ip: r.n
        for r in df.select("ip", ip4_to_long(F.col("ip")).alias("n")).collect()
    }
    for ip in ip_list:
        assert got[ip] == int(ipaddress.ip_address(ip))


@settings(max_examples=15, deadline=None)
@given(st.lists(ips, min_size=1, max_size=20, unique=True), st.integers(0, 32))
def test_cidr_membership_matches_python(spark, ip_list, prefix):
    from stream4flow_spark.functions.net import ip_in_cidr

    cidr = f"10.32.0.0/{prefix}"
    net = ipaddress.ip_network(cidr, strict=False)
    df = spark.createDataFrame([(i,) for i in ip_list], "ip string")
    got = {
        r.ip: r.hit
        for r in df.select(
            "ip", ip_in_cidr(F.col("ip"), cidr).alias("hit")
        ).collect()
    }
    for ip in ip_list:
        assert got[ip] == (ipaddress.ip_address(ip) in net), (ip, cidr)


@settings(max_examples=10, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_entropy_matches_reference_formula(spark, docs):
    from stream4flow_spark.functions.textfn import element_entropy

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {
        r.i: r.e
        for r in df.select(
            "i", element_entropy(F.col("s")).alias("e")
        ).collect()
    }

    def entropy(s: str) -> float:
        if not s:
            return 0.0
        n = len(s)
        return -sum(
            (c / n) * math.log2(c / n)
            for c in {ch: s.count(ch) for ch in set(s)}.values()
        )

    for i, t in rows:
        assert math.isclose(got[i], entropy(t), rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
    st.integers(1, 10**5),
)
def test_suppression_chain_invariants(spark, ts_list, window):
    """Invariants of the greedy report chain, any input: (1) consecutive
    reports per key are ≥ window apart; (2) the first alert always
    reports; (3) summed totals over reports equal the totals of all
    alerts at/before the last report (conservation)."""
    import pandas as pd

    from stream4flow_spark.operators.suppression import suppress_reports

    pdf = pd.DataFrame(
        {"key": "k", "ts_ms": ts_list, "x": [1.0] * len(ts_list)}
    )
    df = spark.createDataFrame(pdf)
    out = (
        suppress_reports(df, ["key"], "ts_ms", window, ["x"])
        .toPandas()
        .sort_values("report_seq")
    )
    t = sorted(ts_list)
    assert out["ts_ms"].iloc[0] == t[0]
    gaps = out["ts_ms"].diff().dropna()
    assert (gaps >= window).all()
    # conservation: every alert at a sort position up to the last report's
    # is counted exactly once. With timestamp ties, alerts equal to the
    # last report's ts may sort after it (stay pending, dropped at batch
    # end — matching the reference's driver-dict behavior), so the total
    # is bounded by the strict-less count + 1 and the ≤ count.
    last = out["ts_ms"].iloc[-1]
    total = out["x"].sum()
    assert sum(1 for v in t if v < last) < total <= sum(1 for v in t if v <= last)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N", "P", "Zs"), max_codepoint=0x2FF
            ),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_clean_text_matches_python_reference(spark, texts):
    """clean_text must agree with a plain-Python re.sub chain (same
    patterns, same order) and be idempotent (placeholders contain nothing
    any pattern re-matches). The reference uses re.ASCII and strips only
    0x20: Java regex \\s and RE2 \\s are ASCII-only and Spark trim strips
    spaces — Python's Unicode-aware defaults are the odd one out, and the
    two engines that must agree (Spark + DuckDB oracle) both use the
    ASCII semantics."""
    import re

    from stream4flow_spark.llmdata.textstats import REDACTIONS, clean_text

    def ref(t: str) -> str:
        for pat, tok in REDACTIONS:
            t = re.sub(pat, tok, t, flags=re.ASCII)
        return re.sub(r"\s+", " ", t, flags=re.ASCII).strip(" ")

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text_clean for r in clean_text(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref(t), repr(t)
        assert ref(ref(t)) == ref(t)  # idempotency of the scrub


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_matches_brute_force_property(spark, lrows, rrows):
    """Backward as-of: for every left row the matched right timestamp
    must equal the Python-computed max{rt : rt <= lt} for the key (right
    rows deduped per (key, ts) as the operator contract requires)."""
    from stream4flow_spark.operators.asof_join import asof_join

    rdedup = {}
    for i, (k, t) in enumerate(rrows):
        rdedup[(k, t)] = float(i)
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k string, lt long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rdedup.items()], "k string, rt long, v double"
    )
    got = {
        r.lid: r.rt
        for r in asof_join(left, right, ["k"], "lt", "rt", how="left").collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [rt for (rk, rt) in rdedup if rk == k and rt <= t]
        assert got[i] == (max(cands) if cands else None), (k, t, cands)
