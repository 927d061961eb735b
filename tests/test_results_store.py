"""Result store round-trip: app output -> date-partitioned parquet ->
read-side queries over the store (the reference's Kafka->ES->dashboards
path, SURVEY §3.2, collapsed to one table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream4flow_spark.apps.protocols_statistics import protocols_statistics
from stream4flow_spark.fixtures.flows import flows_df
from stream4flow_spark.plans import readside as R
from stream4flow_spark.sources.results import read_results, write_results
from tests.conftest import SF_DIR


def test_result_store_roundtrip_and_readside(spark, tmp_path):
    root = str(tmp_path / "results")
    stats = protocols_statistics(flows_df(spark, SF_DIR), "1 hour")
    write_results(stats, root, "window_start_ms", app_type="protocols_statistics")

    back = read_results(spark, root)
    assert "result_date" in back.columns and "type" in back.columns
    assert back.count() == stats.count()

    # partition pruning: a one-day filter must hit only that partition
    day0 = back.agg(F.min("result_date")).collect()[0][0]
    one_day = back.filter(F.col("result_date") == F.lit(day0))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and str(day0) in plan
    assert one_day.count() > 0

    # read-side over the store: Q2 histogram+terms+sum reproduces the stats
    q2 = R.q2_histogram_terms_sum(
        back, "window_start_ms", 3_600_000, "protocol", ["flows"]
    )
    direct = stats.groupBy("window_start_ms", "protocol").agg(
        F.sum("flows").alias("flows")
    )
    assert sorted(
        (r.bucket_ms, r.protocol, r.flows) for r in q2.collect()
    ) == sorted((r.window_start_ms, r.protocol, r.flows) for r in direct.collect())


def test_result_store_streaming_sink(spark, tmp_path):
    from stream4flow_spark.sources.results import write_results_stream
    from stream4flow_spark.streaming.runner import stream_flows_df

    root = str(tmp_path / "stream_results")
    ck = str(tmp_path / "ck")
    # append-mode windowed agg needs a watermark; use a raw projection
    # (filter+select) stream instead: flows tagged per-record
    fl = stream_flows_df(spark, SF_DIR).filter(
        F.col("ipfix_protocolIdentifier") == 6
    ).select(
        F.col("ipfix_flowStartMilliseconds").alias("ts_ms"),
        F.col("ipfix_sourceIPv4Address").alias("src_ip"),
    )
    q = write_results_stream(fl, root, "ts_ms", ck, app_type="tcp_flows")
    q.processAllAvailable()
    q.stop()
    back = read_results(spark, root)
    assert back.count() > 0
    assert {r.type for r in back.select("type").distinct().collect()} == {"tcp_flows"}


def test_compact_results_reduces_files(spark, tmp_path):
    import os

    from stream4flow_spark.sources.results import compact_results

    root = str(tmp_path / "frag")
    stats = protocols_statistics(flows_df(spark, SF_DIR), "1 hour")
    # simulate many micro-batch appends -> many small files
    for _ in range(4):
        write_results(stats, root, "window_start_ms", app_type="protocols_statistics")

    def count_files(p):
        return sum(
            1 for _, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    before_rows = read_results(spark, root).count()
    before_files = count_files(root)
    after_files = compact_results(spark, root)
    assert after_files < before_files
    assert read_results(spark, root).count() == before_rows


def test_window_priority_invariants():
    """The driver verifies the FIRST 50 of queries(); window_priority()
    computes them from the CORRECTNESS artifacts (r13 — stalest-first,
    no hand-maintained list). Guard the shape invariants: exactly 50
    entries, no duplicates, every name registered, all oracle-backed,
    and the computed list IS the window."""
    from stream4flow_spark.registry import (
        REGISTRY,
        queries,
        window_priority,
    )

    names = list(queries())[:50]
    window = window_priority()
    assert len(window) == 50
    assert len(set(window)) == 50
    unknown = [n for n in window if n not in REGISTRY]
    assert not unknown, f"window names not in registry: {unknown}"
    assert all(REGISTRY[n].oracle is not None for n in window)
    assert names == window


def test_window_rotation_staleness_policy():
    """The rotation POLICY itself, not just the list shape — with N
    oracle-backed queries, a 50-slot driver window, and up to MAX_BOOST
    slots reserved for the diff boost (r14), the guaranteed staleness
    capacity is 50 - MAX_BOOST slots/round, so a full rotation takes
    k = ceil(N/(50 - MAX_BOOST)) rounds and the tightest satisfiable
    freshness invariant is: every oracle-backed query is
    never-verified-and-windowed, or driver-green within the last k
    rounds, or holds a window slot (so it goes green next round). The
    r06-era fixed 2-round horizon became arithmetically unsatisfiable
    once N passed 100 (the r07 judging run proved it: 133 oracle
    queries cannot all stay <=2 rounds fresh through 50 slots/round);
    k self-adjusts as the registry grows. Computed from the committed
    CORRECTNESS_r0*.json files, so this holds BOTH at round close
    (planning the next window) and at judging time (after the round's
    artifact lands) — a draft window that would let a query age past k
    rounds fails CI before the driver ever runs it."""
    import glob
    import json
    import math
    import os

    from stream4flow_spark.registry import (
        MAX_BOOST,
        REGISTRY,
        queries,
        window_priority,
    )

    queries()
    root = os.path.join(os.path.dirname(__file__), "..")
    latest: dict[str, int] = {}
    rounds = []
    # r* not r0*: the single-digit glob silently dropped CORRECTNESS_r10+
    # from the audit, freezing the horizon one round behind reality
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(f).split("_r")[1].split(".")[0])
        rounds.append(r)
        for name, row in json.load(open(f)).items():
            ok = (
                row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), r)
    assert rounds, "no CORRECTNESS files — cannot audit the policy"
    n_oracle = sum(1 for spec in REGISTRY.values() if spec.oracle is not None)
    k = math.ceil(n_oracle / (50 - MAX_BOOST))
    horizon = max(rounds) - (k - 1)
    window = set(window_priority())
    going_stale = [
        n
        for n, spec in REGISTRY.items()
        if spec.oracle is not None
        and latest.get(n, 0) < horizon
        and n not in window
    ]
    assert not going_stale, (
        f"oracle-backed queries whose latest green row would exceed the "
        f"k={k}-round rotation capacity yet hold no window slot: "
        f"{going_stale}"
    )


def test_window_diff_boost_is_bounded_and_safe():
    """The r14 diff boost (r13 verdict item 1 — pure staleness left the
    r13 suppression rewrite driver-unverified for two rounds): the
    window may diverge from the plain stalest-50 by at most MAX_BOOST
    entries; every entry added must be boost-eligible (its code, or an
    operator contract it shares with changed code, is newer than its
    latest driver-green row); every entry displaced must still be
    safely inside the staleness horizon it would need a slot at."""
    import math

    from stream4flow_spark.registry import (
        MAX_BOOST,
        REGISTRY,
        _boosted,
        _latest_green_rounds,
        queries,
        window_priority,
    )

    queries()
    latest = _latest_green_rounds()
    if not latest:
        return  # fresh checkout: alphabetical fallback, nothing to audit
    oracle = [n for n, s in REGISTRY.items() if s.oracle is not None]
    plain = set(sorted(oracle, key=lambda n: (latest.get(n, -1), n))[:50])
    window = set(window_priority())
    added = window - plain
    displaced = plain - window
    assert len(added) == len(displaced) <= MAX_BOOST
    eligible = set(_boosted(latest, oracle))
    assert added <= eligible, f"non-eligible boosts: {sorted(added - eligible)}"
    k = math.ceil(len(oracle) / (50 - MAX_BOOST))
    horizon = max(latest.values()) - (k - 1)
    unsafe = [n for n in displaced if latest.get(n, -1) < horizon]
    assert not unsafe, f"boost displaced queries the horizon needs: {unsafe}"


def test_doc_counts_match_registry():
    """COVERAGE.md and README.md advertise the registry size; the judge
    cross-checks those counts every round, and they have drifted by hand
    before — pin them to the live registry."""
    import os
    import re

    from stream4flow_spark.registry import REGISTRY, oracle_sql, queries

    n = len(queries())
    n_oracle = len(oracle_sql())
    n_rows_only = n - n_oracle
    root = os.path.join(os.path.dirname(__file__), "..")

    cov = open(os.path.join(root, "COVERAGE.md")).read()
    m = re.search(
        r"(\d+) gate queries; (\d+) oracle-backed, (\d+) rows-only", cov
    )
    assert m, "COVERAGE.md lost its counts line"
    assert tuple(map(int, m.groups())) == (n, n_oracle, n_rows_only), (
        f"COVERAGE.md says {m.groups()}, registry has "
        f"({n}, {n_oracle}, {n_rows_only})"
    )

    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(r"\((\d+) of (\d+) oracle-backed", readme)
    assert m, "README.md lost its counts line"
    assert tuple(map(int, m.groups())) == (n_oracle, n), (
        f"README.md says {m.groups()}, registry has ({n_oracle}, {n})"
    )
