"""Batch/stream parity (SURVEY.md §2.1 S1-S4, §2.5, §2.6).

The app pipelines are source-agnostic DataFrame→DataFrame functions; these
tests run them under Structured Streaming (file source → memory sink,
availableNow trigger) and assert bit-identical results to the batch path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from stream4flow_spark.apps.protocols_statistics import protocols_statistics
from stream4flow_spark.fixtures.flows import flows_df
from stream4flow_spark.streaming import (
    run_stream_to_table,
    stream_flows_df,
    suppress_reports_stream,
)
from tests.conftest import SF_DIR


def _sorted_pdf(df, keys):
    return (
        df.toPandas()
        .sort_values(keys, kind="mergesort")
        .reset_index(drop=True)
    )


def test_stream_protocols_statistics_matches_batch(spark):
    batch = protocols_statistics(flows_df(spark, SF_DIR), "1 hour")
    stream = protocols_statistics(stream_flows_df(spark, SF_DIR), "1 hour")
    got = run_stream_to_table(stream, output_mode="complete")
    keys = ["window_start_ms", "protocol"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_stream_suppression_matches_batch(spark, tmp_path):
    from stream4flow_spark.operators.suppression import suppress_reports

    # alert stream: 2 keys, alerts every 10s, suppression window 25s
    rows = [
        ("a", t * 10_000, float(t)) for t in range(10)
    ] + [("b", 5_000 + t * 40_000, 1.0) for t in range(4)]
    pdf = pd.DataFrame(rows, columns=["key", "ts_ms", "flows"])
    src = tmp_path / "alerts"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))

    batch_alerts = spark.read.parquet(str(src))
    expect = _sorted_pdf(
        suppress_reports(batch_alerts, ["key"], "ts_ms", 25_000, ["flows"]),
        ["key", "report_seq"],
    )

    stream_alerts = spark.readStream.schema(batch_alerts.schema).parquet(str(src))
    got_df = suppress_reports_stream(stream_alerts, ["key"], "ts_ms", 25_000, ["flows"])
    got = _sorted_pdf(
        run_stream_to_table(got_df, output_mode="append"), ["key", "report_seq"]
    )
    pd.testing.assert_frame_equal(got, expect)


def test_stream_suppression_state_across_batches(spark, tmp_path):
    """Greedy chain must continue from stored state between micro-batches."""
    from stream4flow_spark.operators.suppression import suppress_reports

    src = tmp_path / "alerts2"
    src.mkdir()
    # file 1: t=0..40s; file 2: t=50..90s (one file per micro-batch)
    p1 = pd.DataFrame(
        [("k", t * 10_000, 1.0) for t in range(5)], columns=["key", "ts_ms", "flows"]
    )
    p2 = pd.DataFrame(
        [("k", 50_000 + t * 10_000, 1.0) for t in range(5)],
        columns=["key", "ts_ms", "flows"],
    )
    spark.createDataFrame(p1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(p2).coalesce(1).write.parquet(str(src / "f2"))

    batch_alerts = spark.read.parquet(f"{src}/f*")
    expect = _sorted_pdf(
        suppress_reports(batch_alerts, ["key"], "ts_ms", 25_000, ["flows"]),
        ["key", "report_seq"],
    )

    stream_alerts = (
        spark.readStream.schema(batch_alerts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    got_df = suppress_reports_stream(
        stream_alerts, ["key"], "ts_ms", 25_000, ["flows"]
    )
    got = _sorted_pdf(
        run_stream_to_table(got_df, output_mode="append"), ["key", "report_seq"]
    )
    pd.testing.assert_frame_equal(got, expect)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """J4 streaming form: native stream-stream join with watermarks equals
    the batch bucketized interval join."""
    import pandas as pd

    from stream4flow_spark.operators.interval_join import interval_join
    from stream4flow_spark.streaming.joins import stream_interval_join

    # realistic epoch base: timestamps at/near epoch 0 collide with the
    # watermark's floor and would be dropped as late
    B = 1_600_000_000_000
    answers = pd.DataFrame(
        [("c1", "8.8.8.8", B + t * 1_000) for t in range(20)]
        + [("c2", "9.9.9.9", B + 5_000)],
        columns=["client_ip", "resolved_ip", "answer_ms"],
    )
    conns = pd.DataFrame(
        [("c1", "8.8.8.8", B + t * 1_000 + 500) for t in range(0, 40, 2)]
        + [("c2", "9.9.9.9", B + 11_000), ("c3", "7.7.7.7", B + 5_000)],
        columns=["client_ip", "resolved_ip", "conn_ms"],
    )
    pa, pc = tmp_path / "answers", tmp_path / "conns"
    spark.createDataFrame(answers).coalesce(1).write.parquet(str(pa))
    spark.createDataFrame(conns).coalesce(1).write.parquet(str(pc))

    ba, bc = spark.read.parquet(str(pa)), spark.read.parquet(str(pc))
    expect = _sorted_pdf(
        interval_join(
            ba, bc, ["client_ip", "resolved_ip"], "answer_ms", "conn_ms", 2_000
        ),
        ["client_ip", "resolved_ip", "answer_ms", "conn_ms"],
    )

    sa = spark.readStream.schema(ba.schema).parquet(str(pa))
    sc = spark.readStream.schema(bc.schema).parquet(str(pc))
    got_df = stream_interval_join(
        sa, sc, ["client_ip", "resolved_ip"], "answer_ms", "conn_ms", 2_000
    )
    got = _sorted_pdf(
        run_stream_to_table(got_df, output_mode="append"),
        ["client_ip", "resolved_ip", "answer_ms", "conn_ms"],
    )
    pd.testing.assert_frame_equal(
        got[expect.columns], expect
    )


def test_stream_tls_classification_matches_batch(spark):
    """A second full app under streaming (explode fan-out + broadcast
    dim join + windowed agg). Rank-window apps (e.g. dns_statistics'
    global top-100) are deliberately NOT streamed — in streaming the
    top-k runs on the result table (read-side), not in-stream."""
    import pandas as pd

    from stream4flow_spark.apps.tls_classification import tls_classification
    from stream4flow_spark.functions.tls import tls_dimension

    dim = tls_dimension(spark)
    batch = tls_classification(flows_df(spark, SF_DIR), dim, "1 hour")
    stream = tls_classification(stream_flows_df(spark, SF_DIR), dim, "1 hour")
    got = run_stream_to_table(stream, output_mode="complete")
    keys = list(batch.columns)
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_watermark_drops_data_later_than_delay(spark, tmp_path):
    """Event-time windowed agg with watermark (append mode): a late row
    inside the watermark is counted; a row later than the watermark is
    dropped; only watermark-finalized windows are emitted."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    T0 = 1_600_000_000_000
    base = T0 - (T0 % 60_000)  # minute-align

    def write(name, rows):
        # flat files (not Spark's per-write subdirectories) so the file
        # source lists them as three separate inputs
        pdf = pd.DataFrame(rows, columns=["ts_ms"])
        pdf.to_parquet(str(tmp_path / f"{name}.parquet"))
        _time.sleep(1.1)  # file-source orders batches by mod time

    m = 60_000
    # NB: the watermark computed from batch N's data takes effect in
    # batch N+2's late-row filter (one batch to compute, one to apply),
    # so the late row goes in its own later file.
    write("f1", [base + 10_000, base + 5 * m])            # wm -> +3min
    write("f2", [base + 6 * m + 30_000])                  # wm applies after this
    write("f3", [base + 20_000, base + 4 * m + 10_000])   # too-late; in-watermark
    write("f4", [base + 10 * m])                          # advance wm, finalize

    schema = "ts_ms long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    counts = (
        stream.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("w_ms"), "n")
    )
    got = {
        r.w_ms: r.n
        for r in run_stream_to_table(counts, output_mode="append").collect()
    }
    # late row at +20s was dropped (window end < watermark), so the base
    # window has 1, not 2; in-watermark late row at +4min10s was kept
    assert got == {base: 1, base + 4 * m: 1, base + 5 * m: 1, base + 6 * m: 1}


def test_stream_host_stats_approx_matches_batch(spark):
    """host_stats streams with exact_distinct=False (HLL sketches merge in
    streaming state; exact countDistinct cannot). HLL is deterministic on
    the same data, so batch-approx and stream-approx match exactly."""
    import pandas as pd

    from stream4flow_spark.apps.host_stats import host_stats

    batch = host_stats(
        flows_df(spark, SF_DIR), window_duration="1 hour", exact_distinct=False
    )
    stream = host_stats(
        stream_flows_df(spark, SF_DIR), window_duration="1 hour", exact_distinct=False
    )
    got = run_stream_to_table(stream, output_mode="complete")
    keys = ["window_start_ms", "src_ip"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_stream_host_daily_profile_cascade(spark):
    """W4 as chained streaming window aggregations (hourly -> daily via
    window_time): finalized days match the batch profile exactly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from stream4flow_spark.apps.host_daily_profile import (
        host_daily_profile,
        host_daily_profile_stream,
    )

    batch = host_daily_profile(flows_df(spark, SF_DIR))
    stream = host_daily_profile_stream(stream_flows_df(spark, SF_DIR))
    got = run_stream_to_table(stream, output_mode="append")

    # only watermark-finalized days emit; every emitted day must equal
    # the batch row bit for bit, and at least one day must have emitted
    days = [r.day_ms for r in got.select("day_ms").distinct().collect()]
    assert days, "no finalized day emitted"
    expect = batch.filter(F.col("day_ms").isin(days))
    keys = ["day_ms", "src_ip"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(expect, keys))


def test_stream_reflect_ddos_matches_batch(spark):
    """A detection app (union of query/reply legs + grouped sums +
    HAVING) under streaming, complete mode."""
    import pandas as pd

    from stream4flow_spark.apps.reflect_ddos import reflect_ddos

    kw = dict(dns_servers=["10.0.3.96", "10.0.2.47"], min_ratio=0.5, min_replies=1)
    batch = reflect_ddos(flows_df(spark, SF_DIR), **kw)
    stream = reflect_ddos(stream_flows_df(spark, SF_DIR), **kw)
    got = run_stream_to_table(stream, output_mode="complete")
    keys = list(batch.columns)
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_stream_ssh_auth_simple_matches_batch(spark):
    """Brute-force detection (band filters + grouped avg + HAVING) under
    streaming, complete mode."""
    import pandas as pd

    from stream4flow_spark.apps.ssh_auth_simple import ssh_auth_simple

    kw = dict(window_duration="1 hour", min_flows=2, packets_band=(1, 200),
              bytes_band=(40, 50_000), max_duration_ms=10**9)
    batch = ssh_auth_simple(flows_df(spark, SF_DIR), **kw)
    stream = ssh_auth_simple(stream_flows_df(spark, SF_DIR), **kw)
    got = run_stream_to_table(stream, output_mode="complete")
    keys = list(batch.columns)
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_stream_ports_scan_matches_batch(spark):
    """Scan detection (SYN filter + union of horizontal/vertical legs +
    collect_set aggregate + HAVING) under streaming, complete mode."""
    import pandas as pd

    from stream4flow_spark.apps.ports_scan import ports_scan

    kw = dict(window_duration="1 hour", min_targets=3)
    batch = ports_scan(flows_df(spark, SF_DIR), **kw)
    stream = ports_scan(stream_flows_df(spark, SF_DIR), **kw)
    got = run_stream_to_table(stream, output_mode="complete")
    keys = ["window_start_ms", "scan_type", "src_ip", "key"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def test_stream_dns_open_resolvers_matches_batch(spark):
    """Open-resolver detection (bit-test filters + RData decode +
    windowed agg) under streaming, complete mode."""
    import pandas as pd

    from stream4flow_spark.apps.dns_open_resolvers import dns_open_resolvers

    batch = dns_open_resolvers(flows_df(spark, SF_DIR))
    stream = dns_open_resolvers(stream_flows_df(spark, SF_DIR))
    got = run_stream_to_table(stream, output_mode="complete")
    keys = list(batch.columns)
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(batch, keys))


def _ddos_flows_pdf():
    """Two minutes of 10 s windows: victim 10.0.0.1 has steady in/out
    traffic, then an attack burst in windows 8-9; an unmonitored external
    host receives a bigger burst (must NOT alert — F6 network filter)."""
    rows = []
    v, ext = "10.0.0.1", "198.51.100.9"
    for w in range(12):
        t = w * 10_000
        rows.append((t + 1_000, v, "203.0.113.50", 10))  # outgoing
        rows.append((t + 2_000, "203.0.113.1", v, 10))  # incoming baseline
        rows.append((t + 3_000, "10.0.0.7", ext, 900))  # toward unmonitored
        if w in (8, 9):  # attack burst
            for a in range(5):
                rows.append((t + 4_000 + a, f"203.0.113.{100 + a}", v, 100))
    return pd.DataFrame(
        rows,
        columns=[
            "ipfix_flowStartMilliseconds",
            "ipfix_sourceIPv4Address",
            "ipfix_destinationIPv4Address",
            "ipfix_packetDeltaCount",
        ],
    )


def test_stream_detection_ddos_matches_batch(spark, tmp_path):
    """foreachBatch-compacted baseline (SURVEY §7.2): alerts accumulated
    across micro-batches must equal the batch analytic form."""
    from stream4flow_spark.apps.detection_ddos import detection_ddos
    from stream4flow_spark.streaming.ddos import detection_ddos_stream

    pdf = _ddos_flows_pdf()
    src = tmp_path / "ddosflows"
    src.mkdir()
    # three time-ordered slices -> three micro-batches, one splitting a
    # window across batches (rows 0..14 end mid-window)
    for i, chunk in enumerate([pdf.iloc[:15], pdf.iloc[15:30], pdf.iloc[30:]]):
        chunk.to_parquet(str(src / f"f{i}.parquet"), index=False)

    params = dict(
        window_duration="10 seconds",
        long_window="60 seconds",
        network_filter=r"^10\.0\.",
        min_ratio=3.0,
        min_packets=50,
    )
    batch_flows = spark.read.parquet(str(src))
    expect = _sorted_pdf(
        detection_ddos(batch_flows, **params), ["window_start_ms", "dst_ip"]
    )
    assert len(expect) >= 1  # the attack window(s)
    assert set(expect["dst_ip"]) == {"10.0.0.1"}  # F6: external never alerts

    stream_flows = (
        spark.readStream.schema(batch_flows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got_df = detection_ddos_stream(
        stream_flows,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **params,
    )
    got = _sorted_pdf(got_df, ["window_start_ms", "dst_ip"])[list(expect.columns)]
    pd.testing.assert_frame_equal(got, expect)


def test_stream_detection_ddos_gc_bounds_state(spark, tmp_path):
    """Baseline GC: after draining, the compacted state holds only windows
    within the long horizon of the newest window (ST2 analogue)."""
    from stream4flow_spark.streaming.ddos import detection_ddos_stream

    pdf = _ddos_flows_pdf()
    src = tmp_path / "ddosflows2"
    src.mkdir()
    for i, chunk in enumerate([pdf.iloc[:20], pdf.iloc[20:]]):
        chunk.to_parquet(str(src / f"f{i}.parquet"), index=False)
    batch_schema = spark.read.parquet(str(src)).schema
    stream_flows = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = tmp_path / "state2"
    detection_ddos_stream(
        stream_flows,
        state_dir=str(state),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        window_duration="10 seconds",
        long_window="30 seconds",  # horizon 30s + 2 extra windows
        network_filter=r"^10\.0\.",
        min_ratio=3.0,
        min_packets=50,
        retain_extra_windows=2,
    )
    latest = max(
        (p for p in state.iterdir() if p.name.startswith("v")),
        key=lambda p: (len(p.name), p.name),
    )
    rows = spark.read.parquet(str(latest)).collect()
    windows = {r.window_start_ms for r in rows}
    hi = max(windows)
    assert min(windows) >= hi - (30_000 + 2 * 10_000)
    assert len(windows) <= 6  # 12 windows of data, horizon keeps <= 6


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stop a checkpointed streaming query, add new input, restart with
    the SAME checkpoint: already-processed files are not reprocessed and
    the sink holds each record exactly once."""
    import time as _time

    import pandas as pd

    from stream4flow_spark.sources.results import read_results, write_results_stream

    src = tmp_path / "in"
    src.mkdir()
    root = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    B = 1_700_000_000_000

    def arrive(name, n0, n):
        pd.DataFrame(
            {"ts_ms": [B + i * 1000 for i in range(n0, n0 + n)]}
        ).to_parquet(str(src / f"{name}.parquet"))
        _time.sleep(0.2)

    def run_once():
        stream = spark.readStream.schema("ts_ms long").parquet(str(src))
        q = write_results_stream(stream, root, "ts_ms", ck, app_type="t")
        q.processAllAvailable()
        q.stop()

    arrive("f1", 0, 5)
    run_once()
    assert read_results(spark, root).count() == 5

    arrive("f2", 5, 7)
    run_once()  # restart from the same checkpoint
    back = read_results(spark, root)
    assert back.count() == 12  # 5 + 7, nothing duplicated
    assert back.select("ts_ms").distinct().count() == 12

def test_stream_join_then_windowed_agg_matches_batch(spark, tmp_path):
    """Stacked stateful operators: stream-stream interval join feeding a
    windowed count. Batches arrive over three files so the watermark can
    propagate through both operators; finalized windows must match the
    batch join + windowed count."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from stream4flow_spark.operators.interval_join import interval_join
    from stream4flow_spark.streaming.joins import stream_interval_join

    B = 1_600_000_000_000
    m = 60_000
    pa, pc = tmp_path / "ans", tmp_path / "con"
    pa.mkdir(), pc.mkdir()

    def write(d, name, rows, ts_col):
        pd.DataFrame(rows, columns=["k", ts_col]).to_parquet(
            str(d / f"{name}.parquet")
        )
        _time.sleep(1.1)

    # minute 0 and minute 1 pairs; a final far-future row per side
    # advances the watermark so those windows finalize
    write(pa, "a1", [("k1", B + 10_000), ("k1", B + m + 10_000)], "a_ts")
    write(pc, "c1", [("k1", B + 12_000), ("k1", B + m + 15_000), ("k1", B + m + 20_000)], "c_ts")
    write(pa, "a2", [("k9", B + 120 * m)], "a_ts")
    write(pc, "c2", [("k9", B + 120 * m)], "c_ts")

    ba = spark.read.parquet(str(pa))
    bc = spark.read.parquet(str(pc))
    expect_all = (
        interval_join(ba, bc, ["k"], "a_ts", "c_ts", 30_000)
        .withColumn("w_ms", F.col("a_ts") - F.col("a_ts") % m)
        .groupBy("w_ms", "k")
        .agg(F.count("*").alias("pairs"))
    )

    sa = (
        spark.readStream.schema("k string, a_ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pa))
    )
    sc = (
        spark.readStream.schema("k string, c_ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pc))
    )
    joined = stream_interval_join(
        sa, sc, ["k"], "a_ts", "c_ts", 30_000, watermark_delay="2 minutes",
        event_time_col="ts",
    )
    agg = (
        joined
        .groupBy(F.window("ts", "1 minute").alias("w"), "k")
        .agg(F.count("*").alias("pairs"))
        .select(F.unix_millis(F.col("w.start")).alias("w_ms"), "k", "pairs")
    )
    got = run_stream_to_table(agg, output_mode="append")
    wins = [r.w_ms for r in got.select("w_ms").distinct().collect()]
    assert wins, "no finalized window emitted"
    expect = expect_all.filter(F.col("w_ms").isin(wins))
    keys = ["w_ms", "k"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(expect, keys))
    # the minute-0 window must be among the finalized ones
    assert B - B % m + 0 in wins or B - B % m in wins


def test_stream_dns_external_resolvers_smoke(spark):
    """The app's streaming form (interval join -> windowed count) builds
    and drains; window finalization across batches is covered by
    test_stream_join_then_windowed_agg_matches_batch."""
    from stream4flow_spark.apps.dns_external_resolvers import (
        dns_external_resolvers_stream,
    )

    df = dns_external_resolvers_stream(
        stream_flows_df(spark, SF_DIR), proximity_ms=604_800_000
    )
    out = run_stream_to_table(df, output_mode="append")
    assert out.count() >= 0
