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
