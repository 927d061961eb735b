"""Full-architecture integration: streaming app → date-partitioned result
store → read-side query over the store.

This is the engine's production shape (SURVEY §3.1-§3.3 collapsed): the
reference ran app → Kafka → Logstash → Elasticsearch → web2py
aggregation; here the streaming query writes the store directly and the
dashboard queries are Spark SQL on it. Rank/top-k runs on the READ side
(in-stream rank windows are unsupported and unnecessary)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream4flow_spark.apps.dns_statistics import dns_statistics
from stream4flow_spark.fixtures.flows import flows_df
from stream4flow_spark.plans import readside as R
from stream4flow_spark.sources.results import read_results, write_results_stream
from stream4flow_spark.streaming.runner import stream_flows_df
from tests.conftest import SF_DIR


def test_stream_app_to_store_to_readside_topk(spark, tmp_path):
    root = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    # 1. the streamable core of dns_statistics: windowed fan-out counts
    #    (its global top-100 is a read-side concern, not in-stream)
    counts = dns_statistics(
        stream_flows_df(spark, SF_DIR), window_duration="1 hour", top=None
    )
    q = write_results_stream(
        counts,
        root,
        "window_start_ms",
        ck,
        app_type="dns_statistics",
        output_mode="complete",
    )
    q.processAllAvailable()
    q.stop()

    # 2. the store round-trips the app output bit for bit
    stored = read_results(spark, root)
    batch = dns_statistics(flows_df(spark, SF_DIR), window_duration="1 hour", top=None)
    assert stored.count() == batch.count()

    # 3. read-side: top-1 key per stat_type over the store equals the
    #    same query over the direct batch output
    got = R.q6_top1_key_by_value(stored, "stat_type", "key", "value")
    want = R.q6_top1_key_by_value(batch, "stat_type", "key", "value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_flow_json_contract_roundtrip(spark):
    """S2/S3 — the Kafka wire contract without a broker: flows serialized
    as the reference's dotted-key JSON parse back bit for bit, and the
    result-sink payload shape (to_json of all columns) is valid JSON."""
    from stream4flow_spark.streaming.kafka import parse_flow_json

    flows = flows_df(spark, SF_DIR)
    cols = flows.columns

    # emit with the REFERENCE's dotted key spelling (ipfix.X)
    dotted = flows.select(
        F.to_json(
            F.struct(*[F.col(c).alias(c.replace("ipfix_", "ipfix.")) for c in cols])
        ).alias("value")
    )
    back = dotted.select(parse_flow_json(F.col("value")).alias("f")).select("f.*")
    assert back.columns == cols
    assert back.exceptAll(flows).count() == 0
    assert flows.exceptAll(back).count() == 0


def test_cli_runner_list_and_run(spark, tmp_path, capsys):
    """The CLI runs any registry query against any sf-dir (reference's
    run-application.sh surface)."""
    from stream4flow_spark.run import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "protocols_statistics" in out and "[oracle]" in out

    dest = str(tmp_path / "cli_out")
    rc = main(
        ["run", "protocols_statistics", "--sf-dir", SF_DIR,
         "--sink", f"parquet:{dest}"]
    )
    assert rc == 0
    assert spark.read.parquet(dest).count() > 0


def test_flowgen_source_feeds_apps_deterministically(spark):
    """The custom Python data source must produce schema-complete,
    seed-deterministic flows in parallel partitions, and the real app
    pipelines must run on them unchanged."""
    from stream4flow_spark.apps.protocols_statistics import (
        protocols_statistics,
    )
    from stream4flow_spark.schema import FLOW_COLUMNS
    from stream4flow_spark.sources.flowgen import FlowGenDataSource

    spark.dataSource.register(FlowGenDataSource)
    flows = (
        spark.read.format("flowgen")
        .option("rows", 2000)
        .option("partitions", 5)
        .load()
    )
    assert flows.columns == FLOW_COLUMNS
    assert flows.rdd.getNumPartitions() == 5
    assert flows.count() == 2000
    again = (
        spark.read.format("flowgen")
        .option("rows", 2000)
        .option("partitions", 3)  # different parallelism, same rows
        .load()
    )
    key = ["ipfix_sourceIPv4Address", "ipfix_flowStartMilliseconds"]
    assert sorted(map(tuple, flows.select(key).collect())) == sorted(
        map(tuple, again.select(key).collect())
    )
    stats = protocols_statistics(flows, "1 hour").collect()
    assert len(stats) >= 2  # tcp + udp at least
    assert {r.protocol for r in stats} <= {"tcp", "udp", "icmp", "other"}
