"""Kafka source/sink wiring for Structured Streaming (SURVEY.md §2.1 S1-S3).

The reference consumed the IPFIXCol JSON stream from Kafka with a
Zookeeper receiver pinned to ONE partition (kafkaIO.py:57-58 — a 1-thread
ingest bottleneck by construction) and produced results by collecting every
micro-batch to the DRIVER and calling KafkaProducer there (kafkaIO.py:81-112).

Here both directions are fully distributed: ``readStream.format("kafka")``
consumes every partition in parallel, and the sink is
``writeStream.format("kafka")`` (executor-side producers, checkpointed).
No driver collect anywhere. Delivery to the results topic is
AT-LEAST-ONCE — Structured Streaming's Kafka sink can re-send a batch on
task retry/recovery — so consumers must dedupe on the deterministic
result key (every app's output rows are keyed by (window_start_ms, group
keys)); for exactly-once semantics, sink to the idempotent partitioned
parquet store (``sources/results.py``) and publish from there.

This module is wiring only — it needs the spark-sql-kafka package on the
classpath and a broker, neither of which exists in the test container; the
app pipelines themselves are source-agnostic DataFrame→DataFrame functions
tested via the file/memory harness in streaming.runner, and the JSON wire
contract (both directions) is pinned by tests/test_kafka_contract.py, so
the only untested piece is the broker itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream4flow_spark.schema import FLOW_SCHEMA


def parse_flow_json(value: "F.Column") -> "F.Column":
    """S2 — one JSON flow record (string) → typed flow struct.

    The reference's ``ipfix.X`` dotted keys map to ``ipfix_X`` columns
    (both spellings accepted via a pre-parse translate); absent keys
    become NULLs (from_json is null-tolerant by design, which replaces
    every per-app key-presence guard the reference needed). Usable from
    batch and streaming alike — the contract is tested without a broker.
    """
    return F.from_json(
        F.regexp_replace(value.cast("string"), r'"ipfix\.', '"ipfix_'),
        FLOW_SCHEMA,
    )


def read_flow_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "ipfix.entry",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka JSON flow stream → typed flow DataFrame (S1 + S2)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(parse_flow_json(F.col("value")).alias("flow")).select("flow.*")


def write_result_stream(
    results: DataFrame,
    brokers: str,
    topic: str = "results.output",
    checkpoint_dir: str = "/tmp/s4f-checkpoints",
    output_mode: str = "update",
):
    """JSON-lines results → Kafka (S3), executor-side, checkpointed."""
    payload = results.select(
        F.to_json(F.struct(*[F.col(c) for c in results.columns])).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def read_flow_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Live TCP JSON-lines flow stream → typed flow DataFrame.

    Same S2 parse contract as the Kafka path, over Spark's built-in
    socket source — the dev/demo live-network ingest (and, in this
    brokerless test container, the closest runnable stand-in for S1:
    tests/test_streaming.py drives it against a real local TCP server).
    Not for production (no replay/offsets); the Kafka source is the
    production path."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(parse_flow_json(F.col("value")).alias("flow")).select(
        "flow.*"
    )


def parse_flow_json_with_quarantine(df: DataFrame, value_col: str = "value") -> DataFrame:
    """S2 with a bad-records lane: parse the JSON value PERMISSIVEly and
    keep the raw line of anything malformed in ``_corrupt_record`` so a
    quarantine sink can persist it for replay — at ingest scale, dropping
    unparseable lines silently is how gaps become unexplainable.

    Returns the typed flow columns plus ``_corrupt_record`` (NULL for
    clean rows). Split with ``.filter(col("_corrupt_record").isNull())``
    / ``.isNotNull()`` — both lanes stay map-side."""
    from pyspark.sql import types as T

    from stream4flow_spark.schema import FLOW_SCHEMA

    schema_q = T.StructType(
        FLOW_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = F.from_json(
        F.regexp_replace(F.col(value_col).cast("string"), r'"ipfix\.', '"ipfix_'),
        schema_q,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return df.select(parsed.alias("flow")).select("flow.*")
