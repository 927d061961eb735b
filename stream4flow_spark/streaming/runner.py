"""Structured-Streaming harness — run the batch pipelines as streams.

The reference's execution model is micro-batch DStreams fed by Kafka
(applications/application_template/modules/kafkaIO.py:50-63); every app is
a streaming program. Here every app is a source-agnostic
``DataFrame -> DataFrame`` function, so streaming is *wiring*: swap the
batch parquet scan for a file-source ``readStream`` (or Kafka, see
``streaming.kafka``) and the identical transformation graph runs
incrementally. This module provides that wiring plus a test harness that
proves batch/stream parity on the driver testdata.

Scale notes: the file source parallelizes listing + reading per file
split; ``maxFilesPerTrigger`` bounds per-micro-batch work. Windowed
aggregations carry watermarks so state is evicted instead of growing
without bound — the reference's DStream ``.window()`` held the raw batch
RDDs in memory instead (host_daily_profile.py:307 hand-unpersisted them).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from stream4flow_spark.fixtures.flows import spark_flows_cte
from stream4flow_spark.sources.tables import normalize_ts


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The driver ``events`` table as a file-source stream.

    Schema comes from a batch peek (file-source streams require an explicit
    schema — inference would race the stream)."""
    # raw schema (nanos BIGINT under legacy nanosAsLong, TIMESTAMP_NTZ on
    # PySpark 4.1+) — the stream must read the physical type, then
    # normalize exactly like sources.tables
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source wants a directory; select just the events table
    reader = spark.readStream.schema(raw_schema).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_ts(reader.parquet(sf_dir), "ts")


def stream_flows_df(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of ``fixtures.flows.flows_df`` — same CTE text, so the
    streaming pipelines see bit-identical rows to the batch/oracle path."""
    view = f"__s4f_events_stream_{uuid.uuid4().hex[:8]}"
    stream_events(spark, sf_dir, max_files_per_trigger).createOrReplaceTempView(view)
    cte = spark_flows_cte().replace("__s4f_events", view)
    return spark.sql(f"WITH {cte} SELECT * FROM flows")


def run_stream_to_table(
    df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table and return it.

    Uses ``trigger(availableNow=True)`` — process everything currently in
    the source as micro-batches, then stop. This is the harness the parity
    tests use; production sinks are ``streaming.kafka.write_result_stream``
    or a partitioned-parquet ``writeStream``.
    """
    name = query_name or f"s4f_mem_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return df.sparkSession.table(name)
