"""Result-table store — the engine's replacement for the reference's
Elasticsearch sink (SURVEY.md §3.2).

The reference shipped every app's JSON to Logstash → daily ES indexes
(`spark-YYYY.MM.dd`), and the web controllers aggregated over them. Here
results land in date-partitioned parquet with a `@type` tag — the same
table serves the batch writers, the streaming sinks, and the read-side
queries (plans.readside), so dashboards query exactly what the pipelines
wrote.

Layout: ``<root>/result_date=YYYY-MM-DD/part-*.parquet`` (+ further
``@type`` subpartitioning when multiple apps share a root). Partition
pruning makes the read-side's time-range filters (Q1/Q3) touch only the
days they need — the equivalent of ES's daily-index pruning, for free
from the parquet source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_result_partitions(
    results: DataFrame, ts_ms_col: str, app_type: str | None = None
) -> DataFrame:
    """Add the partition columns: `result_date` (from the result's
    event-time ms column) and optionally the `@type` tag (O1)."""
    out = results.withColumn(
        "result_date", F.to_date(F.timestamp_millis(F.col(ts_ms_col)))
    )
    if app_type is not None:
        out = out.withColumn("type", F.lit(app_type))
    return out


def write_results(
    results: DataFrame,
    root: str,
    ts_ms_col: str,
    app_type: str | None = None,
    mode: str = "append",
) -> None:
    """Batch write to the partitioned result store."""
    cols = ["result_date"] + (["type"] if app_type is not None else [])
    (
        with_result_partitions(results, ts_ms_col, app_type)
        .write.partitionBy(*cols)
        .mode(mode)
        .parquet(root)
    )


def write_results_stream(
    results: DataFrame,
    root: str,
    ts_ms_col: str,
    checkpoint_dir: str,
    app_type: str | None = None,
    output_mode: str = "append",
):
    """Streaming sink to the same store (exactly-once via checkpoint +
    file-sink transaction log). Returns the StreamingQuery."""
    cols = ["result_date"] + (["type"] if app_type is not None else [])
    return (
        with_result_partitions(results, ts_ms_col, app_type)
        .writeStream.partitionBy(*cols)
        .format("parquet")
        .option("path", root)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def read_results(spark: SparkSession, root: str) -> DataFrame:
    """Read the store back; `result_date` filters prune partitions."""
    return spark.read.parquet(root)
