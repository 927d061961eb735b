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
    """Streaming sink to the same store. Returns the StreamingQuery.

    - ``append`` (watermarked/finalized rows): native parquet file sink,
      exactly-once via checkpoint + the sink's transaction log.
    - ``complete`` (full re-emitted aggregate state): the parquet sink
      can't take it, so a ``foreachBatch`` overwrites the store each
      trigger — the standard pattern for materializing a complete-mode
      aggregation as a table.
    """
    cols = ["result_date"] + (["type"] if app_type is not None else [])
    if output_mode == "complete":

        def overwrite(batch_df: DataFrame, _batch_id: int) -> None:
            (
                with_result_partitions(batch_df, ts_ms_col, app_type)
                .write.partitionBy(*cols)
                .mode("overwrite")
                .parquet(root)
            )

        return (
            results.writeStream.foreachBatch(overwrite)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
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


def compact_results(
    spark: SparkSession, root: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Rewrite the store with one file per partition-chunk — the
    small-files cure for streaming sinks (every micro-batch appends a
    file; a day of 5 s triggers is 17k files/partition).

    Local/simple strategy: stage a full rewrite next to the store, then
    swap directories. At real scale this would run per-partition and
    incrementally (only partitions whose file count exceeds a threshold),
    but the rewrite plan — read, repartition on the partition columns so
    each output task writes one file per partition, write, swap — is the
    same. Returns the number of files after compaction."""
    import os
    import shutil

    df = spark.read.parquet(root)
    part_cols = [c for c in ("result_date", "type") if c in df.columns]
    tmp = root.rstrip("/") + ".compacting"
    (
        df.repartition(*part_cols)
        .write.partitionBy(*part_cols)
        .mode("overwrite")
        .parquet(tmp)
    )
    old = root.rstrip("/") + ".old"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    return sum(
        1
        for _, _, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    )
