"""Streaming detection_ddos — a ``foreachBatch``-compacted baseline table.

The reference runs this detection as a DStream program with a 2-hour
``.window()`` over 30 s micro-batches
(applications/detection/ddos/spark/detection_ddos.py:122-152), i.e. it
re-holds two hours of raw batch RDDs in executor memory. The Spark-first
streaming shape (SURVEY §7.2) keeps NO raw flows:

- each micro-batch is reduced to per-(window, host) in/out partials by
  the SAME ``ddos_window_aggregate`` stage the batch app uses;
- partials merge into a compacted parquet baseline table (sums add,
  attacker sets union — a commutative monoid, so batch boundaries may
  split a window arbitrarily). State is O(hosts × windows-in-horizon)
  aggregates, not O(flows);
- alerts are emitted per batch for windows that became COMPLETE (a newer
  window has appeared — under in-order arrival a window stops changing
  once the next one starts), scored by the SAME ``ddos_score`` analytic;
  the drain-end flush scores the still-open tail. Batch/stream parity is
  therefore structural, and is asserted in tests/test_streaming.py;
- baseline GC (the ST2 analogue): windows older than the long horizon
  behind the newest window can never enter a future RANGE frame and are
  dropped, so the baseline table cannot grow without bound.

Compaction writes versioned snapshots (``v{batch_id}``) and reads the
previous version — a poor-man's Delta commit: the new snapshot is fully
written before the pointer advances, so a failed batch never corrupts
the baseline. Late (out-of-order) data would re-open an already-scored
window; production hardening is a watermark-delayed completion mark,
exactly as in the windowed streaming apps (``streaming/runner.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.apps.detection_ddos import (
    ddos_score,
    ddos_window_aggregate,
)
from stream4flow_spark.operators.window_agg import duration_to_ms


def merge_ddos_partials(prev: DataFrame, new: DataFrame) -> DataFrame:
    """Compact two partial tables: sums add, attacker sets union."""
    return (
        prev.unionByName(new)
        .groupBy("window_start_ms", "host")
        .agg(
            F.sum("inc").alias("inc"),
            F.sum("out").alias("out"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("attacker_set")))
            ).alias("attacker_set"),
        )
    )


def detection_ddos_stream(
    stream_flows: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    window_duration: str = "30 seconds",
    long_window: str = "2 hours",
    network_filter: str = r"10\.0\..*",
    min_ratio: float = 50.0,
    min_packets: int = 100_000,
    retain_extra_windows: int = 2,
) -> DataFrame:
    """Drain ``stream_flows`` (availableNow) through the compacted-baseline
    ``foreachBatch`` loop, emitting alerts as windows complete. Returns the
    accumulated alert DataFrame — identical rows to ``detection_ddos`` over
    the same (in-order) flows."""
    spark = stream_flows.sparkSession
    base_ms = duration_to_ms(window_duration)
    horizon_ms = duration_to_ms(long_window) + retain_extra_windows * base_ms
    alerts_dir = f"{state_dir}/alerts"
    holder: dict[str, object] = {"path": None, "emitted_until": None}

    def score(partials: DataFrame) -> DataFrame:
        return ddos_score(
            partials,
            window_duration=window_duration,
            long_window=long_window,
            min_ratio=min_ratio,
            min_packets=min_packets,
        )

    def update(batch_df: DataFrame, batch_id: int) -> None:
        partials = ddos_window_aggregate(batch_df, window_duration, network_filter)
        if holder["path"] is not None:
            partials = merge_ddos_partials(
                spark.read.parquet(str(holder["path"])), partials
            )
        path = f"{state_dir}/v{batch_id}"
        partials.write.mode("overwrite").parquet(path)
        holder["path"] = path
        merged = spark.read.parquet(path)

        hi = merged.agg(F.max("window_start_ms")).collect()[0][0]
        if hi is None:
            return
        # Emit alerts for windows that just completed: newer data exists,
        # so (in order) their aggregates are final. Half-open interval
        # [emitted_until, hi) guards against double emission.
        lo = holder["emitted_until"]
        done = score(merged).filter(F.col("window_start_ms") < hi)
        if lo is not None:
            done = done.filter(F.col("window_start_ms") >= lo)
        done.write.mode("append").parquet(alerts_dir)
        holder["emitted_until"] = hi

        # Baseline GC: anything older than the long horizon behind the
        # newest window can never enter a future RANGE frame.
        spark.read.parquet(path).filter(
            F.col("window_start_ms") >= F.lit(hi - horizon_ms)
        ).write.mode("overwrite").parquet(f"{path}_gc")
        holder["path"] = f"{path}_gc"

    q = (
        stream_flows.writeStream.foreachBatch(update)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()

    assert holder["path"] is not None, "stream produced no batches"
    # Flush: the still-open newest window(s) are final once the source is
    # drained.
    tail = score(spark.read.parquet(str(holder["path"])))
    if holder["emitted_until"] is not None:
        tail = tail.filter(
            F.col("window_start_ms") >= F.lit(holder["emitted_until"])
        )
    tail.write.mode("append").parquet(alerts_dir)
    return spark.read.parquet(alerts_dir)
