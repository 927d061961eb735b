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

Fault tolerance is a manifest-commit protocol (a poor-man's Delta log),
fixing the three failure modes of the naive in-memory-pointer version:

- IDEMPOTENT RETRY — ``foreachBatch`` may re-deliver a batch id after a
  failure. Every batch's effects are (a) the new snapshot ``v{batch_id}``
  and per-batch alert dir ``alerts/b{batch_id}``, both written with
  overwrite, and (b) a manifest row committed LAST. A retry of a batch
  ``<=`` the last committed id is skipped outright; a retry of a batch
  whose snapshot was written but whose manifest wasn't re-merges from the
  still-committed previous snapshot and overwrites — never double-counts.
- RESTART RECOVERY — the baseline pointer lives in the manifest under
  ``state_dir``, not in driver memory: a restarted query (checkpoint
  skips processed files) recovers ``(batch_id, path, emitted_until)``
  from the newest manifest entry instead of silently starting empty.
- SNAPSHOT GC — after each manifest commit, superseded ``v*`` snapshot
  dirs and old manifest entries are deleted (Hadoop FS API, so the same
  code handles local/HDFS/S3 paths); disk stays O(1) snapshots instead
  of growing per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream4flow_spark.apps.detection_ddos import (
    ddos_score,
    ddos_window_aggregate,
)
from stream4flow_spark.operators.window_agg import duration_to_ms

_MANIFEST_SCHEMA = "batch_id long, path string, emitted_until long"


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


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    uri = jvm.java.net.URI.create(path)
    return jvm.org.apache.hadoop.fs.FileSystem.get(
        uri, spark._jsc.hadoopConfiguration()
    )


class DdosBaselineState:
    """Recoverable compacted-baseline state for the streaming detection.

    Exposed as a class (rather than a closure) so the idempotency and
    recovery contracts are directly testable: ``apply_batch`` may be
    called twice with the same ``batch_id`` (the second call is a no-op),
    and a fresh instance over the same ``state_dir`` resumes from the
    last committed manifest entry.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        window_duration: str = "30 seconds",
        long_window: str = "2 hours",
        network_filter: str = r"10\.0\..*",
        min_ratio: float = 50.0,
        min_packets: int = 100_000,
        retain_extra_windows: int = 2,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.window_duration = window_duration
        self.long_window = long_window
        self.network_filter = network_filter
        self.min_ratio = min_ratio
        self.min_packets = min_packets
        base_ms = duration_to_ms(window_duration)
        self.horizon_ms = duration_to_ms(long_window) + retain_extra_windows * base_ms
        self.alerts_dir = f"{state_dir}/alerts"
        self.manifest_dir = f"{state_dir}/manifest"
        # recovered pointer (None until the first commit)
        self.batch_id: int | None = None
        self.baseline_path: str | None = None
        self.emitted_until: int | None = None
        self._recover()

    # --- manifest ----------------------------------------------------

    def _manifest_entries(self) -> list[str]:
        fs = _fs(self.spark, self.manifest_dir)
        jvm = self.spark._jvm
        mpath = jvm.org.apache.hadoop.fs.Path(self.manifest_dir)
        if not fs.exists(mpath):
            return []
        return sorted(
            st.getPath().getName()
            for st in fs.listStatus(mpath)
            if st.getPath().getName().startswith("m")
        )

    def _recover(self) -> None:
        entries = self._manifest_entries()
        if not entries:
            return
        row = (
            self.spark.read.schema(_MANIFEST_SCHEMA)
            .json(f"{self.manifest_dir}/{entries[-1]}")
            .collect()[0]
        )
        self.batch_id = row["batch_id"]
        self.baseline_path = row["path"]
        self.emitted_until = row["emitted_until"]

    def _commit(self, batch_id: int, path: str, emitted_until: int | None) -> None:
        self.spark.createDataFrame(
            [(batch_id, path, emitted_until)], _MANIFEST_SCHEMA
        ).coalesce(1).write.mode("overwrite").json(
            f"{self.manifest_dir}/m{batch_id:012d}"
        )
        self.batch_id = batch_id
        self.baseline_path = path
        self.emitted_until = emitted_until
        self._gc(keep_snapshot=path, keep_manifest=f"m{batch_id:012d}")

    def _gc(self, keep_snapshot: str, keep_manifest: str) -> None:
        """Delete superseded snapshots + manifest entries (best effort)."""
        jvm = self.spark._jvm
        fs = _fs(self.spark, self.state_dir)
        root = jvm.org.apache.hadoop.fs.Path(self.state_dir)
        keep = keep_snapshot.rstrip("/").rsplit("/", 1)[-1]
        if fs.exists(root):
            for st in fs.listStatus(root):
                name = st.getPath().getName()
                if name.startswith("v") and name != keep:
                    fs.delete(st.getPath(), True)
        for entry in self._manifest_entries():
            if entry != keep_manifest:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{self.manifest_dir}/{entry}"),
                    True,
                )

    # --- scoring -----------------------------------------------------

    def _score(self, partials: DataFrame) -> DataFrame:
        return ddos_score(
            partials,
            window_duration=self.window_duration,
            long_window=self.long_window,
            min_ratio=self.min_ratio,
            min_packets=self.min_packets,
        )

    # --- batch application -------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.batch_id is not None and batch_id <= self.batch_id:
            return  # retry of an already-committed batch: full no-op
        spark = self.spark
        partials = ddos_window_aggregate(
            batch_df, self.window_duration, self.network_filter
        )
        if self.baseline_path is not None:
            partials = merge_ddos_partials(
                spark.read.parquet(self.baseline_path), partials
            )
        merged = partials.persist()
        try:
            hi = merged.agg(F.max("window_start_ms")).collect()[0][0]
            if hi is None:
                # empty batch: commit the pointer advance only
                if self.baseline_path is not None:
                    self._commit(batch_id, self.baseline_path, self.emitted_until)
                return
            # Alerts for windows that just completed: newer data exists,
            # so (in order) their aggregates are final. Half-open interval
            # [emitted_until, hi) guards against double emission; the
            # per-batch overwrite dir guards against retry duplication.
            done = self._score(merged).filter(F.col("window_start_ms") < hi)
            if self.emitted_until is not None:
                done = done.filter(
                    F.col("window_start_ms") >= self.emitted_until
                )
            done.write.mode("overwrite").parquet(
                f"{self.alerts_dir}/b{batch_id:012d}"
            )
            # Baseline GC before the write: anything older than the long
            # horizon behind the newest window can never enter a future
            # RANGE frame. (Scoring above ran PRE-filter, so windows near
            # the cut still saw their full trailing baseline.)
            path = f"{self.state_dir}/v{batch_id:012d}"
            merged.filter(
                F.col("window_start_ms") >= F.lit(hi - self.horizon_ms)
            ).write.mode("overwrite").parquet(path)
            self._commit(batch_id, path, hi)
        finally:
            merged.unpersist()

    def alerts(self) -> DataFrame:
        """All alerts: committed per-batch dirs + the still-open tail.

        The tail (windows ``>= emitted_until``, final once the source is
        drained) is scored ON READ and never persisted — persisting it
        would double-emit those windows after a restart ingests more data
        and completes them into a ``b*`` dir."""
        assert self.baseline_path is not None, "no committed baseline"
        tail = self._score(self.spark.read.parquet(self.baseline_path))
        if self.emitted_until is not None:
            tail = tail.filter(
                F.col("window_start_ms") >= F.lit(self.emitted_until)
            )
        jvm = self.spark._jvm
        fs = _fs(self.spark, self.alerts_dir)
        apath = jvm.org.apache.hadoop.fs.Path(self.alerts_dir)
        batch_dirs = (
            sorted(
                f"{self.alerts_dir}/{st.getPath().getName()}"
                for st in fs.listStatus(apath)
                if st.getPath().getName().startswith("b")
            )
            if fs.exists(apath)
            else []
        )
        if not batch_dirs:
            return tail
        committed = self.spark.read.schema(tail.schema).parquet(*batch_dirs)
        return committed.unionByName(tail)


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
    state = DdosBaselineState(
        stream_flows.sparkSession,
        state_dir,
        window_duration=window_duration,
        long_window=long_window,
        network_filter=network_filter,
        min_ratio=min_ratio,
        min_packets=min_packets,
        retain_extra_windows=retain_extra_windows,
    )
    q = (
        stream_flows.writeStream.foreachBatch(state.apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()

    assert state.baseline_path is not None, "stream produced no batches"
    return state.alerts()
