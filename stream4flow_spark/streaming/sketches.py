"""Streaming maintenance of the on-disk HLL sketch-rollup table —
the "materialize once at ingest" production story for
``operators/sketches.py`` (DEPLOY.md storage-layout section).

Each micro-batch folds its rows into per-(key, day) sketches and writes
them to a batch-keyed subdirectory (``batch=<id>``) — the llmingest
index pattern: ``mode("overwrite")`` on the batch dir makes a
foreachBatch redelivery REPLACE its own output, so retries are
idempotent and no cross-batch rewrite churn exists. Readers merge all
batch dirs with ``hll_union_agg`` — HLL registers are per-item maxima,
so the union of per-batch sketches is EXACTLY the sketch of the full
stream (identity property-tested, not approximate-merge).

State: none in the streaming query itself (the sketch table IS the
state, ~4 KB per (key, day, batch) row); a periodic
``compact_sketch_table`` collapses batch dirs without changing any
estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream4flow_spark.operators.sketches import sketch_rollup


def sketch_rollup_stream(
    events: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
    table_dir: str,
    lg_config_k: int = 12,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Start a foreachBatch query maintaining the sketch table at
    ``table_dir``. Returns the StreamingQuery (caller awaits/stops).

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — e.g.
    ``{"processingTime": "1 minute"}`` to run as a continuous
    maintainer. Defaults to ``{"availableNow": True}`` (drain what's
    there and stop — the backfill/test mode)."""

    def _fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        sk = sketch_rollup(
            batch_df.select(
                *key_cols, F.to_date(F.col(ts_col)).alias("day"), value_col
            ),
            [*key_cols, "day"],
            value_col,
            lg_config_k=lg_config_k,
        )
        # overwrite keyed by batch_id: redelivery replaces, never extends
        sk.write.mode("overwrite").parquet(
            f"{table_dir}/batch={batch_id}"
        )

    w = events.writeStream.foreachBatch(_fold_batch)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.trigger(**(trigger or {"availableNow": True})).start()


def read_sketch_table(
    spark: SparkSession,
    table_dir: str,
    key_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """The merged rollup view over every batch dir: one sketch per
    (key, day), identical to a batch ``sketch_rollup`` over the full
    stream. Pass to ``operators/sketches.sketch_merge`` for range /
    coarser-key questions."""
    raw = spark.read.option("basePath", table_dir).parquet(
        f"{table_dir}/batch=*"
    )
    return raw.groupBy(*key_cols, "day").agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def compact_sketch_table(
    spark: SparkSession,
    table_dir: str,
    key_cols: list[str],
    sketch_col: str = "hll",
) -> None:
    """Collapse all batch dirs into one (``batch=compacted-<n>``):
    estimates are unchanged (union identity); old dirs are removed via
    the Hadoop FS API so the compaction works on any scheme the cluster
    mounts.

    Crash-safe ordering: the merged sketch is renamed INTO the batch=*
    namespace first, superseded dirs are deleted after — a failure at
    any point leaves readers with a complete table (between rename and
    the deletes they see the data twice, which is harmless: HLL union
    is idempotent, registers are per-item maxima). Each compaction gets
    a fresh ``compacted-<n>`` suffix so it never overwrites the
    previous compaction in place."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(table_dir).getFileSystem(conf)
    old_dirs, gen = [], 0
    for status in fs.listStatus(path_cls(table_dir)):
        name = status.getPath().getName()
        if name.startswith("batch="):
            old_dirs.append(status.getPath())
            if name.startswith("batch=compacted-"):
                gen = max(gen, int(name.rsplit("-", 1)[1]))
    merged = read_sketch_table(spark, table_dir, key_cols, sketch_col)
    tmp = f"{table_dir}/__compacting"
    merged.write.mode("overwrite").parquet(tmp)
    fs.rename(path_cls(tmp), path_cls(f"{table_dir}/batch=compacted-{gen + 1}"))
    for p in old_dirs:
        fs.delete(p, True)
