"""Training-shard export — the pipeline's last mile.

Trainers consume a corpus as N roughly-equal shards with a STABLE
doc→shard assignment (resumable downloads, reproducible data order,
per-shard checksums). ``df.write.parquet`` alone gives none of that: its
file count follows the partitioning of whatever plan ran last, and a
re-run can scatter documents differently.

Here the shard id is the same engine-independent md5 coin as the
split/sample operators — `hash_bucket % n_shards` — so the assignment is
a pure function of the document key; ``repartition(n, shard)`` routes
each shard to exactly one task (one output file per shard, no
small-file spray), and an optional in-shard sort gives deterministic
row order WITHIN each file. A JSON manifest (per-shard rows/bytes)
rides along for integrity checks.

At 100 TB, shard count is the write parallelism AND the trainer's unit
of work — size it so a shard is a few GB (the repartition is one full
shuffle, the unavoidable cost of balanced output).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.sampling import hash_bucket


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "s4f-shard",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id in [0, n_shards) from the document key."""
    return df.withColumn(
        shard_col, hash_bucket(F.col(key_col), salt) % n_shards
    )


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    sort_in_shard: bool = True,
    salt: str = "s4f-shard",
) -> dict:
    """Export ``df`` as ``n_shards`` parquet shards + ``manifest.json``.

    Returns the manifest dict: {"n_shards", "total_rows", "shards":
    {shard_id: rows}}. Assignment is reproducible across runs/engines;
    each shard is written by one task (one file per shard directory).
    """
    sharded = assign_shards(df, n_shards, key_col, salt).repartition(
        n_shards, F.col("shard")
    )
    if sort_in_shard:
        sharded = sharded.sortWithinPartitions("shard", key_col)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    spark = df.sparkSession
    counts = {
        int(r.shard): r.cnt
        for r in spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "total_rows": int(sum(counts.values())),
        "shards": {str(k): int(v) for k, v in sorted(counts.items())},
    }
    # Underscore prefix: Spark/Hadoop directory listings skip files
    # starting with '_' or '.', so a later ``spark.read.parquet(out_dir)``
    # (or pyarrow dataset scan) never tries to parse the manifest as a
    # parquet footer. Written through the JVM Hadoop FS API so exports to
    # HDFS/S3 paths work, with a plain-file fallback for bare local paths.
    _write_side_file(
        spark,
        os.path.join(out_dir, "_manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def _write_side_file(spark, path: str, content: str) -> None:
    """Write a small text side-file via Hadoop FS (HDFS/S3-capable)."""
    try:
        jvm = spark._jvm
        jsc = spark.sparkContext._jsc
        conf = jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        out = fs.create(p, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
    except Exception:  # pragma: no cover - local-fs fallback
        with open(path, "w") as f:
            f.write(content)


def verify_shards(spark, out_dir: str) -> dict:
    """Integrity check for a shard export: recompute per-shard row
    counts from the parquet files and diff them against the stored
    ``_manifest.json``. Returns {"ok", "total_rows", "mismatched":
    {shard: (manifest, actual)}} — the consumer-side handshake before a
    trainer trusts a download (a missing/duplicated shard file shows up
    as a count diff; assignment determinism makes counts sufficient)."""
    import json as _json

    manifest = _json.loads(_read_side_file(spark, f"{out_dir}/_manifest.json"))
    actual = {
        str(r.shard): int(r.cnt)
        for r in spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    mism = {
        s: (manifest["shards"].get(s), actual.get(s))
        for s in set(manifest["shards"]) | set(actual)
        if manifest["shards"].get(s) != actual.get(s)
    }
    return {
        "ok": not mism,
        "total_rows": sum(actual.values()),
        "mismatched": mism,
    }


def _read_side_file(spark, path: str) -> str:
    """Read a small text side-file via the Hadoop FS API (local/HDFS/S3).
    ``spark.read.text`` can't do this: underscore-prefixed side files
    are exactly the ones Spark's file listing hides."""
    try:
        jvm = spark._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        stream = fs.open(p)
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    except Exception:  # pragma: no cover - local-fs fallback
        with open(path) as f:
            return f.read()


def assign_curriculum_shards(
    df: DataFrame,
    n_shards: int,
    score_col: str,
    key_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """CURRICULUM shard assignment: shard id = the document's
    ``score_col`` quantile bucket (0 = lowest scores), so a trainer
    consuming shards in order sees easy→hard (or clean→noisy — any
    difficulty proxy: quality score, perplexity, length). Within a
    score bucket, order is the trainer's choice; ACROSS buckets the
    curriculum is the shard order itself — no global sort of the corpus
    ever happens.

    Same distributed shape as the global rank in operators/topk.py:
    ``ntile``-free two-pass — exact per-shard boundaries would need a
    full sort, so boundaries come from approxQuantile (driver-bounded,
    n_shards-1 doubles, the z-order/IVF pattern) and assignment is one
    map-side fold; ties on a boundary value all land in the lower
    shard, deterministically, so re-runs agree."""
    probs = [i / n_shards for i in range(1, n_shards)]
    bs = (
        df.select(F.col(score_col).cast("double").alias("__s"))
        .na.drop()
        .approxQuantile("__s", probs, 0.001)
    )
    bs = sorted(set(bs))
    v = F.col(score_col).cast("double")
    bucket = F.aggregate(
        F.lit(bs), F.lit(0), lambda acc, b: acc + (v > b).cast("int")
    )
    # null scores land in the last shard
    return df.withColumn(
        shard_col,
        F.when(v.isNotNull(), bucket).otherwise(F.lit(len(bs))),
    )


def write_curriculum_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    score_col: str,
    key_col: str = "doc_id",
) -> dict:
    """``write_shards`` with curriculum (score-quantile) assignment:
    shard 0 holds the lowest-scoring documents, shard n-1 the highest —
    consume in shard order for a curriculum, shuffled for IID. Returns
    the manifest with per-shard mean score added."""
    sharded = assign_curriculum_shards(
        df, n_shards, score_col, key_col
    ).repartition(n_shards, "shard")
    spark = df.sparkSession
    (
        sharded.sortWithinPartitions("shard", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    stats = {
        int(r.shard): {"rows": r.rows, "mean_score": r.mean_score}
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            F.round(F.avg(F.col(score_col).cast("double")), 6).alias(
                "mean_score"
            ),
        )
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "curriculum_by": score_col,
        "shards": stats,
    }
    _write_side_file(
        spark, f"{out_dir}/manifest.json", json.dumps(manifest, sort_keys=True)
    )
    return manifest
