"""Bucketed tables — pre-shuffled storage for repeated co-located joins.

At 100 TB the same fact-fact join key (orderkey, host, doc digest, ...)
is joined and re-joined across jobs; paying the exchange every time is
the single biggest avoidable shuffle cost. Writing both sides
``bucketBy(N, key)`` hash-partitions the data AT WRITE TIME into the
same bucket layout Spark's hash join needs, so every later equi-join or
aggregation on the key reads co-located buckets and plans with NO
Exchange on either side (asserted in tests/test_bucketing.py).

This is the batch analog of the streaming state-store partitioning: pay
the shuffle once, amortize it over every downstream query. Bucket count
is a real knob: it fixes the join parallelism for every consumer, so
size it to the cluster (cores × small multiple), not the dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket)
    parquet table in the session catalog.

    Sorting within buckets additionally lets sort-merge joins skip their
    per-task sort (and gives range-clustered scans for free)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a
    plain ``spark.read.parquet`` on the files would lose the bucket spec
    and reintroduce the exchange)."""
    return spark.table(table)
