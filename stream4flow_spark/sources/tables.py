"""Batch table loaders for the driver testdata directories.

`events.ts` is written as parquet TIMESTAMP(NANOS); Spark reads it (under
``spark.sql.legacy.parquet.nanosAsLong=true``) as a nanos BIGINT, which
``load_table`` normalizes to a microsecond TimestampType column with
``timestamp_micros(ts DIV 1000)`` — integer division, no double round-trip,
so it truncates exactly like DuckDB's ns→µs cast does.

All loads are plain parquet scans: column pruning and predicate pushdown
reach the scan untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as nanosecond timestamps (read back as long under
# nanosAsLong) that must be normalized to TimestampType.
_NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view (used by the SQL read-side)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
