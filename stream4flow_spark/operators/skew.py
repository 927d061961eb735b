"""Skew-safe aggregation via salting.

AQE handles skewed *joins* (``spark.sql.adaptive.skewJoin``); skewed
*aggregations* with non-reducible state — ``collect_set``/``collect_list``
on a hot key (e.g. a DDoS victim with millions of distinct attackers,
detection_ddos A13) — still funnel every value of the hot key through one
task. Salting splits that key across ``salt_buckets`` tasks in a first
aggregation, then merges the (much smaller) per-bucket results in a
second.

Plain sums/counts/min/max do NOT need this: Catalyst's partial
aggregation already combines map-side. Use only for per-key state that
grows with group size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "values",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-key sorted distinct-value array, skew-safe.

    The salt is ``xxhash64(value) % salt_buckets`` — deterministic and
    value-derived, so duplicates of one value land in the SAME bucket and
    are deduplicated in stage 1; stage 2 only concatenates disjoint
    bucket sets. Per-task state is bounded by |distinct values| /
    salt_buckets instead of |distinct values|.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    stage1 = df.groupBy(*key_cols, salt.alias("__salt")).agg(
        F.collect_set(value_col).alias("__bucket_set")
    )
    return stage1.groupBy(*key_cols).agg(
        F.array_sort(F.flatten(F.collect_list("__bucket_set"))).alias(out_col)
    )


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact per-key distinct count, skew-safe: dedup within value-derived
    salt buckets, then sum bucket cardinalities (buckets are disjoint)."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    stage1 = df.groupBy(*key_cols, salt.alias("__salt")).agg(
        F.countDistinct(value_col).alias("__n")
    )
    return stage1.groupBy(*key_cols).agg(F.sum("__n").alias(out_col))
