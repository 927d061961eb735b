"""Interval (time-proximity) equi-join — SURVEY.md §2.4 J4.

The reference joined DNS answers with TCP flows on (client, resolved IP)
and kept pairs with |Δt| ≤ 5 s (dns_external_resolvers.py:149-166) — a
per-microbatch RDD join. A naive translation is an equi-join followed by a
time filter, which is correct but materializes every same-key pair first.

The scalable plan is bucketization: quantize each side's timestamp into
``tolerance_ms``-wide buckets, explode the LEFT side into its bucket ±1,
and include the bucket in the equi-join key. Any pair within tolerance has
bucket distance ≤ 1, so no match is lost; each (left, right) pair joins at
most once because the right side keeps its single bucket. The exact
|Δt| ≤ tolerance predicate then prunes the survivors. Shuffle volume drops
from |key-cardinality pairs| to |bucket-local pairs| — the difference
between feasible and not at 100 TB with hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts_ms: str,
    right_ts_ms: str,
    tolerance_ms: int,
) -> DataFrame:
    """Inner equi-join on `on` keeping pairs with |left_ts - right_ts| ≤
    tolerance. All non-key columns from both sides are preserved (key
    columns once)."""
    lb = (F.col(left_ts_ms) / F.lit(tolerance_ms)).cast("long")
    rb = (F.col(right_ts_ms) / F.lit(tolerance_ms)).cast("long")

    l_exploded = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_bucketed = right.withColumn("__bucket", rb)

    joined = l_exploded.join(r_bucketed, on=on + ["__bucket"], how="inner")
    return joined.filter(
        F.abs(F.col(left_ts_ms) - F.col(right_ts_ms)) <= tolerance_ms
    ).drop("__bucket")
