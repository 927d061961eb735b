"""Time-series gap fill + forward fill.

Regular-grid analytics (rates, SLO windows, ML feature frames) need a
row for EVERY (key, bucket) — including the buckets where nothing
happened — with zeros for additive measures and last-observation-carried-
forward for state-like ones. The streaming windowed aggs never emit
empty buckets, so this is the batch repair step.

Plan shape: one aggregate keyed (key, bucket); per-key min/max bounds
ride the same aggregate's second pass (tiny); the dense grid is a
map-side `sequence()` explode of bounds — grid size is (time range /
step) per key, never O(events) — and the forward fill is a running
`last(ignorenulls)` window over the grid, partitioned by key (grid-sized
partitions, bounded by the time range, not the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Hourly grid per key from each key's first to last active hour:
    n_events / value_sum are zero-filled; last_seen_value carries the
    most recent observed bucket sum forward (NULL before the first)."""
    agg = df.groupBy(
        key_col, F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("value_sum"),
    )
    bounds = agg.groupBy(key_col).agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.expr("sequence(mn, mx, interval 1 hour)")
        ).alias("bucket"),
    )
    joined = grid.join(agg, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        F.last("value_sum", ignorenulls=True).over(w).alias(
            "last_seen_value"
        ),
    )
