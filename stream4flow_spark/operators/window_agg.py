"""Tumbling-window key helper (SURVEY.md §2.5 W1/W2).

``with_window_start_ms`` materializes the tumbling-window bucket as a plain
BIGINT epoch-ms column *before* the groupBy — same semantics as grouping on
``F.window`` (epoch-aligned buckets) but composable: apps can group on it
together with arbitrary keys, and ``window_duration=None`` degrades to a
single global bucket (0) for whole-archive batch runs, which keeps output
schemas stable between windowed and global modes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW_COL = "window_start_ms"

_UNIT_MS = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def duration_to_ms(duration: str) -> int:
    """'30 seconds' / '2 hours' / '1 day' -> milliseconds (the subset of
    Spark's interval grammar the apps use)."""
    n, unit = duration.strip().split()
    return int(n) * _UNIT_MS[unit.rstrip("s")]


def with_window_start_ms(
    df: DataFrame, ts_ms_col: str | Column, window_duration: str | None
) -> DataFrame:
    """Add `window_start_ms`: epoch-aligned tumbling bucket of the given
    epoch-ms column, or constant 0 when window_duration is None."""
    if window_duration is None:
        return df.withColumn(WINDOW_COL, F.lit(0).cast("long"))
    ts = F.timestamp_millis(
        F.col(ts_ms_col) if isinstance(ts_ms_col, str) else ts_ms_col
    )
    return df.withColumn(
        WINDOW_COL, F.unix_millis(F.window(ts, window_duration).start)
    )


def rolling_distinct(
    df: DataFrame,
    time_col: str,
    key_col: str,
    window_days: int = 7,
    day_col: str = "day",
    out_col: str = "n_active",
) -> DataFrame:
    """Rolling W-day distinct-key count per day (DAU→WAU/MAU): for every
    day present in the data, how many distinct ``key_col`` values
    appeared in the trailing ``window_days`` days.

    The naive form — a day×events range join, or COUNT(DISTINCT) OVER a
    RANGE window — rescans W days of raw rows per output day. The
    distributed shape here never does: (1) ONE distinct over (day, key)
    pairs collapses the raw table to at most |days|·|keys| narrow rows;
    (2) each pair fans out IN-TASK to the ≤W trailing window-days it
    serves (``sequence``+``explode``, zero join); (3) one distinct-count
    per window day. Shuffle is O(W · distinct pairs), independent of raw
    row count — at 100 TB the pairs table is the daily-active fact,
    orders of magnitude smaller than events. The fan-out joins a
    broadcast of the (tiny) existing-day set so the output has exactly
    one row per observed day.

    For W·pairs itself too big (very long windows × huge key sets), the
    sketch twin ``operators/sketches.rolling_distinct_sketch`` merges W
    pre-built daily HLL sketches per day instead (error ~1.6%).
    """
    pairs = (
        df.select(
            F.to_date(F.col(time_col)).alias(day_col),
            F.col(key_col).alias("__k"),
        )
        .distinct()
    )
    days = pairs.select(day_col).distinct()
    fan = pairs.select(
        F.explode(
            F.sequence(
                F.col(day_col),
                F.date_add(F.col(day_col), window_days - 1),
            )
        ).alias(day_col),
        "__k",
    )
    return (
        fan.join(F.broadcast(days), day_col)
        .groupBy(day_col)
        .agg(F.countDistinct("__k").alias(out_col))
    )
