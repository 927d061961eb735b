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
