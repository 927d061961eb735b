"""Streaming rolling N-day distinct counts — twin of
``operators/window_agg.rolling_distinct`` (gate:
rel_rolling_active_users).

Two chained stateful stages, both built-in (Spark 3.4+ supports this
stateful-operator chain):

1. ``dropDuplicatesWithinWatermark`` on (day, key) — the streaming form
   of the batch op's ONE distinct: state holds each active (day, key)
   pair once within the horizon, so raw event volume collapses BEFORE
   any window fan-out, exactly like the batch plan.
2. ``approx_count_distinct(key)`` per native sliding window
   (``F.window(day, W days, 1 day)``): a key active on several days of
   the same window must still count once, and exact COUNT(DISTINCT) is
   not expressible in a streaming aggregate — the HLL± sketch is (its
   state is one sketch per open window, the same trade
   ``operators/sketches.rolling_distinct_sketch`` makes in batch).
   Append mode emits a day's count exactly once, when the watermark
   passes its window.

The output day for window [s, s+W) is s+W-1 — "the day whose trailing
W-day window this is".

Contract: the watermark horizon must cover the window span plus the
expected disorder — a (day, key) pair arriving later than that is
dropped and its windows undercount (the batch op is the backstop, the
same trade every streaming twin in this tier documents). State: one row
per distinct (day, key) in the horizon plus one count per open window —
both bounded by the horizon, independent of raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_active_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    watermark: str = "8 days",
    rsd: float = 0.023,
) -> DataFrame:
    """Append-mode stream of (day, n_active_est): APPROXIMATE distinct
    ``key_col`` values seen in the trailing ``window_days`` days, per
    day (relative error ``rsd``, default 2.3%; the batch twin is
    exact)."""
    pairs = (
        events.select(
            F.date_trunc("DAY", F.col(ts_col)).alias("day_ts"),
            F.col(key_col).alias("k"),
        )
        .withWatermark("day_ts", watermark)
        .dropDuplicatesWithinWatermark(["day_ts", "k"])
    )
    win = F.window("day_ts", f"{window_days} days", "1 day")
    agged = pairs.groupBy(win.alias("w")).agg(
        F.approx_count_distinct("k", rsd).alias("n_active_est"),
        F.max("day_ts").alias("__latest"),
    )
    # the batch twin emits one row per OBSERVED day; without this
    # filter the last active day's pairs would also emit its W-1
    # trailing windows (phantom days with no events). A window's
    # labeled day is observed exactly when the window's latest pair
    # falls on it.
    labeled = F.date_sub(F.col("w.end").cast("date"), 1)
    return (
        agged.filter(F.col("__latest").cast("date") == labeled)
        .select(
            F.date_format(labeled, "yyyy-MM-dd").alias("day"),
            "n_active_est",
        )
    )
