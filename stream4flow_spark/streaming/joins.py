"""Stream-stream interval join (SURVEY.md §2.4 J4, streaming form).

Batch mode uses ``operators.interval_join`` (bucketized equi-join). In
streaming, Spark's native stream-stream inner join with watermarks on both
sides and an event-time range condition IS the interval join: the
watermark bounds how long each side's rows are buffered in the state
store, and the range condition lets the engine evict rows whose match
window has passed (dns_external_resolvers is the reference use,
dns_external_resolvers.py:149-166 — its DStream version could only match
within one micro-batch; this matches across the full tolerance window,
fault-tolerantly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts_ms: str,
    right_ts_ms: str,
    tolerance_ms: int,
    watermark_delay: str = "10 minutes",
    event_time_col: str | None = None,
) -> DataFrame:
    """Streaming inner equi-join on ``on`` keeping |left_ts − right_ts| ≤
    tolerance. Non-key column names must be disjoint between the sides
    (project before calling). Output = key cols + both sides' payloads.

    ``event_time_col``: keep the left side's watermarked event-time
    column under this name. A downstream stateful operator (windowed agg)
    must window on THIS column — calling ``withWatermark`` again after
    the join is a watermark redefinition, which Spark rejects across
    stacked stateful operators.
    """
    lw = left.withColumn("__lts", F.timestamp_millis(F.col(left_ts_ms))).withWatermark(
        "__lts", watermark_delay
    )
    rw = right.withColumn("__rts", F.timestamp_millis(F.col(right_ts_ms))).withWatermark(
        "__rts", watermark_delay
    )
    cond = None
    for k in on:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    tol = F.expr(f"INTERVAL {tolerance_ms} MILLISECONDS")
    cond = (
        cond
        & (rw["__rts"] >= lw["__lts"] - tol)
        & (rw["__rts"] <= lw["__lts"] + tol)
    )
    joined = lw.join(rw, cond, "inner")
    # key columns appear twice; keep the left copy
    for k in on:
        joined = joined.drop(rw[k])
    joined = joined.drop("__rts")
    if event_time_col is not None:
        return joined.withColumnRenamed("__lts", event_time_col)
    return joined.drop("__lts")
