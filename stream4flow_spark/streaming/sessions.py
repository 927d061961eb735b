"""Streaming sessionization — native ``session_window`` twin of the
batch lag-based sessionizer (gate_relational.rel_event_sessionization).

The batch form derives session ids with a lag() window (new session when
the gap to the previous event exceeds ``gap``). Streaming cannot lag
into the future, so the Spark-first answer is the built-in
``F.session_window(ts, gap)``: the state store merges overlapping
per-event windows [ts, ts+gap) per key, and a session is emitted —
exactly once, in append mode — when the event-time watermark passes its
close. No custom state code at all; this is the one case in the
streaming tier where the engine's own stateful operator IS the
operator.

Semantics vs the batch twin: identical sessions whenever no two
consecutive events are separated by EXACTLY ``gap`` (the batch rule
starts a new session on gap > g, session_window on gap >= g; the parity
test asserts the data-level equivalence). State per key is O(open
sessions), bounded by the watermark horizon — late events beyond the
horizon are dropped rather than re-opening closed sessions (the
documented streaming trade; the batch sessionizer is the backstop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Aggregate a streaming event DataFrame into closed sessions.

    ``ts_col`` must be a TIMESTAMP column. Output per closed session:
    key columns, ``session_start_ms``, ``session_end_ms`` (last event
    time), ``n_events``, ``duration_ms``.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_events"),
            F.unix_millis(F.min(ts_col)).alias("session_start_ms"),
            F.unix_millis(F.max(ts_col)).alias("session_end_ms"),
        )
        .select(
            *key_cols,
            "session_start_ms",
            "session_end_ms",
            "n_events",
            (F.col("session_end_ms") - F.col("session_start_ms")).alias(
                "duration_ms"
            ),
        )
    )
