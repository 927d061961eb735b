"""Streaming SCD Type-2 — emit a versioned state row the moment it is
superseded (change-data-capture on arrival).

Streaming twin of ``gate_relational.rel_scd2_user_state``: the batch
form compresses an event log into [valid_from, valid_to) versions with
two window passes; a live pipeline instead wants each version row AS
SOON as the next state change closes it. Per key the state store holds
exactly ONE open version (attribute value + valid_from) —
``applyInPandasWithState`` with O(1) state per key, the same bound the
as-of enrichment (streaming/asof.py) carries.

Semantics and the documented trades:

- Within a micro-batch, rows fold in (event-time, tiebreak) order, so a
  single batch reproduces the batch operator's CLOSED rows exactly
  (parity-tested); consecutive equal attribute values collapse.
- Only closed versions are emitted (append mode can never retract). The
  open current row per key lives in the state store; the batch operator
  is the way to materialize it (its ``is_current=1`` rows).
- Events must arrive per-key in nondecreasing event time ACROSS batches
  (within a batch any order is fine — the kernel sorts). A cross-batch
  regression would mean rewriting an already-emitted interval, which
  append-mode streaming cannot do; such late data is the batch
  operator's job. Late rows older than the open version's valid_from
  are DROPPED and counted in no output (same horizon philosophy as
  ``dropDuplicatesWithinWatermark``).

State: (attribute value, valid_from, tiebreak) — fixed width, one row
per key, independent of history length.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def scd2_stream(
    events: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Fold a keyed event stream into closed SCD2 version rows.

    Output (append, one row per SUPERSEDED version): key columns +
    ``attr_col``, ``valid_from_ms``, ``valid_to_ms``. Timestamps are
    comparable longs (unix ms). ``state_ttl_ms`` evicts idle keys
    (processing-time timeout — their open version is then lost, so size
    it to the key churn horizon, or leave None)."""
    key_fields = [events.schema[c] for c in key_cols]
    attr_t = events.schema[attr_col].dataType
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField(attr_col, attr_t, True),
            T.StructField("valid_from_ms", T.LongType(), True),
            T.StructField("valid_to_ms", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cur", attr_t, True),
            T.StructField("vfrom", T.LongType(), True),
        ]
    )

    src = events.select(
        *key_cols,
        F.col(attr_col).alias("__a"),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
    )

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur, vfrom = (state.get if state.exists else (None, None))
        out_rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["__t", "__tb"], kind="mergesort")
            if vfrom is not None:
                # pre-horizon late rows (documented drop)
                pdf = pdf[pdf["__t"] >= vfrom]
            if not len(pdf):
                continue
            a = pdf["__a"].reset_index(drop=True)
            t = pdf["__t"].reset_index(drop=True)
            if cur is not None:
                # the open version is change-point 0
                a = pd.concat(
                    [pd.Series([cur]), a], ignore_index=True
                )
                t = pd.concat(
                    [pd.Series([vfrom], dtype="int64"), t],
                    ignore_index=True,
                )
            # vectorized change-point compression: row i survives iff
            # its value differs from row i-1's (row 0 always does)
            keep = a.ne(a.shift()).to_numpy()
            keep[0] = True
            ca, ct = a[keep].to_numpy(), t[keep].to_numpy()
            # every change point but the last is now CLOSED by its successor
            out_rows.extend(
                (ca[i], int(ct[i]), int(ct[i + 1]))
                for i in range(len(ca) - 1)
            )
            cur, vfrom = ca[-1], int(ct[-1])
        state.update((cur, vfrom))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_rows:
            yield pd.DataFrame(
                [
                    (*key, a, f, to)
                    for (a, f, to) in out_rows
                ],
                columns=[*key_cols, attr_col, "valid_from_ms", "valid_to_ms"],
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy(*key_cols).applyInPandasWithState(
        fold, out_schema, state_schema, "append", timeout
    )
