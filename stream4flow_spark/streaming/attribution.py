"""Streaming first/last-touch attribution — credit conversions the
moment they arrive (twin of gate_relational.rel_attribution).

The batch form forward-fills each user's touch history with one window;
a stream keeps, per user, TWO touch slots of state: the EARLIEST touch
(type, event time, event id) ever seen and the LATEST one so far.
``applyInPandasWithState``, O(1) state per user — the asof-enrichment
pattern (streaming/asof.py) with a two-slot payload. Both slots carry
their (t, eid) key so a late-arriving OLDER touch in a later
micro-batch can never overwrite a newer stored last touch (and a
late-arriving EARLIER touch correctly takes over the first slot) —
cross-batch disorder degrades only the conversions already emitted,
never the state.

Per micro-batch, rows process in event-time order (ties by the id
column), so a batch containing a user's whole history reproduces the
batch operator exactly (parity-tested). Across batches the usual
streaming trade applies: a touch arriving AFTER the conversion it
should have preceded (out-of-order beyond the batch boundary) is not
retroactively credited — the batch operator is the backstop.

Output: one row per conversion event — user, ts, value, first_touch,
last_touch ('none' when the user converted untouched).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def attribution_stream(
    events: DataFrame,
    touch_types: list[str],
    convert_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Emit (user, ts, value, first_touch, last_touch) per conversion."""
    src = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("etype"),
        F.col(value_col).cast("double").alias("value"),
    )
    out_schema = T.StructType(
        [
            T.StructField("user", src.schema["user"].dataType),
            T.StructField("t", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("first_touch", T.StringType()),
            T.StructField("last_touch", T.StringType()),
        ]
    )
    state_schema = (
        "first string, first_t long, first_eid long,"
        " last string, last_t long, last_eid long"
    )
    touches = set(touch_types)

    def credit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - TTL not used here
            state.remove()
            return
        first, first_t, first_eid, last, last_t, last_eid = (
            state.get if state.exists else (None,) * 6
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["t", "eid"], ignore_index=True)
        # running last-touch: touch rows carry their (type, t, eid),
        # others carry the previous touch's (ffill); the stored state
        # touch wins per-row only where its (t, eid) is NEWER than the
        # in-batch running touch — a late batch of older touches can
        # never displace a newer stored last touch
        is_touch = pdf["etype"].isin(touches)
        touch_vals = pdf["etype"].where(is_touch)
        running_last = touch_vals.ffill()
        run_t = pdf["t"].where(is_touch).ffill()
        run_eid = pdf["eid"].where(is_touch).ffill()
        if last is not None:
            stored_newer = run_t.isna() | (
                (run_t < last_t)
                | ((run_t == last_t) & (run_eid < last_eid))
            )
            running_last = running_last.where(~stored_newer, last)
        # running first-touch: only the FIRST in-batch touch survives,
        # then forward-fills; the stored first wins per-row only where
        # its (t, eid) is OLDER than the in-batch first touch
        first_only = touch_vals.copy()
        first_only[touch_vals.notna().cumsum() > 1] = None
        running_first = first_only.ffill()
        if first is not None:
            rf_t = pdf["t"].where(first_only.notna()).ffill()
            rf_eid = pdf["eid"].where(first_only.notna()).ffill()
            stored_older = rf_t.isna() | (
                (first_t < rf_t)
                | ((first_t == rf_t) & (first_eid < rf_eid))
            )
            running_first = running_first.where(~stored_older, first)
        conv = pdf["etype"] == convert_type
        if conv.any():
            out = pd.DataFrame(
                {
                    "user": pdf.loc[conv, "user"],
                    "t": pdf.loc[conv, "t"],
                    "value": pdf.loc[conv, "value"],
                    "first_touch": running_first[conv].fillna("none"),
                    "last_touch": running_last[conv].fillna("none"),
                }
            )
            yield out
        # fold the batch's earliest/latest touches into the state by
        # (t, eid) order
        batch_touches = pdf.loc[is_touch, ["etype", "t", "eid"]]
        if len(batch_touches):
            b_first = batch_touches.iloc[0]
            b_last = batch_touches.iloc[-1]
            if first is None or (int(b_first["t"]), int(b_first["eid"])) < (
                first_t, first_eid
            ):
                first, first_t, first_eid = (
                    b_first["etype"], int(b_first["t"]), int(b_first["eid"])
                )
            if last is None or (int(b_last["t"]), int(b_last["eid"])) > (
                last_t, last_eid
            ):
                last, last_t, last_eid = (
                    b_last["etype"], int(b_last["t"]), int(b_last["eid"])
                )
        state.update((first, first_t, first_eid, last, last_t, last_eid))

    return src.groupBy("user").applyInPandasWithState(
        credit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
