"""Streaming first/last-touch attribution — credit conversions the
moment they arrive (twin of gate_relational.rel_attribution).

The batch form forward-fills each user's touch history with one window;
a stream keeps, per user, TWO strings of state: the FIRST touch type
ever seen and the LATEST touch type so far (plus its timestamp).
``applyInPandasWithState``, O(1) state per user — the asof-enrichment
pattern (streaming/asof.py) with a two-slot payload.

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
    state_schema = "first string, last string"
    touches = set(touch_types)

    def credit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - TTL not used here
            state.remove()
            return
        first, last = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["t", "eid"], ignore_index=True)
        # running last-touch: touch rows carry their type, others carry
        # the previous value (ffill seeded with carried-in state)
        touch_vals = pdf["etype"].where(pdf["etype"].isin(touches))
        running_last = touch_vals.ffill()
        if last is not None:
            running_last = running_last.fillna(last)
        # running first-touch: only the FIRST in-batch touch survives,
        # then forward-fills; carried-in state wins if already set
        first_only = touch_vals.copy()
        first_only[touch_vals.notna().cumsum() > 1] = None
        running_first = first_only.ffill()
        if first is not None:
            running_first = pd.Series([first] * len(pdf))
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
        new_first = (
            first
            if first is not None
            else (
                touch_vals.dropna().iloc[0]
                if touch_vals.notna().any()
                else None
            )
        )
        new_last = (
            running_last.iloc[-1]
            if pd.notna(running_last.iloc[-1])
            else None
        )
        state.update((new_first, new_last))

    return src.groupBy("user").applyInPandasWithState(
        credit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
