"""Streaming as-of enrichment — attach the latest-known right-side state
to each left-side event as it arrives.

Streaming twin of ``operators.asof_join.asof_join`` and the streaming
cousin of the reference's J4 time-proximity join
(dns_external_resolvers.py:149-166). The batch form sorts the union of
both sides per key; a stream cannot sort the future, so this keeps, per
key, ONE piece of state: the latest right row seen so far (timestamp +
payload) — ``applyInPandasWithState`` with O(1) state per key, evicted
by an optional processing-time TTL.

Semantics and the documented trade:

- Within a micro-batch, rows are processed in event-time order, so a
  batch that contains both sides behaves exactly like the batch as-of
  join (the parity test feeds one batch and asserts equality).
- Across batches, only the LATEST right row per key is remembered. A
  left event whose timestamp precedes an already-stored newer right row
  matches nothing unless its own batch carries an older right row —
  the price of constant state. Full-history as-of (late lefts matching
  arbitrarily old rights) is the batch operator's job; the streaming
  form answers "enrich with current state now", which is what a live
  pipeline wants. Same class of trade as
  ``dropDuplicatesWithinWatermark``'s horizon (streaming/llmingest.py).
- Right rows arriving out of order are ignored if an even newer right
  is already stored (latest-wins by event time, ties by arrival).

State: (right_ts, right payload fields) — fixed-width, one row per key,
independent of history length; the batch union-sort form's shuffle-once
guarantee becomes a state-once guarantee here.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def asof_enrich_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Enrich streaming ``left`` rows with the latest ``right`` row whose
    ``right_ts <= left_ts`` per ``on`` key (both inputs streaming
    DataFrames; timestamps are comparable longs, e.g. unix ms).

    Output: left columns + right non-key columns (NULL-filled when
    ``how='left'`` and no match exists yet). ``state_ttl_ms`` drops keys
    idle longer than the TTL (processing-time timeout — needs a
    continuous trigger, pass None in drain-and-stop harnesses)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    right_payload = [c for c in right.columns if c not in on]
    if right_ts not in right_payload:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")
    left_cols = list(left.columns)
    payload_fields = [right.schema[c] for c in right_payload]

    l_side = left.select(
        *on,
        F.col(left_ts).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols if c not in on],
        *[
            F.lit(None).cast(f.dataType).alias(f"__r_{f.name}")
            for f in payload_fields
        ],
    )
    r_side = right.select(
        *on,
        F.col(right_ts).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = l_side.unionByName(r_side)

    key_fields = [left.schema[c] for c in on]
    out_schema = T.StructType(
        key_fields
        + [left.schema[c] for c in left_cols if c not in on]
        + [T.StructField(c, right.schema[c].dataType, True) for c in right_payload]
    )
    state_schema = T.StructType(
        [T.StructField("rts", T.LongType())]
        + [T.StructField(f"p_{f.name}", f.dataType, True) for f in payload_fields]
    )
    left_value_cols = [c for c in left_cols if c not in on]

    def enrich(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            stored = state.get
            latest_ts: int | None = stored[0]
            latest_payload = list(stored[1:])
        else:
            latest_ts, latest_payload = None, [None] * len(right_payload)

        import numpy as np

        out_frames = []
        for pdf in pdfs:
            rights = pdf[pdf["__side"] == 0].sort_values(
                "__t", kind="mergesort"
            )
            lefts = pdf[pdf["__side"] == 1]
            rts = rights["__t"].to_numpy(dtype="int64")
            lts = lefts["__t"].to_numpy(dtype="int64")
            n = len(lts)
            if n:
                # per left row: latest batch right with rt <= lt
                # ('right' side keeps the last among equal timestamps —
                # latest-wins ties by arrival order, matching the state
                # update rule below)
                none_ts = np.iinfo(np.int64).min
                idx = np.searchsorted(rts, lts, side="right") - 1
                if len(rts):
                    cand_ts = np.where(
                        idx >= 0, rts[np.clip(idx, 0, None)], none_ts
                    )
                else:
                    cand_ts = np.full(n, none_ts, dtype="int64")
                # prior-batch state competes where it's newer than the
                # batch candidate and not in the left row's future
                sts = none_ts if latest_ts is None else latest_ts
                use_state = (sts > cand_ts) & (sts <= lts)
                match_ts = np.where(use_state, sts, cand_ts)
                ok = match_ts > none_ts

                out = lefts[[*on, *left_value_cols]].reset_index(drop=True)
                for j, c in enumerate(right_payload):
                    col_batch = rights[f"__r_{c}"].to_numpy()
                    safe_idx = np.clip(idx, 0, None)
                    batch_vals = (
                        col_batch[safe_idx]
                        if len(col_batch)
                        else np.full(n, None, dtype=object)
                    )
                    vals = pd.Series(
                        np.where(use_state, latest_payload[j], batch_vals)
                    )
                    out[c] = vals.where(pd.Series(ok), other=None)
                if how == "inner":
                    out = out[pd.Series(ok).to_numpy()]
                if len(out):
                    out_frames.append(out)
            # state: latest right across prior state and this batch
            if len(rts) and (latest_ts is None or rts[-1] >= latest_ts):
                latest_ts = int(rts[-1])
                latest_payload = [
                    rights[f"__r_{c}"].iloc[-1] for c in right_payload
                ]

        state.update((latest_ts, *latest_payload))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return unioned.groupBy(*on).applyInPandasWithState(
        enrich,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
