"""Streaming alert suppression — ``applyInPandasWithState`` (ST1-ST3).

Streaming twin of ``operators.suppression.suppress_reports``. The reference
held suppression state in a driver-side Python dict (ports_scan.py:109-141,
ssh_auth_simple.py:106-136, dns_external_resolvers.py:92-121) with a
once-a-day manual GC (ports_scan.py:63-77). Here the state is per-key in
the state store — fault-tolerant, partitioned across executors, and evicted
by a processing-time timeout instead of a hand-rolled GC loop.

State per attack key: (next_report_at_ms, pending sums). Within each
micro-batch the key's alerts are sorted by event time; across batches the
greedy chain continues from stored state — identical semantics to the batch
twin when data arrives in order, and identical to the reference (which was
processing-order-dependent too) otherwise.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def suppress_reports_stream(
    alerts: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    window_ms: int,
    sum_cols: list[str] | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Collapse a streaming alert stream to its report chain.

    Output = input columns + ``report_seq``. ``state_ttl_ms`` mirrors the
    reference's daily GC (ST2): keys idle longer than the TTL are dropped
    (eviction is exercised by tests/test_streaming.py::
    test_stream_suppression_ttl_evicts_idle_state under a processing-time
    trigger). NOTE: the TTL uses ``ProcessingTimeTimeout``, which needs a
    continuous trigger — with ``trigger(availableNow=True)`` the query
    would wait for timeouts and never terminate, so pass
    ``state_ttl_ms=None`` in drain-and-stop harnesses and a TTL in
    long-running streams.
    """
    sums = sum_cols or []
    cols = [f.name for f in alerts.schema.fields]
    out_schema = T.StructType(
        list(alerts.schema.fields)
        + [T.StructField("report_seq", T.IntegerType(), False)]
    )
    # state: next_report_at (ms), report_seq counter, one pending sum per col
    state_schema = T.StructType(
        [
            T.StructField("next_report_at", T.LongType()),
            T.StructField("seq", T.IntegerType()),
        ]
        + [T.StructField(f"pend_{c}", T.DoubleType()) for c in sums]
    )

    def chain(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            next_at, seq, *pend_vals = state.get
            pending = dict(zip(sums, pend_vals))
        else:
            next_at, seq = None, 0
            pending = {c: 0.0 for c in sums}

        import numpy as np

        out_frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_ms_col, kind="mergesort").reset_index(drop=True)
            t = pdf[ts_ms_col].to_numpy()
            n = len(t)
            # rows before the carried next_at accumulate into pending
            start = 0 if next_at is None else int(np.searchsorted(t, next_at))
            idxs: list[int] = []
            i = start
            while i < n:
                idxs.append(i)
                i = int(np.searchsorted(t, t[i] + window_ms, side="left"))
            prefix = {
                c: np.concatenate(([0.0], np.cumsum(pdf[c].to_numpy())))
                for c in sums
            }
            if idxs:
                out = pdf.iloc[idxs].copy()
                bounds = np.array(idxs, dtype=np.int64) + 1
                starts = np.concatenate(([0], bounds[:-1]))
                for c in sums:
                    seg = prefix[c][bounds] - prefix[c][starts]
                    seg[0] += pending[c]  # carry-over into the first report
                    pending[c] = 0.0
                    out[c] = seg
                out["report_seq"] = np.arange(seq, seq + len(idxs), dtype=np.int32)
                seq += len(idxs)
                next_at = int(t[idxs[-1]]) + window_ms
                tail_from = bounds[-1]
                out_frames.append(out[cols + ["report_seq"]])
            else:
                tail_from = 0
            for c in sums:  # unreported tail accumulates for next batch
                pending[c] += float(prefix[c][n] - prefix[c][tail_from])

        state.update((next_at, seq, *[pending[c] for c in sums]))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return alerts.groupBy(*key_cols).applyInPandasWithState(
        chain,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
