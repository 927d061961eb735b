"""Alert suppression — report-once-with-increments (SURVEY.md §2.6 ST1-ST3).

The reference kept a driver-side Python dict keyed by attack id: an alert
is (re)emitted only when its timestamp is ≥ last_report + window, and each
re-report carries the totals accumulated since the previous report
(ports_scan.py:109-141, ssh_auth_simple.py:106-136,
dns_external_resolvers.py:92-121). That state was non-fault-tolerant and
single-process.

Here the same semantics is a per-key ordered scan:

- **Batch twin** (this module): hash-repartition by attack key, then ONE
  ``mapInPandas`` call per partition that chains every key in the
  partition vectorized (sort once, per-key ``searchsorted`` for report
  positions, prefix-sum segments for the accumulated totals). The naive
  alternative — ``applyInPandas`` with one call per key — pays per-group
  Python/Arrow overhead, which at millions of (src, dst) attack keys is
  the dominant cost (~10× slower measured at sf0.1). Partition contents
  are concatenated in memory; alert streams are small relative to flows,
  and partition count scales them down further.
- **Streaming twin** (streaming.state): ``applyInPandasWithState`` holding
  (last_report_ts, accumulated totals) per key with a timeout
  ≙ the reference's daily GC (ST2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def suppress_reports(
    alerts: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    window_ms: int,
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an alert stream to its report chain.

    Output = input columns + ``report_seq`` (0-based report index per key).
    Each emitted row is one report; ``sum_cols`` are summed over the
    suppressed alerts it covers (reference's flows_increment semantics);
    other columns take the values of the alert that triggered the report.
    """
    sums = sum_cols or []
    out_schema = T.StructType(
        list(alerts.schema.fields)
        + [T.StructField("report_seq", T.IntegerType(), False)]
    )
    cols = [f.name for f in alerts.schema.fields]

    def run(batches) -> "pd.DataFrame":
        import numpy as np

        parts = [b for b in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            key_cols + [ts_ms_col], kind="mergesort", ignore_index=True
        )
        n = len(pdf)
        t = pdf[ts_ms_col].to_numpy()
        # group boundaries: first row of each key run
        keyframe = pdf[key_cols]
        is_start = keyframe.ne(keyframe.shift()).any(axis=1).to_numpy()
        is_start[0] = True
        group_starts = np.flatnonzero(is_start)
        group_ends = np.append(group_starts[1:], n)

        idx_list: list[int] = []
        seq_list: list[int] = []
        seg_start_list: list[int] = []
        for s, e in zip(group_starts, group_ends):
            i = s
            seq = 0
            seg_start = s
            while i < e:
                idx_list.append(i)
                seq_list.append(seq)
                seg_start_list.append(seg_start)
                seq += 1
                i = s + int(np.searchsorted(t[s:e], t[i] + window_ms, side="left"))
                seg_start = idx_list[-1] + 1

        out = pdf.iloc[idx_list].copy()
        bounds = np.asarray(idx_list, dtype=np.int64) + 1
        starts = np.empty_like(bounds)
        # a report's segment = (previous report, this report]
        starts[:] = np.asarray(seg_start_list, dtype=np.int64)
        for c in sums:
            cs = np.concatenate(([0], np.cumsum(pdf[c].to_numpy())))
            out[c] = cs[bounds] - cs[starts]
        out["report_seq"] = np.asarray(seq_list, dtype=np.int32)
        yield out[cols + ["report_seq"]]

    return alerts.repartition(*key_cols).mapInPandas(run, schema=out_schema)
