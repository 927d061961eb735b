"""Alert suppression — report-once-with-increments (SURVEY.md §2.6 ST1-ST3).

The reference kept a driver-side Python dict keyed by attack id: an alert
is (re)emitted only when its timestamp is ≥ last_report + window, and each
re-report carries the totals accumulated since the previous report
(ports_scan.py:109-141, ssh_auth_simple.py:106-136,
dns_external_resolvers.py:92-121). That state was non-fault-tolerant and
single-process.

Here the same semantics is a per-key ordered scan:

- **Batch twin** (this module): ``applyInPandas`` per attack key — sorts
  the key's alerts by time and walks the greedy report chain. Per-key
  alert counts are small (alerts, not flows), so the per-group pandas scan
  is cheap and fully distributed across keys. The chain
  (t_report[0] = first alert; next report = first alert ≥ prev + window)
  is inherently sequential per key — not expressible as a fixed window
  function — which is exactly the applyInPandas escape hatch.
- **Streaming twin** (streaming.state): ``applyInPandasWithState`` holding
  (last_report_ts, accumulated totals) per key with an event-time timeout
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
    out_fields = list(alerts.schema.fields) + [
        T.StructField("report_seq", T.IntegerType(), False)
    ]
    out_schema = T.StructType(out_fields)
    cols = [f.name for f in alerts.schema.fields]

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_ms_col, kind="mergesort").reset_index(drop=True)
        out_rows = []
        next_report_at = None
        pending = {c: 0 for c in sums}
        seq = 0
        for _, row in pdf.iterrows():
            for c in sums:
                pending[c] += row[c]
            t = row[ts_ms_col]
            if next_report_at is None or t >= next_report_at:
                r = {c: row[c] for c in cols}
                for c in sums:
                    r[c] = pending[c]
                    pending[c] = 0
                r["report_seq"] = seq
                out_rows.append(r)
                seq += 1
                next_report_at = t + window_ms
        return pd.DataFrame(out_rows, columns=cols + ["report_seq"])

    return alerts.groupBy(*key_cols).applyInPandas(chain, schema=out_schema)
