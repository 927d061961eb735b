"""Streaming token-budget admission — stop ingesting a source once its
token budget is spent.

Streaming twin of ``llmdata.sampling.token_budget_per_group``: the batch
form ranks each group and keeps the best prefix under a cumulative
weight budget; a live ingest can't rank the future, so the order is
ARRIVAL order (within a micro-batch: a deterministic sort, so replays
agree) and the state per group is ONE number — the cumulative weight of
every row seen so far. A row is admitted iff the running total
including it stays ≤ budget; the first burst closes the group's prefix
exactly like the batch filter does (cum is monotone, so nothing after
the burst can pass).

Semantics notes:

- Same-prefix parity: over identical input in identical order the
  admitted set equals ``token_budget_per_group(order_by=arrival)`` —
  parity-tested single-batch and across a batch split.
- The total counts ALL seen rows, not just admitted ones — that is what
  makes it the batch operator's prefix filter rather than best-fit
  packing (a later small doc does NOT sneak in after a burst; if you
  want bin-packing, that's `llmdata/packing.py`).
- State: one long per group — the cheapest possible admission ledger;
  an idle-group TTL is deliberately NOT offered because forgetting the
  ledger would re-open a spent budget.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def admit_by_budget_stream(
    events: DataFrame,
    group_col: str,
    budget: int,
    weight_col: str,
    order_col: str,
) -> DataFrame:
    """Admit rows per ``group_col`` until the running ``weight_col``
    total would exceed ``budget``; ``order_col`` fixes the within-batch
    arrival order (replay-deterministic). Output: group, order, weight +
    ``cum_weight`` (the post-include running total) for ADMITTED rows
    only."""
    key_t = events.schema[group_col].dataType
    ord_t = events.schema[order_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, key_t, True),
            T.StructField(order_col, ord_t, True),
            T.StructField(weight_col, T.LongType(), True),
            T.StructField("cum_weight", T.LongType(), True),
        ]
    )
    state_schema = T.StructType([T.StructField("cum", T.LongType())])

    src = events.select(
        group_col,
        F.col(order_col).alias("__o"),
        F.col(weight_col).cast("long").alias("__w"),
    )

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values("__o", kind="mergesort")
            w = pdf["__w"].to_numpy()
            run = cum + w.cumsum()
            keep = run <= budget
            cum = int(cum + w.sum())  # ledger counts ALL seen rows
            if keep.any():
                out = pdf.loc[keep, ["__o", "__w"]].reset_index(drop=True)
                out.insert(0, group_col, key[0])
                out["cum_weight"] = run[keep]
                out.columns = [group_col, order_col, weight_col, "cum_weight"]
                yield out
        state.update((cum,))

    return src.groupBy(group_col).applyInPandasWithState(
        admit, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
