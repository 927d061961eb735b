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


def weighted_reservoir_stream(
    events: DataFrame,
    group_col: str,
    k: int,
    weight_col: str,
    key_col: str,
    salt: str = "s4f-wrs",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Streaming twin of ``llmdata.sampling.weighted_sample_per_group``
    (r07 verdict item 8): maintain, per group, the CURRENT
    Efraimidis–Spirakis weighted k-sample over everything seen so far.

    A-ES makes this trivially streamable — selection is "top-k rows by
    round(ln(u)/w, 9) desc, id asc", and the reservoir key is a pure
    deterministic function of (id, weight), computed Column-side with
    the exact md5 coin the batch operator uses. Top-k is
    prefix-mergeable, so state per group is just the current k (key,
    id) pairs (two fixed-length arrays — ~16 bytes × k, independent of
    stream length), and after any prefix of the stream the reservoir
    EQUALS the batch selection over that prefix (parity-tested).

    Because a later heavy row can evict an earlier pick, this emits in
    UPDATE mode: each trigger re-emits the full current reservoir of
    every group that received rows (k rows with fresh ranks) —
    downstream keeps the latest (group, rank) snapshot. Merging on id
    also makes foreachBatch redelivery idempotent (a re-sent id carries
    the identical key, so the reservoir is unchanged).

    Output: (group_col, key_col, rank_col, wkey) — the current
    selection; ``wkey`` is the rounded reservoir key for audit.
    """
    from stream4flow_spark.llmdata.sampling import _BUCKETS, hash_bucket

    key_t = events.schema[group_col].dataType
    id_t = events.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, key_t, True),
            T.StructField(key_col, id_t, True),
            T.StructField(rank_col, T.IntegerType(), True),
            T.StructField("wkey", T.DoubleType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ks", T.ArrayType(T.DoubleType()), True),
            T.StructField("ids", T.ArrayType(id_t), True),
        ]
    )

    u = (hash_bucket(F.col(key_col), salt).cast("double") + 0.5) / _BUCKETS
    src = events.select(
        group_col,
        F.col(key_col).alias("__id"),
        F.round(F.log(u) / F.col(weight_col), 9).alias("__k"),
    )

    def reservoir(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ks, ids = list(state.get[0]), list(state.get[1])
        else:
            ks, ids = [], []
        cur = pd.DataFrame({"__k": pd.array(ks, dtype="float64"), "__id": ids})
        changed = False
        for pdf in pdfs:
            changed = True
            # an EMPTY cur must not join the concat: pandas would coerce
            # the typed batch ids to float64 (then int64 state arrays
            # round-trip as nulls)
            cur = pd.concat(
                ([cur] if len(cur) else []) + [pdf[["__k", "__id"]]],
                ignore_index=True,
            )
            cur = cur.drop_duplicates("__id")
            # desc_nulls_last with id tiebreak: stable-sort by id first,
            # then by key desc (NaN last) — stability keeps id order
            # inside every tie block, -inf (zero weight) stays ahead of
            # NaN (null weight), matching the batch window exactly
            cur = cur.sort_values("__id", kind="mergesort").sort_values(
                "__k", ascending=False, kind="mergesort", na_position="last"
            )[:k]
        if changed:
            state.update(
                (
                    [None if pd.isna(x) else float(x) for x in cur["__k"]],
                    # unwrap numpy scalars (object-dtype .tolist() keeps
                    # them, and they serialize to null in the state row)
                    [
                        x.item() if hasattr(x, "item") else x
                        for x in cur["__id"]
                    ],
                )
            )
            out = cur.reset_index(drop=True)
            yield pd.DataFrame(
                {
                    group_col: key[0],
                    key_col: out["__id"],
                    rank_col: (out.index + 1).astype("int32"),
                    "wkey": out["__k"],
                }
            )

    return src.groupBy(group_col).applyInPandasWithState(
        reservoir, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )
