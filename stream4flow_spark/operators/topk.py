"""Top-K operators (SURVEY.md §2.3 A9/A10).

A9 — the reference collected per-host stat lists to the driver and sorted
in Python (top_n_host_stats.py:55-61,124); here it is a rank-over-window
that stays distributed. Ties are broken deterministically by the key column
so results are stable across partitionings (and hash-comparable against
the oracle).

A10 — global top-K is `orderBy().limit()`, which Catalyst executes as
TakeOrderedAndProject: each partition keeps only K rows, then the driver
merges K·partitions rows — no full sort, no full shuffle. At 100 TB this
is the only sane global-top-k plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the K highest-`order_col` rows per key, deterministic ties."""
    order: list[Column] = [F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_global(
    df: DataFrame, order_col: str, k: int, tiebreak_cols: list[str] | None = None
) -> DataFrame:
    order: list[Column] = [F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    return df.orderBy(*order).limit(k)


def global_order_rank(
    df: DataFrame, order: list[Column], rank_col: str = "order_rank"
) -> DataFrame:
    """Global 1-based rank by a total order, WITHOUT a single-partition
    window (``row_number().over(Window.orderBy(...))`` moves every row to
    one task — fine at 60k rows, fatal at 100 TB).

    Distributed shape: range-partition by the sort keys (so partition i's
    rows all precede partition i+1's), sort within partitions, assign a
    per-partition local index with an Arrow-batched ``mapInPandas`` (no
    data movement), then add the exclusive prefix sum of partition row
    counts — a driver-side cumsum over #partitions rows, broadcast back.
    Two passes over the ranged data (count + emit); both reuse the same
    range exchange. Order must be total (include tiebreaks) for the rank
    to be well-defined.
    """
    import pandas as pd
    from pyspark import TaskContext

    ranged = df.repartitionByRange(*order).sortWithinPartitions(*order)

    counts = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .toPandas()
        .sort_values("_pid")
    )
    offsets = dict(
        zip(counts["_pid"], counts["count"].cumsum() - counts["count"])
    )

    out_schema = df.schema.add(rank_col, "long", False)

    def add_rank(batches) -> "pd.DataFrame":
        pid = TaskContext.get().partitionId()
        base = int(offsets.get(pid, 0)) + 1
        for pdf in batches:
            pdf[rank_col] = range(base, base + len(pdf))
            base += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_rank, out_schema)
