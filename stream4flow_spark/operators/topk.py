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
