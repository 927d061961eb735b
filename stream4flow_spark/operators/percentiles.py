"""Exact grouped percentiles with bounded aggregate state.

``percentile(col, p)`` (and its DuckDB twin ``quantile_cont``) buffers
every value of the group in one aggregate state — O(group rows). On a
corpus where one language holds billions of documents that single state
is a scale-killer. For an integer-valued column the same *exact*
interpolated percentile is computable with bounded state:

1. ``groupBy(keys, value).count()`` — state bounded by distinct values
   per group (document lengths: at most ~max-doc-chars distinct), with
   map-side partial aggregation;
2. a cumulative-sum window over the distinct values of each group —
   partition size = distinct values, not rows;
3. interpolation at rank h = (n-1)·p between the value covering index
   floor(h) and the next distinct value when floor(h) is the last index
   covered by its run.

Matches SQL-standard continuous quantile semantics exactly (same result,
same oracle hash), so it is a drop-in for ``percentile``/``quantile_cont``
on integral columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per group.

    ``percentiles`` maps output column name -> p in [0, 1]. The values of
    ``value_col`` must be exactly representable (integers); interpolation
    between adjacent distinct values is done in double precision like
    ``percentile`` itself.

    ``extra_aggs`` are additional aggregates computable from the
    (value, count) pairs; each Column may reference ``value_col``, ``cnt``
    (per-value count) and is applied in the final per-group aggregation.
    """
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("cnt"))

    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    w_ord = Window.partitionBy(*group_cols).orderBy(value_col)

    ranked = counts.select(
        *group_cols,
        value_col,
        F.col(value_col).cast("double").alias("_v"),
        F.col("cnt"),
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
        F.lead(value_col).over(w_ord).cast("double").alias("_next_v"),
    ).withColumn("_prev_cum", F.col("_cum") - F.col("cnt"))

    # For each percentile p: h = (n-1)p sits inside exactly one value-run
    # [_prev_cum, _cum); interpolate toward the next distinct value only
    # when floor(h) is the run's last index.
    p_aggs = []
    for out_name, p in percentiles.items():
        h = (F.col("_n") - F.lit(1)) * F.lit(float(p))
        k = F.floor(h)
        frac = h - k
        # When k is the last global index (n=1 groups, p=1.0) there is no
        # next value and frac is provably 0 — coalesce keeps the product
        # from nulling out (0 * NULL is NULL in SQL).
        upper = F.when(k + 1 < F.col("_cum"), F.col("_v")).otherwise(
            F.coalesce(F.col("_next_v"), F.col("_v"))
        )
        in_run = (F.col("_prev_cum") <= k) & (k < F.col("_cum"))
        exact_at = F.col("_v") + frac * (upper - F.col("_v"))
        p_aggs.append(
            F.max(F.when(in_run, exact_at)).alias(out_name)
        )

    extra = []
    if extra_aggs:
        extra = [c.alias(n) for n, c in extra_aggs.items()]
    return ranked.groupBy(*group_cols).agg(*p_aggs, *extra)


def grouped_approx_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group percentiles via Spark's built-in
    Greenwald-Khanna sketch (``percentile_approx``) — the scale knob
    when even O(distinct values) state is too much (continuous
    measurements, billions of distincts per group). The sketch
    guarantees RANK error ≤ N/accuracy per group; it merges map-side
    like any partial aggregate, so state is O(accuracy · log N)
    regardless of group size. Same output shape as
    ``grouped_exact_percentiles`` (the exact/approx pair mirrors
    host_stats' countDistinct/HLL switch); the rank-error guarantee is
    pinned against the exact tier in tests."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(name)
        for name, p in percentiles.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)
