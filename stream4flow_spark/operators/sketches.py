"""Mergeable distinct-count sketch tables (Apache DataSketches HLL).

The 100 TB problem: "distinct sources per host per DAY" is one scan,
but "distinct sources per host for an ARBITRARY date range" forces a
rescan of raw data per question — exact distinct counts don't add
across days (the same source appears on many days). HLL sketches DO
merge: materialize one sketch per (key, day) once, then answer any
range by unioning the covered sketches — an aggregate over the tiny
rollup table instead of the raw corpus. This is the published
pre-aggregation pattern behind Druid/BigQuery sketch columns, expressed
with Spark's built-in ``hll_sketch_agg``/``hll_union_agg`` (DataSketches
HLL_4 under the hood — estimates are deterministic functions of the
item SET, independent of row order and partitioning).

Error model: relative error ≈ 1.04 / sqrt(2^lgConfigK); the default
lgConfigK=12 gives ~1.6%. The property tests pin <5% vs exact on this
corpus and exact merge/direct agreement.

Engine-specific binary — no DuckDB oracle can replay the sketch bytes,
so the gate query is rows-only; correctness is carried by the property
tests in tests/test_operators.py (error bound vs exact, rollup-merge ==
direct-sketch identity, order/partitioning independence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per ``key_cols``
    group — the materialize-once side. Map-side partial aggregation
    applies (sketches merge associatively), so the shuffle carries one
    ~2^lgConfigK-byte sketch per (task, group), never raw values."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(
            sketch_col
        )
    )


def sketch_merge(
    rollup: DataFrame,
    key_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Re-aggregate a sketch rollup to coarser keys (or an arbitrary
    filtered slice) and estimate: ``groupBy(coarser).hll_union_agg`` +
    ``hll_sketch_estimate``. The input is the rollup table — at 100 TB
    this aggregates |groups| sketch rows, not the raw corpus."""
    merged = rollup.groupBy(*key_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    )
    return merged.select(
        *key_cols,
        F.hll_sketch_estimate(F.col("__merged")).alias(estimate_col),
    )


def sketch_estimate(
    rollup: DataFrame,
    key_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Per-row estimates of an existing rollup (no re-grouping)."""
    return rollup.select(
        *key_cols,
        F.hll_sketch_estimate(F.col(sketch_col)).alias(estimate_col),
    )


def rolling_distinct_sketch(
    df: DataFrame,
    time_col: str,
    key_col: str,
    window_days: int = 7,
    lg_config_k: int = 12,
    day_col: str = "day",
    out_col: str = "n_active_est",
) -> DataFrame:
    """Sketch twin of ``operators/window_agg.rolling_distinct``: one HLL
    per day (built once), then each output day UNIONS its ≤W trailing
    daily sketches — shuffle O(W · days · 4 KB), independent of both raw
    rows AND key cardinality. The exact twin's W·pairs fan-out grows
    with the active-key set; this one never does — the right side of
    the trade for MAU-style windows over huge key spaces."""
    daily = sketch_rollup(
        df.select(
            F.to_date(F.col(time_col)).alias(day_col), F.col(key_col)
        ),
        [day_col],
        key_col,
        lg_config_k=lg_config_k,
    )
    days = daily.select(day_col)
    fan = daily.select(
        F.explode(
            F.sequence(
                F.col(day_col),
                F.date_add(F.col(day_col), window_days - 1),
            )
        ).alias(day_col),
        "hll",
    )
    merged = (
        fan.join(F.broadcast(days), day_col)
        .groupBy(day_col)
        .agg(F.hll_union_agg("hll").alias("__m"))
    )
    return merged.select(
        day_col, F.hll_sketch_estimate("__m").alias(out_col)
    )
