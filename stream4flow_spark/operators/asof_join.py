"""As-of join — match each left row to the nearest earlier right row.

The reference's closest shape is the time-proximity join J4
(dns_external_resolvers.py:149-166, |Δt| ≤ 5 s both directions); an as-of
join is its directional cousin and the canonical operator for "attach the
most recent state/price/event at time t" — e.g. joining each interaction
event to the latest preceding conversion, or each flow to the most recent
DNS answer for the same client. Spark has no built-in as-of join, so this
implements one as a composition of existing DataFrame ops (SURVEY §4.3
custom-operator route (a)): no range explosion, no per-pair
materialization.

Plan shape (the one you'd want at 100 TB):

1. Pack each side's payload into a struct and UNION the two sides on
   (keys…, ts, side) — a narrow map on both inputs.
2. One exchange on the join keys + an in-partition sort on (ts, side) —
   exactly the cost of a sort-merge join's shuffle, with no join blow-up.
3. A running ``last(payload, ignorenulls=True)`` window gives every left
   row the most recent right payload at-or-before its timestamp in a
   single pass; right rows sort before left rows at equal timestamps so
   the match is inclusive (ts_right ≤ ts_left).
4. Unpack, filter (inner) or keep (left) unmatched rows, apply the
   optional tolerance bound.

Compared to the bucketized interval join (operators/interval_join.py)
this never duplicates rows and holds no per-bucket candidate sets: the
shuffle carries each input row exactly once. A key whose history is too
large for one task is the same skew boundary a sort-merge join has; at
that point split the key by coarse time chunk and as-of join the chunk
boundaries separately.

The right side must be unique per (keys…, ts): with duplicate
right timestamps "the most recent row" is ill-defined. Pre-aggregate
duplicates away (the gate query does) — callers get deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Join each left row to the nearest right row per ``on`` key:
    ``direction='backward'`` (default) picks the LATEST right with
    ``right_ts <= left_ts``; ``direction='forward'`` the EARLIEST right
    with ``right_ts >= left_ts`` (the mirror — implemented by negating
    the numeric sort key, so the timestamp columns must be numeric).

    Output columns: every left column, then every non-key right column
    (including ``right_ts``). ``how`` is ``inner`` (drop unmatched left
    rows) or ``left`` (keep them with NULL right columns). ``tolerance``
    (same unit as the ts columns) additionally bounds
    ``|left_ts - right_ts| <= tolerance`` on the matched side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    right_payload_cols = [c for c in right.columns if c not in on]
    if right_ts not in right_payload_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")
    payload = F.struct(*[F.col(c) for c in right_payload_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    left_struct = F.struct(*[F.col(c) for c in left.columns])
    left_type = left.select(left_struct.alias("l")).schema["l"].dataType

    l_side = left.select(
        *on,
        F.col(left_ts).alias("__asof_t"),
        F.lit(1).alias("__side"),
        left_struct.alias("__left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("__asof_t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left_type).alias("__left"),
        payload.alias("__payload"),
    )

    order_key = (
        F.col("__asof_t")
        if direction == "backward"
        else -F.col("__asof_t")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(order_key, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    if tolerance is not None:
        delta = F.col("__asof_t") - F.col(f"__match.{right_ts}")
        if direction == "forward":
            delta = -delta
        matched = matched.withColumn(
            "__match", F.when(delta <= F.lit(tolerance), F.col("__match"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())

    return matched.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload_cols],
    )
