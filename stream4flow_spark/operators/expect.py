"""Declarative data-quality audit — expectations as Columns.

Every ingest pipeline needs the "are these rows sane" gate before the
expensive stages run (the tabular sibling of the JSON quarantine lane in
``streaming/kafka.py`` and `observe_corpus_quality`). Rules are plain
boolean Columns (``F.col("l_quantity").between(1, 50)``), so the whole
audit compiles into ONE pass over the scan: each rule becomes a
conditional sum with map-side partial aggregation — auditing 50 rules on
100 TB costs one scan, not 50.

``audit`` returns the per-rule violation counts (one row);
``quarantine`` splits the rows themselves (pass/fail lanes) using the
same rule Columns, so the audit numbers and the quarantined rows can
never disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(
    df: DataFrame,
    rules: dict[str, Column],
    group_cols: list[str] | None = None,
    include_clean: bool = False,
) -> DataFrame:
    """Per-rule violation counts: ``n_rows`` + one ``<rule>_violations``
    per rule — one global row, or one row per group when ``group_cols``
    is given (the per-source corpus report). Still ONE conditional-sum
    pass either way; the grouped form shuffles one partial-aggregated
    row per group, never the data.

    A NULL rule result counts as a violation (unknown is not a pass) —
    the same convention SQL CHECK constraints use. ``include_clean``
    adds ``n_clean`` — rows violating NO rule (the quarantine()
    keep-lane size, so the audit and the split can't drift).
    """
    fails = [
        (~F.coalesce(cond, F.lit(False))).cast("long")
        for cond in rules.values()
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(f).alias(f"{name}_violations")
        for name, f in zip(rules, fails)
    ]
    if include_clean:
        aggs.append(
            F.sum(
                (sum(fails[1:], fails[0]) == 0).cast("long")
            ).alias("n_clean")
        )
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passing rows, failing rows + ``failed_rules`` array) from the
    same rule Columns the audit counts — map-only split, no shuffle."""
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", failed)
    ok = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.filter(F.size("failed_rules") > 0)
    return ok, bad
