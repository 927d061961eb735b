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


def audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row: ``n_rows`` + one ``<rule>_violations`` count per rule.

    A NULL rule result counts as a violation (unknown is not a pass) —
    the same convention SQL CHECK constraints use.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(
            f"{name}_violations"
        )
        for name, cond in rules.items()
    ]
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
