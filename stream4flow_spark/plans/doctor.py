"""Plan doctor — the plan-quality rules as a reusable diagnostic.

`tests/test_plan_quality.py` enforces scale rules on the shipped
queries; this module packages the same rules for USER pipelines:
`diagnose(df)` returns findings, `python -m stream4flow_spark doctor
<query>` prints them. Each rule names the 100 TB failure it predicts —
the point is catching a scale-killer from the plan at sf0.001, before
anyone pays for it at sf-huge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    severity: str  # "error" | "warn" | "info"
    rule: str
    detail: str


def _formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def diagnose(df: DataFrame) -> list[Finding]:
    """Static plan audit. Rules (severity — what breaks at 100 TB):

    - cartesian-product (error): O(N·M) pairs, no filter pushdown.
    - nested-loop-join (warn): fine only when the build side is bounded
      by construction (top-k query sets, 1-row scalar aggregates).
    - single-partition-exchange (warn): a serial step; fatal when its
      input is data-sized (global windows are the usual culprit).
    - python-row-udf (warn): BatchEvalPython is per-row Python — use a
      pandas UDF (ArrowEvalPython) or built-in Columns.
    - unpushed-filter (warn): Filter directly above a scan whose
      PushedFilters is empty — the scan reads what the filter drops.
    - exchange-count (info): every Exchange is a full shuffle of its
      input; the count is the first thing to sanity-check.
    """
    plan = _formatted_plan(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding("error", "cartesian-product",
                    "plan contains CartesianProduct — O(N*M) pair blowup")
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            Finding("warn", "nested-loop-join",
                    "BroadcastNestedLoopJoin: acceptable ONLY if the "
                    "build side is bounded by construction")
        )
    if "SinglePartition" in plan:
        if "Window" in plan:
            findings.append(
                Finding("warn", "single-partition-exchange",
                        "Exchange SinglePartition feeding a Window: a "
                        "global window without PARTITION BY sorts ALL "
                        "rows in one task — bound its input (aggregate "
                        "first / two-level prefix sum) or it dies at "
                        "scale")
            )
        else:
            findings.append(
                Finding("info", "single-partition-exchange",
                        "Exchange SinglePartition: expected for scalar "
                        "(no-key) aggregates — verify the input is the "
                        "few-row aggregate state, not data")
            )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding("warn", "python-row-udf",
                    "BatchEvalPython: row-at-a-time Python UDF — use "
                    "pandas UDFs (Arrow) or built-in Columns")
        )

    # Filter node whose child scan pushed nothing down
    lines = plan.splitlines()
    scans_no_push = {
        ln.split("Scan parquet")[-1].strip().split("[")[0].strip()
        for ln in lines
        if "PushedFilters: []" in ln
    }
    if "PushedFilters: []" in plan and "Filter" in plan:
        findings.append(
            Finding("warn", "unpushed-filter",
                    "a scan has PushedFilters: [] while the plan "
                    "filters — predicate not reaching the reader "
                    f"(scans: {sorted(scans_no_push) or 'see plan'})")
        )

    n_ex = sum(
        1 for ln in lines if ln.strip().startswith("(") and " Exchange" in ln
    )
    findings.append(
        Finding("info", "exchange-count",
                f"{n_ex} shuffle exchange(s) in the plan")
    )
    return findings


def format_findings(findings: list[Finding]) -> str:
    order = {"error": 0, "warn": 1, "info": 2}
    out = []
    for f in sorted(findings, key=lambda f: order[f.severity]):
        out.append(f"[{f.severity.upper():5s}] {f.rule}: {f.detail}")
    return "\n".join(out)
