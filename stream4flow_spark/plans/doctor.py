"""Plan doctor — the plan-quality rules as a reusable diagnostic.

`tests/test_plan_quality.py` enforces scale rules on the shipped
queries; this module packages the same rules for USER pipelines:
`diagnose(df)` returns findings, `python -m stream4flow_spark doctor
<query>` prints them. Each rule names the 100 TB failure it predicts —
the point is catching a scale-killer from the plan at sf0.001, before
anyone pays for it at sf-huge.
"""

from __future__ import annotations

import re
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


_SKETCH_NODE = re.compile(r"^[\s+:*-]*([A-Za-z][A-Za-z ]*\S)\s+\((\d+)\)$")
#: nodes a Window's required ordering/distribution passes through
_PASS_THROUGH = {"Sort", "Project", "Filter", "WindowGroupLimit"}


def _window_fed_by_single_partition(plan: str) -> bool:
    """True iff some Window node's input spine reaches an Exchange whose
    detail arguments say SinglePartition — i.e. a genuinely global
    (no PARTITION BY) window over data, not a scalar aggregate's 1-row
    SinglePartition elsewhere in the tree."""
    lines = plan.splitlines()
    # node id -> detail text (the "(<id>) <Name>" blocks after the sketch)
    details: dict[str, str] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s+\S", ln.strip())
        if m:
            cur = m.group(1)
            details[cur] = ln
        elif cur is not None:
            details[cur] += "\n" + ln
    # sketch walk: a node's input chain prints on the following lines
    for i, ln in enumerate(lines):
        m = _SKETCH_NODE.match(ln)
        if not m or not m.group(1).startswith("Window"):
            continue
        for nxt in lines[i + 1:]:
            nm = _SKETCH_NODE.match(nxt)
            if not nm:
                break
            name = nm.group(1).split()[0]
            if name == "Exchange":
                if "SinglePartition" in details.get(nm.group(2), ""):
                    return True
                break
            if name not in _PASS_THROUGH:
                break
    return False


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
        # Only a SinglePartition exchange on a Window's INPUT spine is
        # the global-window scale-killer; a 1-row scalar aggregate's
        # SinglePartition elsewhere in the tree (broadcast corpus
        # totals under a per-key window) is the normal scalar plan.
        # The formatted sketch gives the tree (node names + ids); the
        # detail section gives each Exchange's partitioning — walk each
        # Window's input chain (Sort/Project pass-throughs) to its
        # first Exchange and look that id up in the details.
        if _window_fed_by_single_partition(plan):
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

    # Actual Filter operator nodes + per-scan PushedFilters association.
    # The formatted-explain detail section headers each node as
    # "(<id>) <NodeName>"; attributes (Output, PushedFilters, ...) follow
    # until the next header, so tracking the current node id ties each
    # "PushedFilters: []" line to its owning scan. A plan with no Filter
    # node (e.g. a filterless full-table aggregate) legitimately pushes
    # nothing and must NOT warn.
    lines = plan.splitlines()
    node_hdr = re.compile(r"^\((\d+)\)\s+(\S.*)$")
    has_filter_node = False
    cur_scan: str | None = None
    scans_no_push: list[str] = []
    for ln in lines:
        m = node_hdr.match(ln.strip())
        if m:
            name = m.group(2).strip()
            if name.startswith("Filter"):
                has_filter_node = True
            if "Scan parquet" in name:
                cur_scan = f"({m.group(1)}) {name}"
            else:
                cur_scan = None
        elif cur_scan and ln.strip().startswith("PushedFilters: []"):
            scans_no_push.append(cur_scan)
    if has_filter_node and scans_no_push:
        findings.append(
            Finding("warn", "unpushed-filter",
                    "the plan has Filter operator(s) while scan(s) "
                    "pushed no predicates — check whether the filter "
                    "could reach the reader "
                    f"(scans: {sorted(scans_no_push)})")
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
