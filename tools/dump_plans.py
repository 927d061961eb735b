#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query (or a subset)
to a directory, plus a one-line plan-shape summary (Exchange count,
join strategies, Python-eval nodes, scan pushdown) per query.

Usage:
  python tools/dump_plans.py OUTDIR [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stream4flow_spark.registry import queries
    from stream4flow_spark.session import get_spark

    spark = get_spark(app_name="s4f-plans")
    summary = {}
    for name, fn in sorted(queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            summary[name] = {"error": str(e)[:200]}
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        summary[name] = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "python": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
                    plan,
                )
            ),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "sorts": len(re.findall(r"\bSort \[", plan)),
            "aqe": "AdaptiveSparkPlan" in plan,
            "plan_chars": len(plan),
        }
    with open(os.path.join(outdir, "_summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    # compact table to stdout
    for name, s in sorted(summary.items()):
        if "error" in s:
            print(f"{name}: ERROR {s['error']}")
        else:
            print(
                f"{name}: ex={s['exchanges']} reuse={s['reused_exchanges']} "
                f"smj={s['smj']} bhj={s['bhj']} shj={s['shj']} py={s['python']} "
                f"win={s['window']} sort={s['sorts']} chars={s['plan_chars']}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
