"""CLI runner — the operational surface of the reference's
``run-application.sh`` (provisioning/.../run-application.sh.j2:28: one
spark-submit per app), re-expressed over the query registry.

    python -m stream4flow_spark list
    python -m stream4flow_spark run protocols_statistics \
        --sf-dir /root/testdata/sf0.001 --sink console --limit 20
    python -m stream4flow_spark run host_stats --sink parquet:/tmp/out

Every registry entry (apps, detections, read-side, LLM-data ops) is
runnable; sinks are console (debug), noop (bench), or parquet:<path>.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from stream4flow_spark.registry import REGISTRY, queries
    from stream4flow_spark.session import get_spark

    qs = queries()

    p = argparse.ArgumentParser(prog="stream4flow_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list runnable queries")
    runp = sub.add_parser("run", help="run one query")
    runp.add_argument("query", choices=sorted(qs))
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument(
        "--sink", default="console", help="console | noop | parquet:<path>"
    )
    runp.add_argument("--limit", type=int, default=20, help="console row cap")
    docp = sub.add_parser(
        "doctor", help="static plan audit of one query (scale anti-patterns)"
    )
    docp.add_argument(
        "query", nargs="?", choices=sorted(qs),
        help="omit with --all to sweep every registered query",
    )
    docp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    docp.add_argument(
        "--all", action="store_true",
        help="audit every registered query; exit 1 on any error finding",
    )
    args = p.parse_args(argv)

    if args.cmd == "list":
        for name in sorted(qs):
            spec = REGISTRY[name]
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:38s} [{oracle}] covers: {spec.covers}")
        return 0

    if args.cmd == "doctor" and args.all:
        from stream4flow_spark.plans.doctor import diagnose

        spark = get_spark(app_name="s4f-doctor")
        n_err = 0
        for name in sorted(qs):
            findings = diagnose(qs[name](spark, args.sf_dir))
            errs = [f for f in findings if f.severity == "error"]
            warns = [f for f in findings if f.severity == "warn"]
            n_err += len(errs)
            status = "ERROR" if errs else ("warn" if warns else "ok")
            detail = "; ".join(f.rule for f in errs + warns)
            print(f"{name:38s} {status:5s} {detail}")
        return 1 if n_err else 0
    if args.cmd == "doctor" and not args.query:
        p.error("doctor needs a query name or --all")

    spark = get_spark(app_name=f"s4f-{args.query}")
    df = qs[args.query](spark, args.sf_dir)
    if args.cmd == "doctor":
        from stream4flow_spark.plans.doctor import diagnose, format_findings

        print(format_findings(diagnose(df)))
        return 0
    if args.sink == "console":
        df.show(args.limit, truncate=False)
    elif args.sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    elif args.sink.startswith("parquet:"):
        df.write.mode("overwrite").parquet(args.sink.split(":", 1)[1])
    else:
        print(f"unknown sink: {args.sink}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
