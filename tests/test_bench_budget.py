"""Per-query performance budget (VERDICT r1 item 10).

Runs the real bench harness at sf0.1 and fails if any gate query
regresses more than 2x against the recorded round-1 numbers
(BENCH_r01.json) — locking each round's performance as the next round's
floor. A small absolute slack absorbs single-VM noise (the box's
run-to-run jitter is ~1.5x on sub-second queries when another JVM is
active); a true structural regression (wrong join order, lost pushdown,
driver collect) is way past 2x + slack. Queries new since the baseline
are skipped — they get a budget when the next BENCH_r{N} lands.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BASELINE = REPO / "BENCH_r01.json"
SLACK_SEC = 1.5
FACTOR = 2.0


def _baseline_queries() -> dict[str, float]:
    """BENCH_r{N}.json is the driver's wrapper: the bench's own JSON line
    lives (escaped) inside its `tail` field."""
    doc = json.loads(BASELINE.read_text())
    if "queries" in doc:
        return doc["queries"]
    tail = doc["tail"]
    start = tail.rindex('{"metric"')
    return json.loads(tail[start:])["queries"]


def test_no_query_regresses_2x_vs_recorded_bench():
    baseline = _baseline_queries()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    now = json.loads(line)["queries"]

    over = {
        name: (took, baseline[name])
        for name, took in now.items()
        if name in baseline and took > FACTOR * baseline[name] + SLACK_SEC
    }
    assert not over, (
        "queries regressed >2x vs BENCH_r01.json: "
        + ", ".join(f"{n}: {t:.2f}s vs baseline {b:.2f}s" for n, (t, b) in over.items())
    )
