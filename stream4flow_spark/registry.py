"""Query registry — the single source for the driver gate and bench.

Every implemented operator/query registers here with:
- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first pipeline),
- optionally a DuckDB oracle SQL string over the driver's pre-registered
  views (``region nation customer supplier part orders lineitem events
  documents embeddings``) — omitted only for genuinely non-SQL-expressible
  operators (driver then records a weaker rows-only check),
- a ``covers`` tag listing the SURVEY.md §2 operator ids the query
  exercises, so coverage can be audited line by line.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    covers: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, covers: str = "", oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, covers=covers)
        return fn

    return deco


# The driver verifies the FIRST 50 entries of ``queries()`` per round.
# Which 50 is COMPUTED, not hand-maintained (r13 — the hand-written
# list was the project's single gate-level point of failure): the 50
# stalest oracle-backed queries take the slots, stalest-first, so the
# capacity-aware staleness invariant holds BY CONSTRUCTION forever —
# with N oracle queries and 50 slots a full rotation takes
# k = ceil(N/50) rounds, and refreshing the 50 oldest each round means
# no query's latest driver-green row can ever age past k rounds
# (enforced independently by
# tests/test_results_store.py::test_window_rotation_staleness_policy).
# Never-driver-green queries sort first (latest = -1); ties break
# alphabetically, which is what makes the rotation deterministic and
# reviewable. The permanently rows-only queries (no oracle) hold no
# window slot by design (COVERAGE.md). A red row in the newest
# CORRECTNESS file leaves that query's latest-green at an older round,
# so a FAILED window query automatically keeps (or regains) its slot
# next round — the rotation self-heals.
_WINDOW_CACHE: list[str] | None = None


def _latest_green_rounds() -> dict[str, int]:
    """Latest driver-green round per query, recomputed from the
    committed ``CORRECTNESS_r*.json`` artifacts at the repo root —
    the same green criterion as the staleness-policy test (rows match,
    hash not False, no error)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
            with open(f) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def window_priority() -> list[str]:
    """The 50 oracle-backed queries holding this round's driver-verify
    slots: stalest latest-green first, never-verified before everything,
    names as the tiebreak. Cached per process (the artifacts don't
    change mid-run). Falls back to the 50 alphabetically-first oracle
    queries on a checkout with no CORRECTNESS artifacts."""
    global _WINDOW_CACHE
    if _WINDOW_CACHE is None:
        _load()
        latest = _latest_green_rounds()
        oracle = [n for n, s in REGISTRY.items() if s.oracle is not None]
        _WINDOW_CACHE = sorted(
            oracle, key=lambda n: (latest.get(n, -1), n)
        )[:50]
    return _WINDOW_CACHE


def _ordered() -> dict[str, QuerySpec]:
    _load()
    rank = {name: i for i, name in enumerate(window_priority())}
    fallback = len(rank)
    names = sorted(
        REGISTRY, key=lambda n: (rank.get(n, fallback), list(REGISTRY).index(n))
    )
    return {n: REGISTRY[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _ordered().items() if s.oracle is not None}


def _load() -> None:
    """Import every module that defines gate queries."""
    import stream4flow_spark.gate  # noqa: F401
    import stream4flow_spark.gate_llm  # noqa: F401
    import stream4flow_spark.gate_readside  # noqa: F401
    import stream4flow_spark.gate_relational  # noqa: F401
