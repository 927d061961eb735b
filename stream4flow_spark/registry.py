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
# With >50 registered queries, this list pins which ones land inside that
# window: every query that has never had a driver-green CORRECTNESS row
# comes first; queries already green in multiple prior rounds (r02+r03 for
# the LLM tier) rotate out, keeping their recorded signal. Names not
# listed keep registration order after the pinned prefix, so nothing is
# ever dropped from ``queries()`` itself.
WINDOW_PRIORITY: list[str] = [
    # Round-12 window. Rotation policy (capacity-aware, enforced by
    # tests/test_results_store.py::test_window_rotation_staleness_policy):
    # with N oracle-backed queries and 50 slots/round, a full rotation
    # takes k = ceil(N/50) rounds, so any query NOT in this window must
    # have a driver-green row at most k-1 rounds old. n_oracle = 160
    # (unchanged from r11), k = ceil(160/50) = 4, judging horizon once
    # CORRECTNESS_r12 lands = r12-3 = r09. The five permanently
    # rows-only queries (bpe_tokenize, quality_model,
    # distinct_sketch_rollup, audio_spectrogram, length_stats_approx)
    # hold no window slot by design (COVERAGE.md). No never-driver-green
    # oracle queries remain (r11 closed the last four), so the window is
    # pure refresh.
    # Slots 1-10: the 10 queries whose latest green is r08 — exactly at
    # the horizon boundary (12-3=9 > 8), so they MUST take slots this
    # round (the r11 window pre-committed this).
    "rel_spend_deciles", "rel_unpivot_measures",
    "tpch_q11ish_important_parts", "tpch_q15ish_top_supplier",
    "tpch_q16ish_supplier_variety", "tpch_q17ish_small_quantity_revenue",
    "tpch_q20ish_excess_suppliers", "tpch_q21ish_sole_supplier",
    "tpch_q2ish_min_cost_supplier", "tpch_q9ish_nation_year_profit",
    # Slots 11-50: 40 of the 50-query r09-latest-green cohort
    # (alphabetical prefix), which hits the horizon at r13 (13-3=10 >
    # 9). The 10 deferred — rel_grouping_sets_nation_year,
    # rel_lateral_top_orders, rel_quality_audit, rel_recursive_calendar,
    # rel_rollup_revenue, rel_snapshot_drift, rel_trailing_week_revenue,
    # ssh_auth_simple, tls_classification, top_n_host_stats — stay
    # inside the k=4 horizon through r12 and MUST take r13 window
    # slots, leaving r13 ~40 free slots for the alphabetical prefix of
    # the 50-query r10 cohort (its ~10 leftovers take r14 slots with
    # the r11 cohort following) — the steady-state 50-slot rotation.
    "alert_suppression", "application_template", "dns_external_resolvers",
    "dns_open_resolvers", "dns_statistics", "domain_entropy",
    "host_daily_profile", "host_stats", "iso_timestamps",
    "llm_ann_ivf_topk", "llm_ann_quantized_topk", "llm_chunk_documents",
    "llm_corpus_select", "llm_decontaminate_bloom", "llm_dedup_corpus",
    "llm_dedup_rate_by_source", "llm_embedding_coverage",
    "llm_embedding_neardup_lsh", "llm_heavy_hitters",
    "llm_image_phash_neardup", "llm_incremental_exact_substr",
    "llm_incremental_neardup", "llm_incremental_winnow_neardup",
    "llm_random_projection", "llm_scene_changes", "llm_segment_dedup",
    "llm_semantic_dedup", "llm_semantic_dedup_lsh", "llm_source_overlap",
    "llm_text_clean", "llm_unigram_logprob", "llm_winnow_fingerprints",
    "llm_winnow_neardup", "pattern_finder", "ports_scan",
    "protocols_statistics", "readside_q1_range_term",
    "readside_q2_histogram_terms_sum", "reflect_ddos",
    "rel_event_sessionization",
]


def _ordered() -> dict[str, QuerySpec]:
    _load()
    rank = {name: i for i, name in enumerate(WINDOW_PRIORITY)}
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
