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
    # Round-13 window. Rotation policy (capacity-aware, enforced by
    # tests/test_results_store.py::test_window_rotation_staleness_policy):
    # with N oracle-backed queries and 50 slots/round, a full rotation
    # takes k = ceil(N/50) rounds, so any query NOT in this window must
    # have a driver-green row at most k-1 rounds old. n_oracle = 160
    # (unchanged from r12), k = ceil(160/50) = 4, judging horizon once
    # CORRECTNESS_r13 lands = r13-3 = r10. The five permanently
    # rows-only queries (bpe_tokenize, quality_model,
    # distinct_sketch_rollup, audio_spectrogram, length_stats_approx)
    # hold no window slot by design (COVERAGE.md). No never-driver-green
    # oracle queries remain, so the window is pure refresh.
    # Slots 1-10: the 10 queries whose latest green is r09 — exactly at
    # the horizon boundary (13-3=10 > 9), so they MUST take slots this
    # round (the r12 window pre-committed this).
    "rel_grouping_sets_nation_year", "rel_lateral_top_orders",
    "rel_quality_audit", "rel_recursive_calendar", "rel_rollup_revenue",
    "rel_snapshot_drift", "rel_trailing_week_revenue", "ssh_auth_simple",
    "tls_classification", "top_n_host_stats",
    # Slots 11-50: 40 of the 50-query r10-latest-green cohort
    # (alphabetical prefix), which hits the horizon at r14 (14-3=11 >
    # 10). The 10 deferred — tpch_q10ish_returned_revenue,
    # tpch_q12ish_shipmode_priority, tpch_q13ish_order_distribution,
    # tpch_q14ish_promo_share, tpch_q18ish_large_orders,
    # tpch_q19ish_bracket_revenue, tpch_q22ish_dormant_customers,
    # tpch_q4ish_priority_check, tpch_q7ish_nation_volume,
    # tpch_q8ish_market_share — stay inside the k=4 horizon through
    # r13 and MUST take r14 window slots, leaving r14 ~40 free slots
    # for the alphabetical prefix of the 50-query r11 cohort (its ~10
    # leftovers take r15 slots with the r12 cohort following) — the
    # steady-state 50-slot rotation.
    "host_pagerank", "llm_ann_cosine_topk", "llm_bm25_topk",
    "llm_decontaminate", "llm_decontaminate_bloom_sharded",
    "llm_dedup_components", "llm_dedup_corpus_keeper", "llm_dedup_savings",
    "llm_embedding_stats", "llm_epoch_upsample", "llm_filter_funnel",
    "llm_gopher_rules", "llm_hybrid_rrf", "llm_importance_sample",
    "llm_incremental_dedup", "llm_incremental_exact_substr_bloom",
    "llm_incremental_semantic_neardup", "llm_knn_label_vote",
    "llm_length_floor", "llm_minhash_lsh_dedup", "llm_mixture_plan",
    "llm_mixture_resample", "llm_ngram_novelty", "llm_pack_sequences",
    "llm_perplexity_buckets", "llm_pii_stats", "llm_prepare_corpus",
    "llm_repetition", "llm_source_cap", "llm_source_overlap_trigram",
    "llm_split_drift", "llm_split_leakage", "llm_tfidf_terms",
    "llm_token_budget", "llm_vocab_growth", "llm_weighted_sample",
    "readside_q3_global_sums", "readside_q4_per_host_sums",
    "readside_q5_histogram_multimetric", "readside_q6_top1_per_type",
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
