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
    # Round-11 window. Rotation policy (capacity-aware, enforced by
    # tests/test_results_store.py::test_window_rotation_staleness_policy):
    # with N oracle-backed queries and 50 slots/round, a full rotation
    # takes k = ceil(N/50) rounds, so any query NOT in this window must
    # have a driver-green row at most k-1 rounds old. Bookkeeping
    # correction (r10 ADVICE): r10 added TWO oracle-backed queries
    # (llm_decontaminate_bloom_sharded AND
    # llm_incremental_exact_substr_bloom) — n_oracle 154->156. r11 adds
    # four more (the non-broadcast Bloom rung, the IPv6 CIDR
    # classifier, and the CDC chunk-dedup tier — batch + incremental) —
    # n_oracle 156->160, k=ceil(160/50)=4 unchanged, judging horizon
    # r11-3=r08. The five permanently rows-only queries (bpe_tokenize,
    # quality_model, distinct_sketch_rollup, audio_spectrogram,
    # length_stats_approx) hold no window slot by design (COVERAGE.md).
    # Slots 1-4: the never-driver-green oracle-backed queries (the
    # staleness policy REQUIRES never-green queries first).
    "llm_decontaminate_bloom_shuffle", "net_cidr_v6_classify",
    "llm_cdc_chunk_dedup", "llm_incremental_cdc_chunks",
    # 5-16: the 12 queries whose latest green is r07 — exactly at the
    # horizon boundary once CORRECTNESS_r11 lands (11-3=8 > 7), so they
    # MUST take slots this round (the r10 window pre-committed this).
    "readside_q7_latest_per_group", "readside_q8_either_term",
    "readside_q9_ordered", "rel_part_cooccurrence",
    "rel_pivot_order_priority", "rel_scd2_user_state",
    "rel_semi_anti_customers", "rel_time_to_convert",
    "tpch_q1_pricing_summary", "tpch_q3_top_revenue_orders",
    "tpch_q5ish_revenue_per_region", "tpch_q6_forecast_revenue",
    # 17-50: 34 of the 44-query r08-latest-green cohort (alphabetical
    # prefix), which hits the horizon at r12 (12-3=9 > 8). The 10
    # deferred — rel_spend_deciles, rel_unpivot_measures,
    # tpch_q11ish_important_parts, tpch_q15ish_top_supplier,
    # tpch_q16ish_supplier_variety, tpch_q17ish_small_quantity_revenue,
    # tpch_q20ish_excess_suppliers, tpch_q21ish_sole_supplier,
    # tpch_q2ish_min_cost_supplier, tpch_q9ish_nation_year_profit —
    # stay inside the k=4 horizon through r11 and MUST take r12 window
    # slots, leaving r12 ~40 free slots for the alphabetical prefix of
    # the 50-query r09 cohort (horizon r13; its ~10 leftovers take r13
    # slots with the r10 cohort following) — the steady-state 50-slot
    # rotation.
    "detection_ddos", "host_kcore", "host_triangles",
    "llm_cluster_balanced_sample", "llm_corpus_diff", "llm_dsir_select",
    "llm_embedding_neardup", "llm_exact_dedup", "llm_exact_substr_dedup",
    "llm_fingerprints", "llm_hard_negatives", "llm_hash_split",
    "llm_language_id", "llm_leakage_safe_split", "llm_length_stats",
    "llm_multimodal_decode", "llm_multimodal_features",
    "llm_multimodal_frames", "llm_multimodal_resize", "llm_ngram_jaccard",
    "llm_simhash_dedup", "llm_stratified_sample", "llm_text_stats",
    "llm_unicode_normalize", "rel_asof_join", "rel_attribution",
    "rel_cube_mktsegment_year", "rel_funnel_conversion",
    "rel_gapfill_events", "rel_json_props", "rel_moving_order_value",
    "rel_retention_cohorts", "rel_rolling_active_users",
    "rel_setops_customer_years",
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
