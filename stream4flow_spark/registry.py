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
    # Round-7 window. Policy unchanged: never-driver-verified first,
    # then oldest-green (nothing changed implementation this round).
    # After this round every oracle-backed query's latest green row is
    # ≤ 2 rounds old (the staleness invariant test_results_store pins).
    # 1-4: the only pre-existing oracle-backed queries with NO driver
    # row anywhere (added after the r06 window was pinned — r06 verdict
    # item 1).
    "llm_dedup_savings", "llm_vocab_growth", "llm_ngram_novelty",
    "rel_part_cooccurrence",
    # 5-18: new this round (never verified by definition).
    "llm_dedup_corpus_keeper", "llm_source_overlap_trigram",
    "llm_incremental_semantic_neardup", "llm_gopher_rules",
    "llm_token_budget", "llm_perplexity_buckets", "rel_scd2_user_state",
    "llm_epoch_upsample", "llm_mixture_plan", "llm_filter_funnel",
    "llm_importance_sample", "host_pagerank", "rel_time_to_convert",
    "llm_weighted_sample",
    # 14-29: the sixteen queries whose latest green is r04 — the
    # readside_q3..q9 set and the nine four-green queries the r06
    # registry comment committed to this window.
    "readside_q3_global_sums", "readside_q4_per_host_sums",
    "readside_q5_histogram_multimetric", "readside_q6_top1_per_type",
    "readside_q7_latest_per_group", "readside_q8_either_term",
    "readside_q9_ordered",
    "llm_minhash_lsh_dedup", "llm_ann_cosine_topk",
    "llm_dedup_components", "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue_orders", "tpch_q5ish_revenue_per_region",
    "tpch_q6_forecast_revenue", "rel_semi_anti_customers",
    "rel_pivot_order_priority",
    # 30-50: backfill with single-green r05 rows (alphabetical; the
    # eight deferred singles — tpch_q2ish/q9ish/q11ish/q15ish/q16ish/
    # q17ish/q20ish/q21ish — plus the multi-green r05 set lead the r08
    # window under the ≤2-round staleness invariant).
    "llm_bm25_topk", "llm_decontaminate", "llm_embedding_stats",
    "llm_hybrid_rrf", "llm_incremental_dedup", "llm_knn_label_vote",
    "llm_length_floor", "llm_mixture_resample", "llm_pack_sequences",
    "llm_pii_stats", "llm_prepare_corpus", "llm_repetition",
    "llm_source_cap", "llm_split_drift", "llm_split_leakage",
    "llm_tfidf_terms",
    # (llm_unicode_normalize / rel_asof_join / rel_cube_mktsegment_year /
    # rel_funnel_conversion / rel_gapfill_events / rel_json_props /
    # rel_moving_order_value / rel_retention_cohorts /
    # rel_setops_customer_years / rel_spend_deciles /
    # rel_unpivot_measures yielded their backfill slots to the eleven
    # gate queries added later in round 7; their r05 greens join the
    # deferred set that leads the r08 window.)
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
