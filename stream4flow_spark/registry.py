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
    # Round-6 window. Policy unchanged: never-driver-verified first,
    # then changed-implementation, then oldest/fewest-green. The 50
    # r05-green queries rotate out on their fresh rows.
    # 1-4: the only oracle-backed queries with NO driver row anywhere
    # (added after the r05 window was pinned — r05 verdict item 1).
    "llm_scene_changes", "llm_dedup_rate_by_source",
    "rel_lateral_top_orders", "rel_recursive_calendar",
    # 5-17: new this round (never verified by definition).
    "tpch_q12ish_shipmode_priority", "llm_unigram_logprob",
    "llm_semantic_dedup", "rel_grouping_sets_nation_year",
    "llm_chunk_documents", "llm_random_projection",
    "llm_heavy_hitters", "llm_source_overlap", "llm_incremental_neardup",
    "rel_trailing_week_revenue", "rel_quality_audit",
    "rel_snapshot_drift", "llm_embedding_coverage",
    # 12: implementation changed this round (struct-min first-occurrence
    # winner replaced the packed-int pk) — re-certify the current plan.
    "llm_segment_dedup",
    # 13-26: exactly-one-green r04 singles (the registry comment's
    # promised rotation).
    "llm_text_clean", "llm_corpus_select", "llm_dedup_corpus",
    "rel_event_sessionization", "rel_rollup_revenue",
    "tpch_q4ish_priority_check", "tpch_q13ish_order_distribution",
    "tpch_q14ish_promo_share", "tpch_q7ish_nation_volume",
    "tpch_q8ish_market_share", "tpch_q10ish_returned_revenue",
    "tpch_q18ish_large_orders", "tpch_q19ish_bracket_revenue",
    "tpch_q22ish_dormant_customers",
    # 27-50: the three-green (r01+r03+r04) apps/readside set — last
    # verified r04, oldest standing signal after the singles.
    "protocols_statistics", "host_stats", "top_n_host_stats",
    "dns_statistics", "tls_classification", "host_daily_profile",
    "ssh_auth_simple", "ports_scan", "reflect_ddos",
    "dns_open_resolvers", "dns_external_resolvers", "pattern_finder",
    "domain_entropy", "iso_timestamps", "alert_suppression",
    "application_template", "readside_q1_range_term",
    "readside_q2_histogram_terms_sum",
    # readside_q3..q9 (three-green) and
    # the nine four-green queries
    # (llm_minhash_lsh_dedup, llm_ann_cosine_topk, llm_dedup_components,
    # tpch_q1_pricing_summary,
    # tpch_q6_forecast_revenue, tpch_q3_top_revenue_orders,
    # tpch_q5ish_revenue_per_region, rel_semi_anti_customers,
    # rel_pivot_order_priority) defer to r07 on their four recorded
    # green rows — the deepest-verified queries in the registry.
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
