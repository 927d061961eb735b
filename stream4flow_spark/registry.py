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
    # Never-driver-verified oracle queries come first (the window's own
    # policy). 1-12: the round-5 LLM-pipeline additions — lexical/TF-IDF
    # stats, BM25, decontamination, repetition signals, source caps,
    # end-to-end corpus prep, kNN label vote, sequence packing, mixture
    # resampling, length-band selection, embedding diagnostics, segment
    # dedup.
    "llm_tfidf_terms", "llm_bm25_topk", "llm_decontaminate",
    "llm_repetition", "llm_source_cap", "llm_prepare_corpus",
    "llm_knn_label_vote", "llm_pack_sequences", "llm_mixture_resample",
    "llm_length_floor", "llm_embedding_stats", "llm_segment_dedup",
    # 13-28: the round-5 relational additions — as-of join, the q2/q9/
    # q11/q15/q16/q17/q20/q21 TPC-H shapes, funnel/retention, JSON
    # extraction, CUBE, ROWS-frame window, set ops, distribution windows.
    "rel_asof_join", "tpch_q2ish_min_cost_supplier",
    "tpch_q9ish_nation_year_profit", "tpch_q11ish_important_parts",
    "tpch_q15ish_top_supplier", "tpch_q16ish_supplier_variety",
    "tpch_q17ish_small_quantity_revenue", "tpch_q20ish_excess_suppliers",
    "tpch_q21ish_sole_supplier", "rel_funnel_conversion",
    "rel_retention_cohorts", "rel_json_props",
    "rel_cube_mktsegment_year", "rel_moving_order_value",
    "rel_setops_customer_years", "rel_spend_deciles",
    # 29-30: semantics changed in round 5 — the two-stage skew-safe DDoS
    # default and the bounded-state exact percentile plan need rows that
    # match the CURRENT implementation.
    "detection_ddos", "llm_length_stats",
    # 31-42: LLM tier whose only green rows are r02, recorded under the
    # pre-TIMESTAMP_NTZ PySpark — re-verify under 4.1.2 (r4 verdict
    # item 2).
    "llm_text_stats", "llm_language_id", "llm_fingerprints",
    "llm_exact_dedup", "llm_ngram_jaccard", "llm_embedding_neardup",
    "llm_multimodal_decode", "llm_multimodal_resize",
    "llm_multimodal_frames", "llm_multimodal_features",
    "llm_hash_split", "llm_stratified_sample",
    # 43-49: the late round-5 oracle-backed additions (PII audit,
    # incremental dedup, gap fill, unpivot, hybrid RRF, split-leakage
    # audit, NFC fingerprints) — never driver-verified, so they outrank
    # r04-green singles per this window's policy.
    "llm_pii_stats", "llm_incremental_dedup", "rel_gapfill_events",
    "rel_unpivot_measures", "llm_hybrid_rrf", "llm_split_leakage",
    "llm_unicode_normalize",
    # 50: the split-drift audit (never verified) takes the final slot;
    # llm_scene_changes plus the r04-green singles (rel_event_
    # sessionization, rel_rollup_revenue, q4ish, q13ish, q14ish, q7ish,
    # q8ish, q10ish, q18ish, q19ish, q22ish) rotate next round on their
    # recorded rows. The 13 apps + readside + q1/q3/q5ish/q6 are
    # multi-round green and rotate out with their signal; the rows-only
    # entries stay property/recall/reference-loop-tested.
    "llm_split_drift",
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
