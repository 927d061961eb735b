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
    # flow-surface apps (1-17) — headline reference apps; detection_ddos
    # switches to the skew-safe two-stage default this round and needs a
    # fresh green row
    "protocols_statistics", "host_stats", "top_n_host_stats",
    "dns_statistics", "tls_classification", "host_daily_profile",
    "ssh_auth_simple", "ports_scan", "detection_ddos", "reflect_ddos",
    "dns_open_resolvers", "dns_external_resolvers", "pattern_finder",
    "domain_entropy", "iso_timestamps", "alert_suppression",
    "application_template",
    # LLM tier rotated back in (18-29): their only green rows are r02,
    # recorded under the pre-TIMESTAMP_NTZ PySpark — re-verify under 4.1.2
    "llm_text_stats", "llm_language_id", "llm_fingerprints",
    "llm_exact_dedup", "llm_ngram_jaccard", "llm_embedding_neardup",
    "llm_multimodal_decode", "llm_multimodal_resize",
    "llm_multimodal_frames", "llm_multimodal_features",
    "llm_hash_split", "llm_stratified_sample",
    # LLM tier r04 additions (30-36): single green round, keep for a
    # second; llm_length_stats gets the bounded-state percentile plan
    # this round
    "llm_dedup_corpus", "llm_text_clean", "llm_corpus_select",
    "llm_length_stats", "llm_minhash_lsh_dedup", "llm_dedup_components",
    "llm_ann_cosine_topk",
    # relational tier (37-47): the 11 first verified in r04 keep their
    # slots for a second green round; q1/q3/q5ish/q6/semi-anti/pivot are
    # triple-green (r01+r02+r04) and rotate out
    "rel_event_sessionization", "rel_rollup_revenue",
    "tpch_q4ish_priority_check", "tpch_q13ish_order_distribution",
    "tpch_q14ish_promo_share", "tpch_q7ish_nation_volume",
    "tpch_q8ish_market_share", "tpch_q10ish_returned_revenue",
    "tpch_q18ish_large_orders", "tpch_q19ish_bracket_revenue",
    "tpch_q22ish_dormant_customers",
    # 48-50: round-5 additions — the as-of join operator, benchmark
    # decontamination, and BM25 retrieval get their first driver rows.
    # The other six round-5 queries (llm_tfidf_terms, llm_repetition,
    # llm_source_cap, tpch_q17ish/q15ish/q11ish) follow in registration
    # order after the window and rotate in next round; all nine are
    # oracle-parity-tested locally (tests/test_gate_parity.py). Unlisted
    # triple-green apps/readside/tpch rotate out; the rows-only five
    # stay property-tested per the r04 verdict.
    "rel_asof_join", "llm_decontaminate", "llm_bm25_topk",
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
