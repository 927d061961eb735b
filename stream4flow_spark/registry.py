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
    # Round-8 window. Rotation policy (capacity-aware, enforced by
    # tests/test_results_store.py::test_window_rotation_staleness_policy):
    # with N oracle-backed queries and 50 slots/round, a full rotation
    # takes k = ceil(N/50) rounds, so any query NOT in this window must
    # have a driver-green row at most k-1 rounds old. The r07 verdict's
    # 2-round horizon became arithmetically unsatisfiable at N=133
    # (133 > 2x50); k self-adjusts as the registry grows.
    # 1-33: the entire r05-latest-green cohort (the 33 queries the r07
    # staleness tripwire named — r07 verdict item 1).
    "detection_ddos", "llm_embedding_neardup", "llm_exact_dedup",
    "llm_fingerprints", "llm_hash_split", "llm_language_id",
    "llm_length_stats", "llm_multimodal_decode", "llm_multimodal_features",
    "llm_multimodal_frames", "llm_multimodal_resize", "llm_ngram_jaccard",
    "llm_stratified_sample", "llm_text_stats", "llm_unicode_normalize",
    "rel_asof_join", "rel_cube_mktsegment_year", "rel_funnel_conversion",
    "rel_gapfill_events", "rel_json_props", "rel_moving_order_value",
    "rel_retention_cohorts", "rel_setops_customer_years",
    "rel_spend_deciles", "rel_unpivot_measures",
    "tpch_q2ish_min_cost_supplier", "tpch_q9ish_nation_year_profit",
    "tpch_q11ish_important_parts", "tpch_q15ish_top_supplier",
    "tpch_q16ish_supplier_variety", "tpch_q17ish_small_quantity_revenue",
    "tpch_q20ish_excess_suppliers", "tpch_q21ish_sole_supplier",
    # 34-39: six of the twelve rows-only queries with NO driver row of
    # any kind yet, so the driver's weaker rows-only check runs at least
    # once on each (r07 verdict item 3). llm_embedding_neardup_lsh and
    # llm_ann_ivf_topk, first drafted here, already HAD early-round rows
    # (the staleness CI caught it) — swapped for two genuinely
    # never-seen ones; the remaining never-seen rows-only queries get
    # r09 slots.
    "llm_simhash_dedup", "llm_winnow_neardup", "llm_winnow_fingerprints",
    "llm_ann_quantized_topk", "llm_bpe_tokenize", "llm_quality_model",
    # 40-50: the eleven new-in-r08 queries (never verified by
    # definition — the staleness policy REQUIRES the oracle-backed ones
    # here). They filled the slots previously reserved for r06-cohort
    # pre-rotation.
    #
    # r09 PLANNING (computed at r08 close): once r08 goes green, exactly
    # 50 oracle queries sit at latest=r06 and k=ceil(144/50)=3 makes the
    # judging horizon r09-2=r07 — so the r09 window must EITHER be
    # exactly that 50-query r06 cohort (no room for r09 additions or the
    # 6 still-never-green rows-only: ann_ivf, embedding_neardup_lsh,
    # audio_spectrogram, image_phash, length_stats_approx,
    # semantic_dedup_lsh), OR r09 adds >=7 new oracle-backed queries so
    # n_oracle>=151 pushes k to 4 and the horizon back to r06 — freeing
    # slots for the additions + rows-only while the r06 cohort waits for
    # r10. Adding 1-6 oracle queries is the one infeasible move.
    "llm_exact_substr_dedup", "llm_cluster_balanced_sample",
    "llm_dsir_select", "llm_leakage_safe_split", "llm_hard_negatives",
    "llm_corpus_diff", "host_triangles", "rel_distinct_sketch_rollup",
    "rel_rolling_active_users", "rel_attribution", "host_kcore",
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
