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
    # Round-9 window. Rotation policy (capacity-aware, enforced by
    # tests/test_results_store.py::test_window_rotation_staleness_policy):
    # with N oracle-backed queries and 50 slots/round, a full rotation
    # takes k = ceil(N/50) rounds, so any query NOT in this window must
    # have a driver-green row at most k-1 rounds old. r09 took the
    # "add >=7 oracle-backed queries" branch the r08 plan computed:
    # SEVEN former rows-only queries converted to real DuckDB oracles
    # (winnow x2 via the md5 dual-mode, quantized-ANN via pinned
    # floor-rounding, IVF + embedding-LSH + semantic-LSH + image-pHash
    # via deterministic replay) plus the NEW llm_incremental_exact_substr
    # plus the NEW Bloom-pruned decontamination path and the NEW
    # incremental winnow screen — n_oracle 144->154, k=ceil(154/50)=4,
    # judging horizon r09-3=r06.
    # The five remaining rows-only queries (bpe_tokenize, quality_model,
    # distinct_sketch_rollup, audio_spectrogram, length_stats_approx)
    # are genuinely un-oracle-able and PERMANENTLY hold no window slot —
    # the driver has no weaker rows-only check (omitted oracle => red
    # no_oracle row, proven r08); their certification is the named
    # property tests in COVERAGE.md.
    # 1-10: every never-driver-green oracle-backed query (the staleness
    # policy REQUIRES these here) — the 7 conversions, the incremental
    # ExactSubstr + winnow screens, and the Bloom-pruned
    # decontamination path.
    "llm_winnow_neardup", "llm_winnow_fingerprints",
    "llm_ann_quantized_topk", "llm_ann_ivf_topk",
    "llm_embedding_neardup_lsh", "llm_semantic_dedup_lsh",
    "llm_image_phash_neardup", "llm_incremental_exact_substr",
    "llm_decontaminate_bloom", "llm_incremental_winnow_neardup",
    # 11-50: 40 of the 50-query r06-latest-green cohort (pre-rotation;
    # alphabetical prefix). The 10 deferred — tpch_q10ish/q12ish/
    # q13ish/q14ish/q18ish/q19ish/q22ish/q4ish/q7ish/q8ish — sit at
    # latest=r06, inside the k=4 horizon through r09 (9-3=6) and MUST
    # take r10 window slots (r10 judging horizon 10-3=7), leaving r10
    # ~40 free slots.
    "alert_suppression", "application_template", "dns_external_resolvers",
    "dns_open_resolvers", "dns_statistics", "domain_entropy",
    "host_daily_profile", "host_stats", "iso_timestamps",
    "llm_chunk_documents", "llm_corpus_select", "llm_dedup_corpus",
    "llm_dedup_rate_by_source", "llm_embedding_coverage",
    "llm_heavy_hitters", "llm_incremental_neardup", "llm_random_projection",
    "llm_scene_changes", "llm_segment_dedup", "llm_semantic_dedup",
    "llm_source_overlap", "llm_text_clean", "llm_unigram_logprob",
    "pattern_finder", "ports_scan", "protocols_statistics",
    "readside_q1_range_term", "readside_q2_histogram_terms_sum",
    "reflect_ddos", "rel_event_sessionization",
    "rel_grouping_sets_nation_year", "rel_lateral_top_orders",
    "rel_quality_audit", "rel_recursive_calendar", "rel_rollup_revenue",
    "rel_snapshot_drift", "rel_trailing_week_revenue", "ssh_auth_simple",
    "tls_classification", "top_n_host_stats",
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
