"""End-to-end pretraining-corpus preparation — the composition a corpus
build actually runs, as one DataFrame program.

scrub → quality floors → exact dedup → benchmark decontamination →
deterministic split. Each stage is an existing first-class operator
(clean_text, quality_features, exact_dedup, decontaminate, hash_split);
composing them in one lazy plan means Catalyst prunes columns across
stage boundaries (the text column is dropped the moment no later stage
needs it) and every exchange in the whole pipeline is id- or
digest-keyed — the document text itself never crosses the wire.
Scrubbing, quality floors and split assignment are map-side expressions
on the scan; only the dedup digest aggregate, the keeper/flagged id
joins, and the decontamination gram join shuffle.

The gate query (gate_llm.llm_prepare_corpus) verifies the COMPOSITION
against a single DuckDB CTE chain — stage-by-stage oracles already exist
for every individual operator, so a mismatch here isolates to stage
wiring, not operator logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.decontaminate import decontaminate
from stream4flow_spark.llmdata.dedup import exact_dedup
from stream4flow_spark.llmdata.sampling import hash_split
from stream4flow_spark.llmdata.textstats import clean_text, quality_features


def prepare_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_alnum: float = 0.5,
    decontam_n: int = 3,
    decontam_min_overlap: int = 5,
    split_weights: dict[str, float] | None = None,
    hash_grams: bool = True,
    cache_intermediate: bool = True,
) -> DataFrame:
    """Prepare ``corpus`` for training against a held-out ``benchmark``.

    Returns one row per surviving document: (id_col, every non-text
    input column, n_tokens, split). Stages, in order:

    1. scrub (clean_text): redact emails/URLs/digit runs, normalize
       whitespace — all later stages see the cleaned text.
    2. quality floors: ≥ ``min_tokens`` whitespace tokens and
       ≥ ``min_alnum`` alphanumeric density on the cleaned text.
    3. exact dedup: keep the min-id document per distinct cleaned text.
    4. decontamination: drop documents sharing ≥
       ``decontam_min_overlap`` distinct ``decontam_n``-grams with the
       (also scrubbed) benchmark.
    5. deterministic md5 split (train/val/test by default).

    The quality-filtered intermediate is referenced by three downstream
    branches (dedup keepers, the keeper semi-join probe, the
    decontamination grams) — without materialization Catalyst recomputes
    the scrub + quality chain once per branch (measured 10× slower at
    sf0.1). ``cache_intermediate`` persists it (memory-and-disk, evicted
    LRU / on session close); a production pipeline would checkpoint the
    same boundary to a table.
    """
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}

    corpus_clean = clean_text(corpus, text_col)
    bench_clean = clean_text(benchmark, text_col)

    q = quality_features(corpus_clean, text_col="text_clean").filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("alnum_ratio") >= min_alnum)
    )
    if cache_intermediate:
        q = q.persist()
    keepers = exact_dedup(q, text_col="text_clean", id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    kept = q.join(keepers, id_col, "left_semi")

    survivors = decontaminate(
        kept,
        bench_clean,
        n=decontam_n,
        min_overlap=decontam_min_overlap,
        text_col="text_clean",
        id_col=id_col,
        hash_grams=hash_grams,
    )

    out_cols = [
        c
        for c in corpus.columns
        if c not in (text_col, id_col)
    ]
    return hash_split(
        survivors.select(id_col, *out_cols, "n_tokens"), weights,
        key_col=id_col,
    )


def build_training_set(
    corpus: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    token_budget_per_source: int | None = None,
    seq_budget: int = 2048,
    n_shards: int = 16,
    n_pack_buckets: int = 256,
    prepare_kwargs: dict | None = None,
) -> dict:
    """The whole corpus build, end to end: prepare → mixture-cap → pack
    → sharded export with a verified manifest.

    Composes the operators a migrating user would otherwise wire by
    hand — `prepare_corpus` (scrub → quality floors → exact dedup →
    decontaminate → split), then the per-``group_col`` TOKEN budget cap
    on the TRAIN split only (eval splits are never thinned — their
    whole point is stability), `pack_sequences` for training-sequence
    offsets, and `export.write_shards` + `verify_shards` so the output
    directory carries a consumer-checkable manifest.

    Returns {"manifest": ..., "verify": ..., "splits": {split: rows}}.

    Plan shape: prepare_corpus materializes its quality intermediate
    once (see its docstring); everything after operates on the
    metadata-narrow survivor frame (id, source, n_tokens, split) —
    text is re-joined ONLY for the packed shard write, by id, at the
    very end. At 100 TB the expensive scans stay inside
    prepare_corpus; the mixture/pack/export tail is id-keyed
    arithmetic."""
    from stream4flow_spark.llmdata.export import verify_shards, write_shards
    from stream4flow_spark.llmdata.packing import pack_sequences
    from stream4flow_spark.llmdata.sampling import token_budget_per_group

    prepared = prepare_corpus(
        corpus, benchmark, id_col=id_col, text_col=text_col,
        **(prepare_kwargs or {}),
    )

    train = prepared.filter(F.col("split") == "train")
    rest = prepared.filter(F.col("split") != "train")
    if token_budget_per_source is not None:
        train = token_budget_per_group(
            train,
            group_col,
            budget=token_budget_per_source,
            weight_col="n_tokens",
            key_col=id_col,
        ).drop("cum_weight")
    final = train.unionByName(rest)

    packed = pack_sequences(
        final,
        budget=seq_budget,
        n_buckets=n_pack_buckets,
        key_col=id_col,
        token_col="n_tokens",  # already counted — no re-tokenize, no text
    ).select(id_col, "token_offset", "seq_first", "seq_last")
    with_text = final.join(packed, id_col).join(
        corpus.select(id_col, text_col), id_col
    )

    manifest = write_shards(
        with_text, out_dir, n_shards=n_shards, key_col=id_col
    )
    verify = verify_shards(corpus.sparkSession, out_dir)
    splits = {
        r["split"]: r["n"]
        for r in final.groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return {"manifest": manifest, "verify": verify, "splits": splits}
