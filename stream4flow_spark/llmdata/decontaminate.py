"""Train/test decontamination — flag training documents that share word
n-grams with a held-out benchmark set.

The standard contamination check for LLM training corpora (n-gram
overlap against evaluation benchmarks): build the distinct n-gram set of
the benchmark documents, then count, for every training document, how
many of its distinct n-grams appear in that set. Documents above a
threshold are quarantined.

Scale design:

- N-grams are formed with ``transform(sequence(...))`` over the token
  array — pure Column ops, map-only, no UDF.
- Each side dedupes its (doc, gram) pairs map-side before the exchange
  (``distinct`` inside the aggregate), so the join carries distinct
  grams only.
- The overlap is a semi-ish inner join keyed on the gram; the benchmark
  side is the small side by construction (benchmarks are MBs, corpora
  are TBs) — AQE broadcast-joins it when it fits, else it's a shuffled
  hash join on the gram key. Counting happens on the join output grouped
  by doc_id: ids + grams travel, never text.
- ``hash_grams=True`` (the 100 TB default) replaces each gram string by
  ``xxhash64(gram)`` before the join, cutting shuffle bytes to 8/gram at
  a 2^-64 collision false-positive rate. The driver gate runs with
  ``hash_grams=False`` so the DuckDB oracle can reproduce counts
  string-exactly; the hashed path is asserted equal in tests/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.dedup import word_grams_from_tokens
from stream4flow_spark.llmdata.textstats import whitespace_tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of ``text`` as an array<string> (empty when
    the document has fewer than n tokens). Delegates to the shared
    zip-with shingle builder (llmdata/dedup.py)."""
    return word_grams_from_tokens(whitespace_tokens(text), n)


def contamination_counts(
    corpus: DataFrame,
    benchmark: DataFrame | None,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
    bloom_prefilter: int | None = None,
    bloom_shards: int = 1,
    bloom_broadcast: bool = True,
    bench_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-corpus-document count of distinct n-grams that also occur in
    ``benchmark``. Documents with zero overlap are absent from the
    output (join semantics — the caller left-joins if it wants zeros).

    ``bloom_prefilter`` = the benchmark's expected distinct-gram count:
    when set, the corpus gram stream is pruned MAP-SIDE against a
    broadcast Bloom bitmap of the benchmark grams before the exact join
    (``operators/bloom.py``). No false negatives ⇒ counts are
    IDENTICAL; the join exchange shrinks from O(corpus grams) to
    O(matching grams + fpp·corpus grams) — at 100 TB the difference
    between shuffling the corpus's whole gram stream and shuffling the
    contaminated sliver. The 1% fpp bitmap for a 10⁸-gram benchmark is
    ~120 MB of broadcast, amortized over every corpus partition.
    ``bloom_shards`` > 1 routes the prune through the SHARDED bitmap
    (``bloom_words_sharded``): a broadcast hash join on the shard id
    instead of the 1-row crossJoin, still zero corpus-side shuffle —
    the form for benchmark gram sets past ~10⁹ keys where one dense
    array outgrows a single broadcast cell. ``bloom_broadcast=False``
    (needs shards > 1) is the rung past ~10¹⁰ keys: the bitmap stops
    being broadcast at all and the probe becomes a shuffled hash join
    on the shard id (``operators/bloom.py`` sizing discussion /
    DEPLOY.md table).

    ``bench_grams``: a precomputed (ideally persisted) DISTINCT
    benchmark gram DataFrame with one ``gram`` column, hashed iff
    ``hash_grams`` — callers that screen many batches against a FIXED
    benchmark (``ContaminationScreenState``) pass it so the benchmark's
    tokenize+explode+distinct runs once per query, not once per batch;
    ``benchmark`` is ignored when it is given."""
    def grams_of(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        # tokenize into a real column BEFORE the gram lambdas — an
        # inlined split() re-evaluates per slice (see dedup.py
        # word_grams_from_tokens)
        toked = df.select(
            *cols, whitespace_tokens(F.col(text_col)).alias("__toks")
        )
        g = toked.select(
            *cols,
            F.explode(word_grams_from_tokens(F.col("__toks"), n)).alias("gram"),
        )
        if hash_grams:
            g = g.withColumn("gram", F.xxhash64("gram"))
        return g

    corpus_grams = grams_of(corpus, keep_id=True)
    if bench_grams is None:
        bench_grams = grams_of(benchmark, keep_id=False).distinct()
    if bloom_prefilter is not None:
        from stream4flow_spark.operators.bloom import bloom_prune

        corpus_grams = bloom_prune(
            corpus_grams,
            bench_grams,
            "gram",
            expected_items=bloom_prefilter,
            shards=bloom_shards,
            broadcast=bloom_broadcast,
        )
    return (
        corpus_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Drop corpus documents sharing ≥ ``min_overlap`` distinct n-grams
    with the benchmark (anti-join against the flagged id set — only ids
    shuffle)."""
    flagged = contamination_counts(
        corpus, benchmark, n, text_col, id_col, hash_grams
    ).filter(F.col("n_contaminated_grams") >= min_overlap)
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


def benchmark_gram_bitmap(
    benchmark: DataFrame,
    n: int = 3,
    expected_grams: int = 1_000_000,
    fpp: float = 0.01,
    text_col: str = "text",
) -> DataFrame:
    """The 1-row broadcastable Bloom bitmap of ``benchmark``'s distinct
    xxhash64'd word n-grams — ``contamination_screen``'s stage-1
    artifact, exposed so a long-running stream builds (and persists) it
    ONCE instead of re-deriving the benchmark grams every micro-batch.
    Probe with the same (n, expected_grams, fpp) it was built with."""
    from stream4flow_spark.operators.bloom import bloom_words

    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("g")
        )
        .select(F.xxhash64("g").alias("gram"))
        .distinct()
    )
    return (
        bloom_words(bench_grams, "gram", expected_grams, fpp)
        .select("bf_words")
        .withColumn("__k", F.lit(1))
    )


def contamination_screen(
    docs: DataFrame,
    benchmark: DataFrame | None,
    n: int = 3,
    expected_grams: int = 1_000_000,
    fpp: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    bitmap: DataFrame | None = None,
) -> DataFrame:
    """MAP-SIDE contamination screen — the STREAM-compatible form of
    ``contamination_counts``: adds ``n_suspect_grams``, an upper bound
    on each document's exact distinct-gram overlap with ``benchmark``,
    computed entirely inside one projection (no explode, no groupBy,
    no per-doc shuffle, NO STATE).

    The benchmark's distinct grams fold into a broadcast Bloom bitmap
    (``operators/bloom.py``) joined in on a constant key — legal and
    stateless in Structured Streaming append mode, so the SAME
    expression screens a batch corpus or a live document stream
    (parity- and plan-tested). Per document, the count of distinct
    grams passing ``might_contain`` is ≥ the true overlap (the filter
    has no false negatives) and exceeds it only by ~fpp junk grams, so:

    - ``n_suspect_grams == 0`` ⇒ certainly clean (the overwhelming
      majority at ingest — they flow through untouched);
    - ``n_suspect_grams ≥ min_overlap`` ⇒ quarantine for the EXACT
      check (``contamination_counts`` over the flagged sliver), the
      usual two-stage screen shape.

    This is the decontamination tier's arrival-time twin: unlike the
    index-backed screens it needs no on-disk state at all, because the
    benchmark is a fixed reference set, not a growing corpus.

    ``bitmap``: a prebuilt (persisted) ``benchmark_gram_bitmap`` — the
    streaming path passes it so the benchmark folds once per query,
    not once per micro-batch; it must have been built with the same
    (n, expected_grams, fpp)."""
    from stream4flow_spark.operators.bloom import bloom_params, might_contain

    m, k = bloom_params(expected_grams, fpp)
    bloom_bitmap = (
        benchmark_gram_bitmap(benchmark, n, expected_grams, fpp, text_col)
        if bitmap is None
        else bitmap
    )
    # tokenize into a real column BEFORE the gram slicer — an inlined
    # whitespace_tokens() would be re-evaluated once per shifted slice
    # (see word_grams_from_tokens' materialization warning)
    probed = (
        docs.withColumn("__toks", whitespace_tokens(F.col(text_col)))
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(bloom_bitmap), "__k")
    )
    n_suspect = F.size(
        F.filter(
            word_grams_from_tokens(F.col("__toks"), n),
            lambda g: might_contain(F.xxhash64(g), "bf_words", m, k),
        )
    )
    return probed.withColumn("n_suspect_grams", n_suspect).drop(
        "__k", "__toks", "bf_words"
    )
