"""Lexical (sparse/keyword) search over a document corpus — TF-IDF term
statistics and BM25 ranked retrieval.

Complements the dense-embedding tier (llmdata/simsearch.py): a training-
data pipeline needs both — embeddings for semantic near-dup and
retrieval, term statistics for vocabulary building, quality filtering,
and classic BM25 search over trillions of tokens. The reference's text
machinery stops at entropy/whitelists (SURVEY §2.7 C6/C7/C12); this tier
is part of the beyond-reference LLM-data mandate.

Scale design:

- ``corpus_term_stats`` is explode → one hash aggregate keyed by term.
  Partial (map-side) aggregation collapses each partition's token stream
  to its local vocabulary before the exchange, so shuffle volume is
  O(partitions × vocab), not O(tokens) — the only viable shape at 100 TB
  of text. Top-k terms use TakeOrderedAndProject, never a global sort.
- ``bm25_score`` pivots the (small, fixed) query term list into
  conditional-aggregate columns: ONE pass over the token stream keyed by
  doc_id, then a 1-row broadcast of the corpus constants (N, avgdl,
  per-term document frequencies). No per-term join, no driver collect.
  The score expression is a FIXED-ORDER sum over query terms, so the
  double arithmetic is bit-reproducible across engines and runs —
  shuffle-order-independent, which makes top-k boundaries deterministic
  (ties broken by doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.textstats import whitespace_tokens


def _tokens(text_col: str) -> Column:
    """The tier-wide whitespace tokenization (textstats.whitespace_tokens),
    mirroring the DuckDB-side ``string_split_regex(trim(text), '\\s+')``."""
    return whitespace_tokens(F.col(text_col))


def corpus_term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-term corpus statistics: total occurrences (``total_tf``) and
    document frequency (``df`` — number of distinct docs containing the
    term).

    ONE exchange, O(tasks × vocab): each row explodes a concatenation of
    (its tokens tagged as occurrences) and (its DISTINCT tokens tagged
    as doc-presence) — the per-document dedup that ``df`` needs happens
    in-row via ``array_distinct``, because a document IS one row. A
    single groupBy(term) then partial-combines both sums map-side, so
    the shuffle carries each task's local vocabulary once. The naive
    two-level form (groupBy(doc, term) → groupBy(term)) exchanges
    O(documents × per-doc vocab) — 1.6 MB vs ~0.1 MB at sf0.1, and the
    difference between per-task-vocab and per-document rows at 100 TB."""
    toked = docs.select(_tokens(text_col).alias("__toks"))
    tagged = F.concat(
        F.transform(
            F.col("__toks"),
            lambda t: F.struct(
                t.alias("term"),
                F.lit(1).cast("long").alias("occ"),
                F.lit(0).cast("long").alias("doc"),
            ),
        ),
        F.transform(
            F.array_distinct(F.col("__toks")),
            lambda t: F.struct(
                t.alias("term"),
                F.lit(0).cast("long").alias("occ"),
                F.lit(1).cast("long").alias("doc"),
            ),
        ),
    )
    exploded = toked.select(F.explode(tagged).alias("e")).select(
        F.col("e.term").alias("term"),
        F.col("e.occ").alias("occ"),
        F.col("e.doc").alias("doc"),
    )
    return (
        exploded.filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.sum("occ").alias("total_tf"), F.sum("doc").alias("df"))
    )


def top_terms(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k corpus terms by total occurrences (vocabulary head).
    Deterministic tiebreak on the term itself; the limit lowers to
    TakeOrderedAndProject so no partition materializes a global sort."""
    stats = corpus_term_stats(docs, text_col, id_col)
    return stats.orderBy(F.desc("total_tf"), F.asc("term")).limit(k)


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document containing ≥1 query term.

    Returns (id_col, score). idf is the standard Robertson/Sparck-Jones
    smooth form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — positive even
    for terms in more than half the corpus.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    # one pass: per-doc tf for each query term as pivoted columns
    per_doc = toks.groupBy(id_col, "dl").agg(
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    # corpus constants: N, avgdl, df per query term — a single 1-row agg
    consts = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(consts))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    matched = F.lit(False)
    for i in range(len(terms)):
        matched = matched | (F.col(f"tf_{i}") > 0)
    return scored.filter(matched).select(F.col(id_col), score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval; score desc, id asc tiebreak,
    TakeOrderedAndProject physical plan."""
    scored = bm25_score(docs, terms, text_col, id_col, k1, b)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def heavy_hitters(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact frequent-token mining via a Misra-Gries sketch + verify pass
    — the heavy-hitters pattern for corpora whose vocabulary is too
    large to aggregate (URL tails, typo space, CJK segments can push
    distinct tokens past what a vocab-keyed exchange should carry).

    Stage 1 runs Misra-Gries with ``k`` counters per partition inside
    one Arrow pass: any token with global frequency > n/(k+1) must
    exceed its partition share n_p/(k+1) somewhere (averaging
    argument), and MG keeps every such local token, so the UNION of
    per-partition candidate sets provably contains every global heavy
    hitter. The wire cost is ≤ k tokens per partition — independent of
    vocabulary size.

    Stage 2 exact-counts ONLY the candidates (broadcast semi-join
    prunes before the aggregate) and keeps tokens with count > n/k.
    Because the candidate set is a superset of the true heavy hitters,
    the output is EXACTLY ``{token : freq(token) > n/k}`` — fully
    deterministic, oracle-comparable against a brute-force GROUP BY.

    Output: (word, n_occurrences, share) sorted nowhere (set semantics).
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
    ).filter(F.col("word") != "")
    return heavy_hitter_keys(toks, "word", k)


def heavy_hitter_keys(
    keyed: DataFrame, key_col: str, k: int = 50
) -> DataFrame:
    """Generic Misra-Gries heavy hitters over ANY key column — one row
    per input occurrence in ``keyed``. Same sketch-then-verify shape as
    `heavy_hitters` (which tokenizes text and delegates here); also the
    network-tier's top-talkers primitive (key = host/flow 5-tuple) when
    the key space is too large for a full groupBy.
    """
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for w in pdf[key_col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({key_col: list(counters)})

    schema = f"{key_col} {keyed.schema[key_col].dataType.simpleString()}"
    candidates = keyed.mapInPandas(mg, schema).distinct()
    total = keyed.select(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        keyed.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("n") / F.lit(k))
        .select(
            key_col,
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("n"), 6).alias("share"),
        )
    )


def cluster_keywords(
    docs: DataFrame,
    cluster_col: str,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """c-TF-IDF cluster labeling (the BERTopic scheme): the k terms that
    DISTINGUISH each cluster, not merely its most frequent ones —
    score(t, c) = tf_{t,c} · ln(1 + A / f_t), where tf_{t,c} is the
    term's count inside cluster c, f_t its count across ALL clusters,
    and A the average per-cluster token count. The labeling step after
    any clustering tier (cluster_balanced_sample's k-means, semantic
    dedup components): "what IS this region of the corpus".

    Scale shape: one tokenize pass → (cluster, term) counts with
    map-side partial aggregation (shuffle O(partitions × per-cluster
    vocab)); term totals re-aggregate those rows (≤ vocab); A is a
    1-row aggregate broadcast into the scoring projection; top-k per
    cluster is one rank window over scored vocab rows. Text never
    shuffles; nothing is per-token on the wire.

    Output: (cluster, term, tf, score, rank), rank 1..k per cluster;
    ties break by term for engine determinism.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(_tokens(text_col)).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("cluster", "term").agg(F.count("*").alias("tf"))
    ft = tf.groupBy("term").agg(F.sum("tf").alias("f_t"))
    avg_cluster_tokens = tf.groupBy("cluster").agg(
        F.sum("tf").alias("n")
    ).agg(F.avg("n").alias("A"))
    scored = (
        tf.join(ft, "term")
        .crossJoin(F.broadcast(avg_cluster_tokens))
        .select(
            "cluster",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(1.0) + F.col("A") / F.col("f_t")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
