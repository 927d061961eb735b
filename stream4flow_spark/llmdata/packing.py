"""Sequence packing for LLM training-data preparation.

Training pipelines concatenate the corpus in a deterministic order and
chunk the token stream into fixed-size sequences (GPT-style "pack and
chunk"); each document needs its global token offset so downstream
writers know which sequence(s) it lands in.

A global token offset is a prefix sum over a total order — the naive
Spark expression (`SUM OVER (ORDER BY key)` with no PARTITION BY)
collapses to ONE task and is a scale-killer at 100 TB. This module
computes the same exact offsets with a two-level distributed prefix sum:

1. hash-bucket every doc (md5 — deterministic, engine-independent, and
   decorrelated from ingestion order so buckets are balanced);
2. in-bucket cumulative sums run in parallel, one window partition per
   bucket (the global order is (bucket, key));
3. per-bucket totals — `n_buckets` rows, not O(data) — get a running
   base offset via a tiny window, and broadcast-join back.

The only non-parallel step is the `n_buckets`-row base-offset window;
everything O(data) is map-side or hash-partitioned. The result is
byte-identical to the single-window formulation (the DuckDB oracle in
`gate_llm.py` IS the single-window formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.sampling import hash_bucket


def whitespace_tokens(text_col: str = "text") -> F.Column:
    """Whitespace token count (matches the quality tier's n_tokens)."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 256,
    key_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "s4f-pack",
) -> DataFrame:
    """Assign every document its global token offset and the training
    sequences it spans under pack-and-chunk with ``budget`` tokens per
    sequence.

    ``token_col`` names a precomputed per-doc token count (e.g. the
    exact BPE counts from `llmdata/bpe.encode_with_bpe`); default is the
    whitespace count derived from ``text_col``.

    Returns the input keyed columns plus: n_tokens, bucket, token_offset
    (global prefix sum over the (bucket, key) total order), seq_first,
    seq_last, n_seqs. A doc spans floor(offset/B)..floor((offset+n-1)/B).
    """
    key = F.col(key_col)
    n_tok = (
        F.col(token_col).cast("long")
        if token_col is not None
        else whitespace_tokens(text_col)
    )
    t = docs.select(
        key.alias(key_col),
        n_tok.alias("n_tokens"),
        (hash_bucket(key, salt) % n_buckets).alias("bucket"),
    )

    # level 1: parallel in-bucket prefix sums (one window partition per
    # bucket; partition count == n_buckets, each O(data/n_buckets))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("off_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))

    # level 2: running base offset over the n_buckets-row totals table —
    # the single-task window touches n_buckets rows, never O(data)
    totals = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    base = totals.withColumn(
        "base_off", F.coalesce(F.sum("bucket_tokens").over(w_b), F.lit(0))
    ).select("bucket", "base_off")

    out = t.join(F.broadcast(base), "bucket").withColumn(
        "token_offset", F.col("base_off") + F.col("off_in")
    )
    b = F.lit(budget)
    return out.select(
        key_col,
        "n_tokens",
        "bucket",
        "token_offset",
        F.floor(F.col("token_offset") / b).alias("seq_first"),
        F.floor((F.col("token_offset") + F.col("n_tokens") - 1) / b).alias(
            "seq_last"
        ),
        (
            F.floor((F.col("token_offset") + F.col("n_tokens") - 1) / b)
            - F.floor(F.col("token_offset") / b)
            + 1
        ).alias("n_seqs"),
    )
