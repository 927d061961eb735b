"""Deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native:

- **Exact** — groupBy on a content hash (computed scan-side; only the
  digest shuffles). The canonical 100 TB first pass.
- **N-gram Jaccard** — exact set-similarity verification for candidate
  pairs (the verify stage after any blocking scheme; also usable brute
  force on bounded subsets).
- **MinHash + LSH** — shingle → minhash signature (xxhash64 with per-
  permutation seeds) → banded bucket join → verified pairs. The scale
  path: candidate generation is a groupBy on (band, bucket-hash), never a
  cross join; verification touches only co-bucketed pairs.
- **SimHash** — 64-bit near-dup fingerprint with hamming-distance
  banding (4×16-bit chunks: pairs within hamming ≤ 3 share ≥1 chunk).

All randomness is seed-deterministic, so results are reproducible
run-to-run (a correctness-gate requirement and a good production property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.textstats import whitespace_tokens


# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content hash: keeper = min id, group_size =
    number of collapsed duplicates."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("group_size"),
        )
    )


# ------------------------------------------------------------- shingles

def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (shingles) of a text column."""
    toks = whitespace_tokens(text)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array().cast("array<string>")))


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two shingle arrays (double)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Brute-force pairwise n-gram Jaccard ≥ threshold (id_a < id_b).

    O(N²) — the *verify* semantics; use minhash_lsh_dedup for candidate
    generation at scale.
    """
    shingled = df.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ngram_jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------- minhash + LSH

def minhash_signature(grams: Column, num_perm: int = 64) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, seed=i). Empty shingle set → NULL signature."""
    sig = F.array(
        *[
            F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(i))))
            for i in range(num_perm)
        ]
    )
    return F.when(F.size(grams) > 0, sig)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash/LSH near-dup pairs, verified by true n-gram Jaccard.

    With num_perm=64 and rows_per_band=2 (32 bands), a pair at the 0.5
    Jaccard threshold is bucketed with P ≈ 1 - (1 - 0.25)^32 ≈ 0.9999 —
    candidate recall is effectively exhaustive at the threshold while
    still pruning the vast majority of non-similar pairs.

    Plan shape: shingle+sign (map) → explode bands (×32) → self-join on
    (band, band-signature-hash) → verify Jaccard on co-bucketed pairs.
    """
    assert num_perm % rows_per_band == 0
    bands = num_perm // rows_per_band

    shingled = df.select(
        F.col(id_col).alias("id"),
        word_ngrams(F.col(text_col), n).alias("grams"),
    ).withColumn("sig", minhash_signature(F.col("grams"), num_perm))

    banded = shingled.filter(F.col("sig").isNotNull()).select(
        "id",
        "grams",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * rows_per_band + r)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    )

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.bb.band") == F.col("b.bb.band"))
            & (F.col("a.bb.bucket") == F.col("b.bb.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    return (
        candidates.withColumn(
            "jaccard", ngram_jaccard(F.col("grams_a"), F.col("grams_b"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- simhash

def simhash64(grams: Column) -> Column:
    """64-bit SimHash over shingle hashes: bit j of the result is 1 iff
    more shingles have bit j set than not. (Bit positions are Python-side
    constants — Spark's shift functions take literal shift amounts.)"""
    votes = F.aggregate(
        grams,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, g: F.zip_with(
            acc,
            F.array(
                *[
                    (F.shiftright(F.xxhash64(g), j).bitwiseAND(1) * 2 - 1).cast("long")
                    for j in range(64)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    out = F.lit(0).cast("long")
    for j in range(64):
        bit_value = (1 << j) if j < 63 else -(1 << 63)  # int64 sign bit
        out = out.bitwiseOR(
            F.when(votes.getItem(j) > 0, F.lit(bit_value).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into 4 × 16-bit chunks; any pair with
    hamming ≤ 3 agrees exactly on ≥ 1 chunk (pigeonhole), so the join key
    is (chunk_index, chunk_value) — no cross join.
    """
    hashed = df.select(
        F.col(id_col).alias("id"),
        simhash64(word_ngrams(F.col(text_col), n)).alias("sh"),
    )
    chunked = hashed.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * 16)
                        .bitwiseAND(0xFFFF)
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cv.chunk") == F.col("b.cv.chunk"))
            & (F.col("a.cv.val") == F.col("b.cv.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
