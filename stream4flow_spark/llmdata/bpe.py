"""Byte-pair-encoding tokenizer: distributed statistics, bounded training,
map-only encoding.

The quality tier's `n_tokens_bpe` is a regex approximation; training
pipelines need REAL subword token counts (sequence packing budgets,
per-doc cost estimates) from an actual learned vocabulary. The classic
BPE trainer (Sennrich et al. 2016, public algorithm) is an iterative
global argmax over pair frequencies — inherently sequential — so the
scale split mirrors `simsearch`'s IVF centroids:

- **word statistics are exact and distributed**: one explode → groupBy
  word count (map-side combine; shuffle is O(vocabulary), not corpus),
  keep the top `max_words` head — at web scale the frequency mass the
  merges care about lives entirely in the head;
- **merge training is driver-side on that bounded table** (``max_words``
  rows, independent of corpus size);
- **encoding is map-only**: the merge ranks broadcast to an
  Arrow-batched ``mapInPandas`` kernel with a per-batch word cache (text
  is Zipfian — the cache turns per-word merge loops into dict hits).
  Nothing shuffles; the encoder runs at scan speed.

Determinism: merge ties break on (count desc, pair lexicographic), and
word counts are exact, so the same corpus always trains the same
vocabulary on any engine/partitioning.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"


def word_counts_head(
    docs: DataFrame, max_words: int, text_col: str = "text"
) -> list[tuple[str, int]]:
    """Exact corpus word counts, top ``max_words`` by (count desc, word).

    The ONLY driver-materialized object in the trainer, bounded by
    ``max_words`` regardless of corpus size."""
    wc = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(max_words)
    )
    return [(r.w, r["count"]) for r in wc.collect()]


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    max_words: int = 10_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus (classic
    frequency-argmax trainer over the bounded word-count head)."""
    head = word_counts_head(docs, max_words, text_col)
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_END,): c for w, c in head
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best_pair[0]
                    and sym[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (greedy lowest-rank-first — the
    standard BPE inference loop)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_with_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document exact BPE token count (and subword count of the
    longest word, a cheap tokenizer-health signal).

    Map-only: merge ranks ride the closure (broadcast once per
    executor); the Arrow-batched kernel caches word segmentations within
    each batch, so Zipfian text costs ~one merge loop per DISTINCT word.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    # carry the id column's ACTUAL type through the Arrow batch — string
    # or int32 doc ids must round-trip, not null-cast to long
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("n_tokens_bpe_exact", IntegerType()),
            StructField("max_word_subwords", IntegerType()),
        ]
    )

    def encode(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            n_out, m_out = [], []
            for text in pdf[text_col]:
                total, worst = 0, 0
                for w in (text or "").split():
                    k = cache.get(w)
                    if k is None:
                        k = len(segment_word(w, ranks))
                        cache[w] = k
                    total += k
                    worst = max(worst, k)
                n_out.append(total)
                m_out.append(worst)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens_bpe_exact": pd.array(n_out, dtype="int32"),
                    "max_word_subwords": pd.array(m_out, dtype="int32"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(encode, out_schema)
