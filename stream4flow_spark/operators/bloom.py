"""DataFrame-native Bloom filter — broadcast pre-filtering for
massively asymmetric joins.

The classic 100 TB decontamination/screening shape: the small side (a
benchmark's n-grams, a blocklist, an already-admitted digest set) fits
in memory as a bitmap; the big side (the corpus) should be pruned
MAP-SIDE before anything shuffles. Spark's own runtime-filter rewrite
(``InjectRuntimeFilter``) does this opportunistically for some joins,
but its ``bloom_filter_agg`` expression is Catalyst-internal (not a
registered SQL function in this build) and it never fires across the
explode-heavy gram pipelines here — so this module builds the same
thing from public DataFrame ops:

- **build** (``bloom_words``): each small-side key sets k bit
  positions (``pmod(xxhash64(key, seed_i), m)``); positions aggregate
  into 64-bit words with ``bit_or`` partials (one shuffle of at most
  m/64 rows) and assemble into a SINGLE ROW holding the dense
  ``array<long>`` bitmap. Nothing touches the driver; the row is
  broadcast-joined to the probe side (the allowlisted 1-row
  ``crossJoin`` pattern).
- **probe** (``might_contain``): pure Column bit tests —
  ``(words[idx >> 6] >> (idx & 63)) & 1`` for each of the k hashes —
  so the prune runs inside whole-stage codegen on the scan, no UDF, no
  shuffle.

No false negatives (a present key always passes), so composing the
prune with the exact join downstream CHANGES NO RESULT — it only cuts
the rows entering the exchange by ~the true non-match fraction (times
1/(1-fpp)). That property is what lets gate queries using the prune
keep their exact DuckDB oracles.

Sizing: the bitmap is m bits = m/64 longs ≈ ``1.44 · n · log2(1/fpp)``
bits. A 10⁸-gram benchmark at 1% fpp is ~120 MB — broadcastable; past
that, shard the filter by ``pmod(key, shards)`` and probe each shard's
slice (same math, s rows instead of 1).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for the target false-positive rate — the
    standard optimum m = -n·ln(fpp)/ln2², k = (m/n)·ln2, with m rounded
    up to a multiple of 64 so the words array is dense."""
    n = max(expected_items, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def bloom_words(
    keys: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
) -> DataFrame:
    """ONE-ROW DataFrame ``(bf_words array<bigint>, bf_m int, bf_k
    int)`` — the dense Bloom bitmap of the distinct ``key_col`` values.

    Fully distributed build: explode each key's k bit positions
    (16-byte rows), ``bit_or``-aggregate per 64-bit word index (partial
    aggregation makes the exchange ≤ m/64 rows regardless of key
    count), densify by left-joining the full word range (empty words →
    0), then assemble the array as ONE ``array_sort(collect_list)`` —
    O(w log w). The words never exist on the driver.

    History (r13): the first cut assembled the dense array with
    ``transform(sequence(...), i -> element_at(map, i))`` — element_at
    on a Catalyst map is a LINEAR scan, so the 1-row assembly task was
    O((m/64)²): 200+ s for a 1M-key filter (9.6M bits → 150k words →
    2×10¹⁰ comparisons) where this shape takes well under a second.
    """
    m, k = bloom_params(expected_items, fpp)
    key = F.col(key_col)
    idx = F.explode(
        F.array(*[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)])
    ).alias("idx")
    bits = (
        keys.select(idx)
        .select(
            F.shiftright("idx", 6).alias("w"),
            # dynamic shift distances need call_function — the PySpark
            # shiftleft/shiftright wrappers only take a literal int
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("idx").bitwiseAND(63).cast("int"),
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    all_words = keys.sparkSession.range(m // 64).select(F.col("id").alias("w"))
    filled = all_words.join(bits, "w", "left").select(
        "w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
    )
    return (
        filled.agg(
            F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("__s")
        )
        .select(
            F.transform("__s", lambda x: x["bits"]).alias("bf_words"),
            F.lit(m).alias("bf_m"),
            F.lit(k).alias("bf_k"),
        )
    )


def might_contain(
    key: Column, words_col: str = "bf_words", m: int | None = None, k: int | None = None
) -> Column:
    """Bloom membership test as a pure Column over a probe row that
    carries the broadcast ``words_col`` (from ``bloom_words`` via a
    1-row crossJoin). ``m``/``k`` must match the build (pass the same
    numbers; they are also carried on the filter row as bf_m/bf_k for
    callers that read them first)."""
    if m is None or k is None:
        raise ValueError("pass the build's (m, k) — read bf_m/bf_k")
    words = F.col(words_col)
    tests = []
    for i in range(k):
        idx = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
        word = F.element_at(words, (F.shiftright(idx, 6) + 1).cast("int"))
        tests.append(
            F.call_function(
                "shiftright", word, idx.bitwiseAND(63).cast("int")
            ).bitwiseAND(1)
            == 1
        )
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_words_sharded(
    keys: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
    shards: int = 16,
) -> DataFrame:
    """``shards`` rows of ``(bf_shard int, bf_words array<bigint>)`` —
    the filter split by ``pmod(xxhash64(key), shards)`` so no single
    bitmap exceeds what one row/broadcast cell can hold. Each shard is
    sized for its expected ``n/shards`` keys, so total bits ≈ the
    unsharded filter; a shard that received no keys is emitted as an
    all-zero bitmap (its probes must all say "absent", not NULL)."""
    m, k = bloom_params(max(1, expected_items // shards), fpp)
    key = F.col(key_col)
    routed = keys.select(
        F.pmod(F.xxhash64(key), F.lit(shards)).cast("int").alias("bf_shard"),
        F.explode(
            F.array(
                *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]
            )
        ).alias("idx"),
    )
    bits = (
        routed.select(
            "bf_shard",
            F.shiftright("idx", 6).alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("idx").bitwiseAND(63).cast("int"),
            ).alias("b"),
        )
        .groupBy("bf_shard", "w")
        .agg(F.bit_or("b").alias("bits"))
    )
    # densify against the full (shard × word) grid, then assemble each
    # shard's array with ONE array_sort(collect_list) — O(w log w) per
    # shard, not the quadratic map-scan assembly (see bloom_words).
    # The grid also covers empty shards, which therefore carry an
    # all-zero bitmap instead of being absent (an absent shard would
    # drop its probe rows at the join — a false negative).
    spark = keys.sparkSession
    n_words = m // 64
    grid = spark.range(shards * n_words).select(
        # integer floor-div, not float `/`: a half-ulp rounding at
        # extreme shards*n_words would route a word to the wrong shard
        F.expr(f"CAST(id DIV {n_words} AS INT)").alias("bf_shard"),
        F.pmod(F.col("id"), F.lit(n_words)).alias("w"),
    )
    filled = grid.join(bits, ["bf_shard", "w"], "left").select(
        "bf_shard", "w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
    )
    return (
        filled.groupBy("bf_shard")
        .agg(F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("__s"))
        .select(
            "bf_shard",
            F.transform("__s", lambda x: x["bits"]).alias("bf_words"),
        )
    )


def bloom_prune(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
    shards: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """``big`` minus the rows whose ``key_col`` is definitely NOT in
    ``keys`` — the map-side prune in front of an exact semi/inner join.
    Survivors still include ~fpp false positives; the exact join after
    this removes them, so results are unchanged while the join exchange
    shrinks to ~(match fraction + fpp) of ``big``.

    ``shards`` > 1 switches to the sharded bitmap (``bloom_words_
    sharded``): the probe becomes a broadcast hash join on the shard id
    — still zero big-side shuffle — with per-row bits bounded at
    ~1.44·(n/shards)·log2(1/fpp). Use when one dense array outgrows a
    single broadcast cell (~10⁹ small-side keys and up).

    ``broadcast=False`` is the rung ABOVE that (requires ``shards`` >
    1): every executor holding the full sharded bitmap is still
    O(total filter bits) of memory each — ~1.44·n·log2(1/fpp) bits,
    past executor budgets somewhere around 10¹⁰ keys (DEPLOY.md sizing
    table). The probe then becomes a SHUFFLED hash join on ``bf_shard``
    (hinted, so AQE cannot demote it back to broadcast): ``big`` pays
    one exchange keyed by the shard id, and the bitmap never leaves the
    cluster. SIZE ``shards`` DELIBERATELY in this mode: ``bf_shard``
    has exactly ``shards`` distinct values, so probe parallelism is
    capped at ``shards`` tasks and per-task filter memory is
    ~total_bits/shards (NOT /shuffle_partitions) — set ``shards`` to at
    least the parallelism you want and so that one shard's bitmap fits
    a task (e.g. 10¹⁰ keys at 1% fpp ≈ 12 GB total → shards ≥ 256 for
    ≤ ~48 MB/shard). No-false-negatives is unchanged — same bitmap,
    same probe expression — so downstream exact joins still make the
    composition result-identical."""
    if shards <= 1:
        if not broadcast:
            raise ValueError(
                "broadcast=False needs shards > 1 — an unsharded bitmap "
                "is one row and can only be broadcast"
            )
        m, k = bloom_params(expected_items, fpp)
        flt = bloom_words(keys, key_col, expected_items, fpp).select("bf_words")
        return (
            big.crossJoin(F.broadcast(flt))
            .filter(might_contain(F.col(key_col), "bf_words", m, k))
            .drop("bf_words")
        )
    m, k = bloom_params(max(1, expected_items // shards), fpp)
    tbl = bloom_words_sharded(keys, key_col, expected_items, fpp, shards)
    probed = big.withColumn(
        "bf_shard",
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(shards)).cast("int"),
    )
    flt_side = F.broadcast(tbl) if broadcast else tbl.hint("shuffle_hash")
    return (
        probed.join(flt_side, "bf_shard")
        .filter(might_contain(F.col(key_col), "bf_words", m, k))
        .drop("bf_shard", "bf_words")
    )
