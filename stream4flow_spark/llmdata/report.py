"""Corpus data card — the one-page report a training run signs off on.

Data cards (Gebru et al., "Datasheets for Datasets") are the standard
release artifact for a training corpus: volume, composition, length
profile, duplication, and PII exposure in one table. Every number here
is already computable with the tier's operators — this composes them
into ONE long-format frame (section, metric, value) cheap enough to run
per snapshot.

Scale shape: one token-counting scan feeds volume, composition, and the
length profile (map-side partials; percentiles via the bounded-state
exact operator); duplication is the digest-keyed aggregate of
exact_dedup; PII counts fold map-side. Nothing is per-token on the
wire; output is O(sources + langs + fixed metrics) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.llmdata.textstats import whitespace_tokens


def _kv(name: str, col):
    return F.struct(
        F.lit(name).alias("metric"), col.cast("double").alias("value")
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
    lang_col: str | None = "lang",
    top_groups: int = 10,
) -> DataFrame:
    """(section, metric, value) long-format data card.

    Sections: volume (docs/chars/tokens), source_share / lang_share
    (top ``top_groups`` by docs, share of documents), length (exact
    token-count percentiles), duplication (exact-dup doc rate by text
    digest), pii (emails/urls/long digit runs per 1k docs)."""
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        *( [F.col(source_col).alias("src")] if source_col else [] ),
        *( [F.col(lang_col).alias("lng")] if lang_col else [] ),
    ).withColumn("n_tokens", F.size(whitespace_tokens(F.col("text"))))

    def rows(section: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(section).alias("section"),
            F.col("metric"),
            F.col("value").cast("double").alias("value"),
        )

    volume = base.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum("n_tokens").alias("n_tokens"),
    ).select(
        F.explode(
            F.array(
                _kv("n_docs", F.col("n_docs")),
                _kv("n_chars", F.col("n_chars")),
                _kv("n_tokens", F.col("n_tokens")),
            )
        ).alias("m")
    ).select("m.metric", "m.value")
    parts = [rows("volume", volume)]

    totals = base.agg(F.count("*").alias("n_all"))
    for col, section in ((source_col and "src", "source_share"),
                         (lang_col and "lng", "lang_share")):
        if not col:
            continue
        share = (
            base.groupBy(F.col(col).alias("metric"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("metric"))
            .limit(top_groups)
            .crossJoin(F.broadcast(totals))
            .select(
                "metric",
                F.round(F.col("n") / F.col("n_all"), 6).alias("value"),
            )
        )
        parts.append(rows(section, share))

    from stream4flow_spark.operators.percentiles import (
        grouped_exact_percentiles,
    )

    length = grouped_exact_percentiles(
        base.withColumn("g", F.lit(1)),
        group_cols=["g"],
        value_col="n_tokens",
        percentiles={"p10_tokens": 0.1, "p50_tokens": 0.5, "p90_tokens": 0.9},
    ).select(
        F.explode(
            F.array(
                _kv("p10_tokens", F.col("p10_tokens")),
                _kv("p50_tokens", F.col("p50_tokens")),
                _kv("p90_tokens", F.col("p90_tokens")),
            )
        ).alias("m")
    ).select("m.metric", "m.value")
    parts.append(rows("length", length))

    dup = (
        base.groupBy(F.md5("text").alias("fp"))
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum("n").alias("docs"),
            F.count("*").alias("uniques"),
        )
        .select(
            F.lit("exact_dup_doc_rate").alias("metric"),
            F.round(
                (F.col("docs") - F.col("uniques")) / F.col("docs"), 6
            ).alias("value"),
        )
    )
    parts.append(rows("duplication", dup))

    from stream4flow_spark.llmdata.textstats import pii_stats

    pii = (
        pii_stats(base.select(F.lit(1).alias("g"), "text"), group_col="g")
        .agg(
            F.sum("n_emails").alias("emails"),
            F.sum("n_urls").alias("urls"),
            F.sum("n_digit_runs").alias("digit_runs"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.explode(
                F.array(
                    _kv("emails_per_1k_docs",
                        F.round(1000.0 * F.col("emails") / F.col("n_all"), 4)),
                    _kv("urls_per_1k_docs",
                        F.round(1000.0 * F.col("urls") / F.col("n_all"), 4)),
                    _kv("digit_runs_per_1k_docs",
                        F.round(1000.0 * F.col("digit_runs") / F.col("n_all"), 4)),
                )
            ).alias("m")
        )
        .select("m.metric", "m.value")
    )
    parts.append(rows("pii", pii))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
