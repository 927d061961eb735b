"""Streaming ingest for the training-data tier: dedup-on-arrival.

A corpus build ingests documents continuously; exact dedup belongs AT THE
EDGE, before anything expensive (tokenization, embedding, near-dup) runs.
This is the streaming twin of ``llmdata.dedup.exact_dedup``:

- content fingerprint (md5) computed scan-side, exactly like the batch op;
- ``dropDuplicatesWithinWatermark([fp])`` keeps the FIRST arrival per
  fingerprint and — the part that matters at scale — lets Spark EVICT a
  fingerprint from state once it falls behind the watermark. Unbounded
  ``dropDuplicates`` state on an infinite corpus stream is the classic
  leak; the watermark bound makes state O(docs within the dedup horizon),
  with the documented trade that a duplicate arriving later than the
  horizon is re-emitted (a downstream batch ``exact_dedup`` pass catches
  those — the standard lambda-style backstop).

The document tables carry no event-time column, so ``ingest_ts`` is an
explicit parameter: production wires the source's arrival time (Kafka
record timestamp, file mtime); tests derive a deterministic one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprinted(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the ``fp`` content hash (same digest as the batch exact_dedup)."""
    return docs.withColumn("fp", F.md5(F.col(text_col)))


def dedup_documents_stream(
    stream_docs: DataFrame,
    ingest_ts: Column,
    horizon: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Keep the first-arriving document per content hash, state bounded by
    ``horizon``. Output = input columns + fp + ingest_ts."""
    return (
        fingerprinted(stream_docs, text_col)
        .withColumn("ingest_ts", ingest_ts)
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["fp"])
    )
