"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The real decode (image/audio/video libraries) is STUBBED — those libs are
not in this container — behind ``set_decoder``/``_fake_decode``. What IS
real and tested: the schema contract (binary payload + struct metadata),
the mapInPandas batch shape (iterator of pandas DataFrames, Arrow
transfer), and the partition-friendly plan (pure map stage, no shuffle;
at 100 TB the decode parallelizes per input split and the binary column
is pruned away by Catalyst unless actually referenced).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, ok boolean"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives fake
    (width, height, channels) from the payload length. A real deployment
    calls ``set_decoder(pillow_decode)``."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, 3)


_decoder: Callable[[bytes], tuple[int, int, int]] = _fake_decode


def set_decoder(fn: Callable[[bytes], tuple[int, int, int]]) -> None:
    """Install a real decoder (e.g. Pillow-based). Not available in this
    environment — raise NotImplementedError from your fn to surface
    missing codecs explicitly."""
    global _decoder
    _decoder = fn


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fabricate an opaque binary column from text (UTF-8 bytes) — the
    stand-in for real image/audio payload ingestion."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_images(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: batch-iterates Arrow record batches, calls the
    installed decoder per payload, emits typed metadata."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    w, h, c = _decoder(bytes(payload))
                    rows.append((doc_id, len(payload), w, h, c, True))
                except NotImplementedError:
                    rows.append((doc_id, len(payload), None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "width", "height", "channels", "ok"],
            )

    return media.mapInPandas(decode, schema=DECODE_SCHEMA)
