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


RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, width int, height int, "
    "scale double"
)


def resize_images(
    media: DataFrame,
    max_width: int = 256,
    max_height: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """mapInPandas resize: decode dims, compute the aspect-preserving
    fit into (max_width, max_height). The pixel resample itself is the
    stubbed step (needs an image lib); the plumbing — batch shape, scale
    math, schema — is real. Pure map stage, no shuffle."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, _ = _decoder(bytes(payload))
                scale = min(max_width / w, max_height / h, 1.0)
                rows.append(
                    (doc_id, w, h, int(w * scale), int(h * scale), scale)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_width", "src_height", "width", "height",
                    "scale",
                ],
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_ms long"


def sample_frames(
    media: DataFrame, fps_out: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas frame sampler: treats the payload as a fake video of
    ``n_bytes % 30 + 1`` frames at 30 fps and emits every 30/fps_out-th
    frame — a 1→N row fan-out inside the map stage (the real decoder
    would seek/decode those frames). Deterministic, so oracle-checkable."""
    step = max(30 // fps_out, 1)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = len(payload) % 30 + 1
                for i in range(0, n_frames, step):
                    rows.append((doc_id, i, i * 1000 // 30))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_ms"])

    return media.mapInPandas(frames, schema=FRAMES_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extractor: payload → fixed-dim float vector.
    The real model inference is the stubbed step; the deterministic
    stand-in (``((n*31 + j*7) % 997) / 997``) keeps the plumbing —
    Arrow batches, array<double> output column, map-only plan —
    oracle-checkable."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(dim)
        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy()
            vecs = ((n[:, None] * 31 + j[None, :] * 7) % 997) / 997.0
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": list(vecs)}
            )

    return media.mapInPandas(feats, schema=f"{id_col} long, features array<double>")
