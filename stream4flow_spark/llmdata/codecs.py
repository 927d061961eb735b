"""Pure-numpy codecs for uncompressed media formats.

The sandbox has no image/audio libraries, but "multimodal plumbing" is
only credible if some real bytes get really decoded. These three formats
are fully decodable with numpy alone:

- **PPM (P6) / PGM (P5)** — netpbm binary: ASCII header (magic, optional
  ``#`` comments, width, height, maxval) then raw big-endian samples.
- **BMP (BITMAPINFOHEADER, 24-bit BI_RGB)** — little-endian structs,
  bottom-up rows, each row padded to 4 bytes, pixels stored BGR.
- **WAV (RIFF, PCM 16-bit)** — chunked container; ``fmt `` carries rate
  and channel count, ``data`` carries interleaved little-endian int16.

Heavier codecs (JPEG/PNG/H.264) stay behind the ``set_decoder`` hook in
``multimodal.py`` — implementing DCT/DEFLATE here would be scope creep,
not engineering.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported payload bytes."""


# --- netpbm (PPM P6 / PGM P5) ---------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise CodecError(f"PPM wants (h, w, 3), got {arr.shape}")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM (P5)."""
    if arr.ndim != 2:
        raise CodecError(f"PGM wants (h, w), got {arr.shape}")
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def _pnm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace/comment-separated ASCII ints after
    the magic; returns (tokens, offset-of-first-sample-byte). Exactly one
    whitespace byte follows the last header token (netpbm spec)."""
    tokens: list[int] = []
    i = 2  # past magic
    cur = b""
    while i < len(data) and len(tokens) < n_tokens:
        ch = data[i : i + 1]
        if ch == b"#":  # comment to end of line
            while i < len(data) and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif ch.isspace():
            if cur:
                tokens.append(int(cur))
                cur = b""
        elif ch.isdigit():
            cur += ch
        else:
            raise CodecError(f"bad PNM header byte {ch!r} at {i}")
        i += 1
    if len(tokens) < n_tokens:
        raise CodecError("truncated PNM header")
    return tokens, i


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM/PGM bytes -> (h, w, 3) or (h, w) uint8."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise CodecError(f"not a binary PNM: magic {magic!r}")
    (w, h, maxval), off = _pnm_header_tokens(data, 3)
    if maxval != 255:
        raise CodecError(f"only maxval 255 supported, got {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    if len(data) - off < need:
        raise CodecError("truncated PNM samples")
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return (
        raw.reshape(h, w, 3) if channels == 3 else raw.reshape(h, w)
    ).copy()


# --- BMP (24-bit BI_RGB) ---------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise CodecError(f"BMP wants (h, w, 3), got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = (3 * w + 3) // 4 * 4
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # bottom-up rows, BGR order
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise CodecError("not a BMP")
    if len(data) < 54:
        raise CodecError("truncated BMP header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1:
        raise CodecError(f"unsupported BMP: bpp={bpp} comp={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (3 * w + 3) // 4 * 4
    need = row_bytes * h
    if len(data) - pix_off < need:
        raise CodecError("truncated BMP pixels")
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pix_off)
    rows = raw.reshape(h, row_bytes)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --- WAV (PCM 16-bit) ------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved little-endian
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes -> (rate, (n, ch) int16)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a WAV")
    i, rate, ch, samples = 12, None, None, None
    while i + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, i)
        i += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", data, i)
            bits = struct.unpack_from("<H", data, i + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise CodecError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            if len(data) - i < size:
                raise CodecError("truncated WAV data chunk")
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=i)
        i += size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise CodecError("WAV missing fmt/data chunk")
    return rate, samples.reshape(-1, ch).copy()


# --- dispatch --------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    """Best-effort container identification by magic bytes."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Any supported image container -> (h, w, channels>=1) uint8 array.
    Raises NotImplementedError for recognized-but-unsupported formats so
    the ``multimodal.set_decoder`` hook contract stays intact."""
    fmt = sniff(data)
    if fmt in ("ppm", "pgm"):
        arr = decode_pnm(data)
        return arr[:, :, None] if arr.ndim == 2 else arr
    if fmt == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(f"no pure-numpy decoder for payload fmt={fmt!r}")


def box_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average (box) resample of (h, w, c) uint8 to (out_h, out_w, c).

    Each output pixel averages the input pixels whose index maps into its
    box under the standard floor(i * in/out) edge rule — the exact
    semantics the unit tests replicate independently. Vectorized with
    ``np.add.reduceat`` over row/col box edges."""
    h, w, c = arr.shape
    if out_w <= 0 or out_h <= 0:
        raise CodecError("resize target must be positive")
    row_edges = (np.arange(out_h) * h) // out_h
    col_edges = (np.arange(out_w) * w) // out_w
    sums = np.add.reduceat(
        np.add.reduceat(arr.astype(np.float64), row_edges, axis=0),
        col_edges,
        axis=1,
    )
    row_sizes = np.diff(np.append(row_edges, h))
    col_sizes = np.diff(np.append(col_edges, w))
    area = row_sizes[:, None] * col_sizes[None, :]
    return (sums / area[:, :, None]).astype(np.float64)
