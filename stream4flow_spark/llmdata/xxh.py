"""Vectorized, bit-exact XXH64 (NumPy) — the hash family behind Spark's
``xxhash64`` expression.

Why this exists (guide §4.2): the MinHash signature evaluates
``xxhash64`` 1 + num_perm times per shingle. In Column land that is
num_perm codegen'd JVM hash calls per exploded gram row plus a wide
64-column partial aggregate and an id-keyed exchange. Moving the whole
signature into one Arrow kernel needs the *identical* hash values —
banding keys, candidate sets and the DuckDB oracles all replay
``xxhash64`` arithmetic — so this module re-implements Spark's XXH64
exactly (same primes, same stripe/word/int/byte tail order, same
little-endian word reads as ``Platform.getLong`` on x86) and is pinned
bit-for-bit against ``F.xxhash64`` by
``tests/test_xxh_bitexact.py`` over random and adversarial inputs.

All arithmetic is ``np.uint64`` with wraparound (Java ``long``
semantics); callers reinterpret as int64 (``.view(np.int64)``) where
Spark's LongType values are needed.

``PRIME64_2`` is DERIVED at import rather than transcribed — a
portability/self-check mechanism, not evidence of a non-standard
engine: ``_recover_prime2()`` algebraically inverts one pinned probe
value, ``xxhash64(CAST(0 AS BIGINT))`` (with v=0 the input mix
vanishes, so the probe is ``fmix(rotl27(seed+P5+8)·P1 + P4)`` and
every fmix step is invertible — xor-shift is a bijection, the primes
are odd). Against this Spark build the pinned probe equals stock
XXH64's ``hashLong(0, 42)`` and the derivation resolves to the
textbook constant ``0xC2B2AE3D27D4EB4F`` (verified numerically); if an
engine ever shipped a perturbed prime, the same derivation would
recover it, and ``tests/test_xxh_bitexact.py`` re-validates the whole
family against the live engine either way.

Scale note: hashing here is per-partition map work on data already in
Arrow buffers — zero-copy reads of the UTF-8 child buffer of a
ListArray — so the kernel's cost model is flat bytes/sec per core with
no JVM↔Python row boundary (no pickling, no per-row Python objects).
"""
from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

_IP1 = 0x9E3779B185EBCA87
_IP3 = 0x165667B19E3779F9
_IP4 = 0x85EBCA77C2B2AE63
_IP5 = 0x27D4EB2F165667C5

# xxhash64(CAST(0 AS BIGINT)) on the target engine — re-pin (one SQL
# probe) if the engine's hash family ever changes; the bit-exactness
# test fails loudly on any drift.
_PROBE_ZERO_LONG = -5252525462095825812


def _recover_prime2(probe: int = _PROBE_ZERO_LONG) -> int:
    """Derive the engine's PRIME64_2 from the v=0 long-hash probe (see
    module docstring). Pure int arithmetic, runs once at import."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    def un_xorshift(h: int, s: int) -> int:
        x = h
        for _ in range(64 // s + 1):
            x = h ^ (x >> s)
        return x

    # hashLong(0, 42): k1 = rotl31(0·P2)·P1 = 0, so the pre-fmix state
    # x0 involves only the unperturbed constants
    x0 = (rotl((42 + _IP5 + 8) & _M64, 27) * _IP1 + _IP4) & _M64
    t1 = x0 ^ (x0 >> 33)  # fmix input after the first xor-shift
    assert t1 & 1, "probe state even — cannot invert; re-pin the probe"
    t4 = un_xorshift(probe & _M64, 32)
    t3 = (t4 * pow(_IP3, -1, 1 << 64)) & _M64
    t2 = un_xorshift(t3, 29)
    return (t2 * pow(t1, -1, 1 << 64)) & _M64


_IP2 = _recover_prime2()

_P1 = np.uint64(_IP1)
_P2 = np.uint64(_IP2)
_P3 = np.uint64(_IP3)
_P4 = np.uint64(_IP4)
_P5 = np.uint64(_IP5)
_U64 = np.uint64


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def xxh64_longs(vals: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of each 8-byte little-endian long — Spark's
    ``xxhash64(bigint_col, seed)``. ``vals`` uint64/int64 → uint64."""
    with np.errstate(over="ignore"):
        v = vals.astype(np.uint64, copy=False)
        h = _U64((int(seed) + int(_P5) + 8) & _M64)
        k1 = _rotl(v * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def _hash_fixed_len(mat: np.ndarray, length: int, seed: np.uint64) -> np.ndarray:
    """XXH64 of k byte-strings, all exactly ``length`` bytes, laid out as
    a C-contiguous (k, padded) uint8 matrix whose columns past ``length``
    are zero and whose padded width is a multiple of 8 (so uint64/uint32
    views are aligned). Vectorized across the k rows; every loop count is
    a compile-time function of ``length`` (Spark XXH64 structure:
    32-byte stripes, then 8-byte words, then one 4-byte int, then
    bytes)."""
    k = mat.shape[0]
    words = mat.view(np.uint64)  # (k, padded//8) little-endian
    n_stripes = length // 32 if length >= 32 else 0
    if length >= 32:
        v1 = np.full(k, (int(seed) + int(_P1) + int(_P2)) & _M64, dtype=np.uint64)
        v2 = np.full(k, (int(seed) + int(_P2)) & _M64, dtype=np.uint64)
        v3 = np.full(k, int(seed) & _M64, dtype=np.uint64)
        v4 = np.full(k, (int(seed) - int(_P1)) & _M64, dtype=np.uint64)
        for s in range(n_stripes):
            base = s * 4
            v1 = _rotl(v1 + words[:, base + 0] * _P2, 31) * _P1
            v2 = _rotl(v2 + words[:, base + 1] * _P2, 31) * _P1
            v3 = _rotl(v3 + words[:, base + 2] * _P2, 31) * _P1
            v4 = _rotl(v4 + words[:, base + 3] * _P2, 31) * _P1
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = h ^ (_rotl(v * _P2, 31) * _P1)
            h = h * _P1 + _P4
    else:
        h = np.full(k, seed + _P5, dtype=np.uint64)
    h = h + _U64(length)
    offset = n_stripes * 32
    while offset + 8 <= length:
        k1 = _rotl(words[:, offset // 8] * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        offset += 8
    if offset + 4 <= length:
        ints = mat.view(np.uint32)
        h = h ^ (ints[:, offset // 4].astype(np.uint64) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        offset += 4
    while offset < length:
        h = h ^ (mat[:, offset].astype(np.uint64) * _P5)
        h = _rotl(h, 11) * _P1
        offset += 1
    return _fmix(h)


def xxh64_utf8(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int
) -> np.ndarray:
    """XXH64 of n variable-length byte strings sliced out of one flat
    uint8 buffer (``data[starts[i] : starts[i]+lengths[i]]``) — Spark's
    ``xxhash64(string_col)`` over the UTF-8 bytes. Returns uint64 (n,).

    Vectorization strategy: group the strings by byte length — within a
    group every XXH64 loop bound is fixed, so the whole group hashes in
    a handful of whole-array NumPy ops. Shingle corpora have O(tens) of
    distinct lengths, so the group loop is short.
    """
    seed = np.uint64(seed)
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    starts = starts.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    order = np.argsort(lengths, kind="stable")
    sorted_len = lengths[order]
    # group boundaries over the length-sorted permutation
    bounds = np.flatnonzero(np.diff(sorted_len)) + 1
    group_starts = np.concatenate(([0], bounds, [n]))
    for gi in range(len(group_starts) - 1):
        lo, hi = group_starts[gi], group_starts[gi + 1]
        length = int(sorted_len[lo])
        idx = order[lo:hi]
        if length == 0:
            with np.errstate(over="ignore"):
                out[idx] = _fmix(np.uint64((int(seed) + int(_P5)) & _M64))
            continue
        padded = ((length + 7) // 8) * 8
        mat = np.zeros((hi - lo, padded), dtype=np.uint8)
        # gather each string's bytes: (k, length) fancy index into data
        mat[:, :length] = data[starts[idx, None] + np.arange(length)]
        out[idx] = _hash_fixed_len(mat, length, seed)
    return out


def xxh64_long_multi_min(
    vals: np.ndarray, num_perm: int, starts: np.ndarray
) -> np.ndarray:
    """MinHash inner loop, fused: Spark's
    ``xxhash64(h0_col, lit(i))`` for i in [0, num_perm) over every long
    in ``vals``, each permutation reduced per segment (``starts`` =
    np.minimum.reduceat boundaries, last segment runs to the end) to
    its SIGNED minimum — Spark's ``min(LongType)`` ordering. Returns
    (num_perm, len(starts)) int64.

    ``xxhash64`` folds its arguments as a seed CHAIN:
    ``xxhash64(h0, i) = hashInt(i, hashLong(h0, 42))`` (the permutation
    index is an int literal). The expensive ``hashLong`` therefore does
    not depend on i at all — it is computed once and shared; each
    permutation pays only the 7-op ``hashInt`` tail. Chain semantics
    pinned bit-for-bit by tests/test_xxh_bitexact.py.
    """
    with np.errstate(over="ignore"):
        h1 = xxh64_longs(vals, 42)
        out = np.empty((num_perm, len(starts)), dtype=np.int64)
        for i in range(num_perm):
            h = h1 + _U64((int(_P5) + 4) & _M64)
            h = h ^ _U64((i & 0xFFFFFFFF) * int(_P1) & _M64)
            h = _rotl(h, 23) * _P2 + _P3
            h = _fmix(h)
            out[i] = np.minimum.reduceat(h.view(np.int64), starts)
        return out


# ------------------------------------------------------------------
# Pure-Python reference (independent transcription of the algorithm,
# scalar) — used only by tests to cross-check the vectorized forms.

def _ref_fmix(h: int) -> int:
    M = (1 << 64) - 1
    h ^= h >> 33
    h = (h * int(_P2)) & M
    h ^= h >> 29
    h = (h * int(_P3)) & M
    h ^= h >> 32
    return h


def ref_xxh64(buf: bytes, seed: int) -> int:
    """Scalar reference XXH64 (Spark's byte-hash path), returns uint64."""
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (int(p) for p in (_P1, _P2, _P3, _P4, _P5))

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & M

    length = len(buf)
    off = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while off <= length - 32:
            def w(o: int) -> int:
                return int.from_bytes(buf[o : o + 8], "little")
            v1 = (rotl((v1 + w(off) * P2) & M, 31) * P1) & M
            v2 = (rotl((v2 + w(off + 8) * P2) & M, 31) * P1) & M
            v3 = (rotl((v3 + w(off + 16) * P2) & M, 31) * P1) & M
            v4 = (rotl((v4 + w(off + 24) * P2) & M, 31) * P1) & M
            off += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + length) & M
    while off + 8 <= length:
        k1 = (rotl((int.from_bytes(buf[off : off + 8], "little") * P2) & M, 31) * P1) & M
        h ^= k1
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(buf[off : off + 4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < length:
        h ^= (buf[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    return _ref_fmix(h)


def ref_xxh64_long(val: int, seed: int) -> int:
    """Scalar reference for the 8-byte-long path, returns uint64."""
    M = (1 << 64) - 1
    P1, P2, P4, P5 = (int(p) for p in (_P1, _P2, _P4, _P5))

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & M

    h = (seed + P5 + 8) & M
    h ^= (rotl((val & M) * P2 & M, 31) * P1) & M
    h = (rotl(h, 27) * P1 + P4) & M
    return _ref_fmix(h)
