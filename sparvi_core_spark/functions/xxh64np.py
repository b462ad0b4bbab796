"""Vectorized NumPy twin of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(col)`` hashes a string column's UTF-8 bytes with
XXH64 at seed 42 (Catalyst ``XxHash64`` → ``XXH64.hashUnsafeBytes``).
The scoring kernels in ``operators.classify`` / ``operators.selection``
need the SAME bucket ids the JVM featurizer produced at train time
(``pmod(xxhash64(feature), D)``), and this sandbox has no xxhash C
module — so the algorithm is reproduced here over NumPy uint64
lanes, wraparound arithmetic being exactly the modular arithmetic the
reference implementation defines.

Layout contract: callers pass ONE contiguous uint8 buffer plus
per-item (start, length) spans — the shape the span featurizers
produce (every feature is a contiguous byte slice of a canonical
document buffer, so no per-feature Python objects exist anywhere on
the path). Items are grouped by length and each group is hashed with
fully vectorized lane math: every operation in XXH64 depends only on
the byte LENGTH, so a length group is one SIMD-style pass regardless
of item count.

Parity is pinned in tests against ``F.xxhash64`` itself over random
byte/unicode strings of every structural length class (0, 1-3, 4-7,
8-31, 32+, stripe boundaries).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_U64 = np.uint64
_SPARK_SEED = 42


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = _U64(r)
    return (x << rr) | (x >> _U64(64 - r))


def _word(mat: np.ndarray, pos: int) -> np.ndarray:
    """Little-endian uint64 read of 8 bytes at column ``pos`` of a
    (n, L) uint8 matrix."""
    w = mat[:, pos].astype(np.uint64)
    for i in range(1, 8):
        w |= mat[:, pos + i].astype(np.uint64) << _U64(8 * i)
    return w


def _half(mat: np.ndarray, pos: int) -> np.ndarray:
    """Little-endian uint32 read (as uint64) at column ``pos``."""
    w = mat[:, pos].astype(np.uint64)
    for i in range(1, 4):
        w |= mat[:, pos + i].astype(np.uint64) << _U64(8 * i)
    return w


def _xxh64_fixed_len(mat: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of every row of a (n, L) uint8 matrix — one vectorized
    pass; all control flow depends only on L."""
    n, L = mat.shape
    mask = (1 << 64) - 1
    s = _U64(seed & mask)
    if L >= 32:
        # lane seeds in Python ints: scalar uint64 over/underflow warns
        # in NumPy even though the wraparound is the defined arithmetic
        v1 = _U64((seed + int(_P1) + int(_P2)) & mask)
        v2 = _U64((seed + int(_P2)) & mask)
        v3 = _U64(seed & mask)
        v4 = _U64((seed - int(_P1)) & mask)
        acc1 = np.full(n, v1, dtype=np.uint64)
        acc2 = np.full(n, v2, dtype=np.uint64)
        acc3 = np.full(n, v3, dtype=np.uint64)
        acc4 = np.full(n, v4, dtype=np.uint64)
        pos = 0
        while pos + 32 <= L:
            acc1 = _rotl(acc1 + _word(mat, pos) * _P2, 31) * _P1
            acc2 = _rotl(acc2 + _word(mat, pos + 8) * _P2, 31) * _P1
            acc3 = _rotl(acc3 + _word(mat, pos + 16) * _P2, 31) * _P1
            acc4 = _rotl(acc4 + _word(mat, pos + 24) * _P2, 31) * _P1
            pos += 32
        h = (
            _rotl(acc1, 1) + _rotl(acc2, 7) + _rotl(acc3, 12) + _rotl(acc4, 18)
        )
        for acc in (acc1, acc2, acc3, acc4):
            h ^= _rotl(acc * _P2, 31) * _P1
            h = h * _P1 + _P4
    else:
        h = np.full(n, _U64((seed + int(_P5)) & mask), dtype=np.uint64)
        pos = 0
    h = h + _U64(L)
    while pos + 8 <= L:
        k1 = _rotl(_word(mat, pos) * _P2, 31) * _P1
        h = _rotl(h ^ k1, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= L:
        h = _rotl(h ^ (_half(mat, pos) * _P1), 23) * _P2 + _P3
        pos += 4
    while pos < L:
        h = _rotl(h ^ (mat[:, pos].astype(np.uint64) * _P5), 11) * _P1
        pos += 1
    # avalanche
    h ^= h >> _U64(33)
    h *= _P2
    h ^= h >> _U64(29)
    h *= _P3
    h ^= h >> _U64(32)
    return h


def xxh64_spans(
    buf: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    seed: int = _SPARK_SEED,
) -> np.ndarray:
    """XXH64 (Spark seed 42) of each span ``buf[starts[i] :
    starts[i]+lens[i]]`` → int64 array, exactly ``F.xxhash64`` of the
    corresponding string. Spans are grouped by length; each group is
    one vectorized pass."""
    m = len(starts)
    out = np.empty(m, dtype=np.uint64)
    if m == 0:
        return out.view(np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    for L in np.unique(lens):
        sel = np.nonzero(lens == L)[0]
        if L == 0:
            out[sel] = _xxh64_fixed_len(
                np.empty((len(sel), 0), dtype=np.uint8), seed
            )
            continue
        # gather the group's bytes into an (n, L) matrix
        idx = starts[sel][:, None] + np.arange(L, dtype=np.int64)[None, :]
        out[sel] = _xxh64_fixed_len(buf[idx], seed)
    return out.view(np.int64)


def xxh64_bytes(data: bytes, seed: int = _SPARK_SEED) -> int:
    """Scalar convenience (tests / spot checks): XXH64 of one byte
    string, as Spark's signed 64-bit long."""
    buf = np.frombuffer(data, dtype=np.uint8)
    return int(
        xxh64_spans(
            buf,
            np.array([0], dtype=np.int64),
            np.array([len(data)], dtype=np.int64),
            seed,
        )[0]
    )
