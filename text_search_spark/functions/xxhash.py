"""Pure-Python XXH64 matching Spark's `xxhash64` expression (seed 42).

Implements the public XXH64 specification (Yann Collet,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). Spark's
Catalyst XxHash64 applies XXH64 to a string's UTF-8 bytes and to a long's
8-byte little-endian representation, default seed 42. Having it in Python
lets the query planner compute term_bucket / shard partition pruning keys
WITHOUT launching a Spark job per query. Verified bit-identical against
Spark in tests/test_xxhash.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            (l1, l2, l3, l4) = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, l1)
            v2 = _round(v2, l2)
            v3 = _round(v3, l3)
            v4 = _round(v4, l4)
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark-compatible signed result for a string column."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = 42) -> int:
    """Spark-compatible signed result for a long column."""
    return _to_signed(xxh64(struct.pack("<q", v), seed))


def pmod(x: int, m: int) -> int:
    """Spark pmod semantics (non-negative result)."""
    r = x % m
    return r + m if r < 0 else r


def xxhash64_long_vec(v, seed: int = 42):
    """Vectorized XXH64 of an int64 numpy array (8-byte little-endian input
    path of the spec), bit-identical to Spark's `xxhash64(long_col)` —
    pinned against both the scalar xxhash64_long and Spark itself in
    tests/test_xxhash.py. Lets Arrow UDFs recompute a doc-sharding key
    from doc_id instead of shipping it as a column through the shuffle
    and the JVM->Python pipe. Returns signed int64."""
    import numpy as np

    x = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    p1 = np.uint64(_P1)
    p2 = np.uint64(_P2)
    p3 = np.uint64(_P3)
    p4 = np.uint64(_P4)

    def rotl(a, r):
        return (a << np.uint64(r)) | (a >> np.uint64(64 - r))

    with np.errstate(over="ignore"):
        k1 = rotl(x * p2, 31) * p1
        h = np.uint64((seed + _P5 + 8) & _MASK) ^ k1
        h = rotl(h, 27) * p1 + p4
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= p3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)
