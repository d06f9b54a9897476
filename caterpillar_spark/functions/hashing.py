"""Driver-side XXH64 identical to Spark's ``F.xxhash64``.

Term-bucket partition pruning needs ``pmod(xxhash64(term), num_buckets)``
for a handful of query terms.  Computing that with a Spark job (a
1-row-per-term DataFrame + collect, the r1/r2 shape) costs a full
job-scheduling round trip per query before any real work starts; the
terms are driver-side literals, so the hash should be too.

This is the standard XXH64 algorithm (Collet's xxHash, public spec)
over the UTF-8 bytes with Spark's fixed seed 42 — Spark's
``XxHash64`` expression is a faithful XXH64 and the parity is pinned
test-side against ``F.xxhash64`` over ASCII, multi-byte UTF-8 and all
tail lengths 0..40 (tests/test_functions.py).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` -> unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64(value: str, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(string_col)`` as a driver-side scalar: XXH64 of the
    UTF-8 bytes at seed 42, returned SIGNED (Spark longs are signed;
    ``spark_xxhash64(t) % nb`` in Python equals Spark's
    ``pmod(xxhash64(t), nb)`` because Python's ``%`` is non-negative
    for a positive modulus)."""
    h = xxh64(value.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
