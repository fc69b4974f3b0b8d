"""Pure-python XXH64 matching Spark's ``xxhash64`` expression (seed 42).

Why it exists (optimization r6): the query-time bucket pruner needs
``pmod(xxhash64(term), n_buckets)`` for each query term on the DRIVER.
Until round 6 this was computed by a one-off Spark job
(createDataFrame + collect per uncached term batch) — a measurable fixed
cost on every cold query with new terms. XXH64 is a public, fully
specified algorithm (Yann Collet, xxhash.com, BSD); this is a direct
transcription of the 64-bit variant, returning the SIGNED 64-bit value
Spark's expression produces, so ``h % n_buckets`` (python modulo,
non-negative for positive modulus) equals Spark's ``pmod``.

Correctness is pinned by tests/test_xxh64.py: identity vs the JVM
``xxhash64`` on the synthetic vocabulary plus randomized unicode fuzz.
A silent mismatch would prune the WRONG bucket and drop that term's
postings — this is load-bearing, not advisory.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, acc: int) -> int:
    return ((h ^ _round(0, acc)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark ``xxhash64``)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        end = n - 32
        while i <= end:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed XXH64 of a string's UTF-8 bytes (Spark ``xxhash64(col)``)."""
    return xxh64(s.encode("utf-8"), seed)
