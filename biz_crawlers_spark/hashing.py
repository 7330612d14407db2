"""Pure-Python xxHash64 bit-compatible with Spark's ``F.xxhash64``.

The frontier key is ``xxhash64(canonical_url)`` (BASELINE.json north_rule).
Inside Spark we always use the built-in JVM expression ``F.xxhash64`` —
this module exists so that the *pure-Python reference simulator* and the
fixture golden files can compute the identical key without a JVM, which is
what makes crawl-order / seen-set parity checks byte-exact.

Algorithm: xxHash64 (Yann Collet, public domain, github.com/Cyan4973/xxHash),
the same algorithm Spark implements in
``org.apache.spark.sql.catalyst.expressions.XXH64``. Spark hashes the UTF-8
bytes of a string column with seed 42; ``spark_xxhash64`` reproduces that
including the signed-int64 wraparound. Verified bit-exact against
``F.xxhash64`` in tests/test_hashing.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42  # Spark's fixed seed for xxhash64(col) with no explicit seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxhash64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit xxHash64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            w1, w2, w3, w4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, w1)
            v2 = _round(v2, w2)
            v3 = _round(v3, w3)
            v4 = _round(v4, w4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M

    h = (h + n) & _M
    while i + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, w)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * _P1) & _M
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


def to_signed64(h: int) -> int:
    """Fold an unsigned 64-bit value into Spark's signed LongType range."""
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(s: str | bytes, seed: int = SPARK_SEED) -> int:
    """Signed int64 equal to Spark's ``F.xxhash64(lit(s))`` for strings/binary."""
    data = s.encode("utf-8") if isinstance(s, str) else s
    return to_signed64(xxhash64(data, seed))
