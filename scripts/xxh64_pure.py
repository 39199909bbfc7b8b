"""Pure-Python XXH64 matching Spark's `xxhash64` SQL function.

Written from the public xxHash specification (Yann Collet,
github.com/Cyan4973/xxHash — BSD). Used ONLY to generate independent
literal oracles for the seeded dedup/ANN suite queries (the driver's
DuckDB gate cannot express xxhash64) and by a parity pytest.

Spark semantics replicated:
* ``xxhash64(str_col)``          → XXH64(utf8_bytes, seed=42)
* ``xxhash64(str_col, lit(p))``  → children fold left-to-right, each
  child's hash seeding the next: hashInt(p, hashString(s, 42)) for an
  int literal p, hashLong for a long. Spark hashes an int as its
  4-byte LE block and a long as its 8-byte LE block through the same
  XXH64 tail path (verified bit-for-bit against Spark 4.1 in
  tests/test_oracle_refimpl.py).
* results are signed int64 (two's complement).
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of a byte string."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1); h = _merge(h, v2); h = _merge(h, v3); h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
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


def _to_i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark xxhash64(string_col) — signed."""
    return _to_i64(xxh64(s.encode("utf-8"), seed))


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the int's 4-byte LE block (unsigned out)."""
    return xxh64((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the long's 8-byte LE block (unsigned out)."""
    return xxh64((value & _M).to_bytes(8, "little"), seed)


def spark_xxhash64_str_intseed(s: str, p: int) -> int:
    """Spark xxhash64(string_col, lit(int p)) — signed."""
    return _to_i64(hash_int(p, xxh64(s.encode("utf-8"), 42)))


def spark_xxhash64_long_intseed(v: int, p: int) -> int:
    """Spark xxhash64(long_col, lit(int p)) — signed."""
    return _to_i64(hash_int(p, hash_long(v, 42)))
