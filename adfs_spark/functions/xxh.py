"""Pure-Python xxHash64 — bit-identical to Spark's ``F.xxhash64``.

The engine's pk-hash bucket layout (`storage.KBUCKET_COL`) keys on
``pmod(xxhash64(concat_ws(US, pk_strings)), num_buckets)``.  Point
reads need each requested key's bucket *on the driver* to prune the
parquet partition filter; computing it through Spark costs a whole
keys-sized job per lookup call — the dominant term of an open/close
style metadata read (one extra job ≈ 0.2 s regardless of |keys|).
This module replicates the hash driver-side so the bucket set is pure
Python arithmetic.

xxHash64 is a public, fully-specified algorithm (Yann Collet's
xxHash, BSD); Spark pins seed 42 and hashes the UTF-8 bytes of the
string operand.  Parity is enforced by ``tests/test_xxh.py``, which
compares against ``F.xxhash64`` on adversarial and random inputs —
every length class (empty / <4 / <8 / <32 / stripes+tails) plus
multi-byte UTF-8.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

#: Spark's fixed seed for ``xxhash64`` / shuffle hashing.
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit xxHash64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
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


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed value of ``F.xxhash64(string_col)`` for ``s``."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def _spark_string_cast(v: object) -> str | None:
    """``CAST(v AS STRING)`` for the value types we replicate exactly:
    str identity, bool → true/false, int → decimal repr.  Returns None
    for anything else (floats, dates, decimals — their Spark string
    forms have formatting subtleties; callers fall back to a Spark
    job)."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    return None


def kbucket_of(values: tuple, num_buckets: int) -> int | None:
    """Driver-side ``pmod(xxhash64(concat_ws(US, *pk_strings)), n)`` —
    the bucket id of one pk tuple, or None when a value's string cast
    isn't replicable (caller must fall back to computing buckets with
    a Spark job).  NULL pk components also return None: ``concat_ws``
    *skips* nulls (no separator), a semantic we refuse to depend on
    for key hashing."""
    parts = []
    for v in values:
        if v is None:
            return None
        s = _spark_string_cast(v)
        if s is None:
            return None
        parts.append(s)
    h = spark_xxhash64_str("\x1f".join(parts))
    return h % num_buckets  # Python % is already pmod for positive n
