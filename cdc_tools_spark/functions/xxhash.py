"""Driver-side twin of Spark's ``xxhash64`` expression.

``ParquetMergeTable.lookup`` must route a key to its bucket with EXACTLY the
hash the writers used (``pmod(xxhash64(key_cols), num_buckets)``). Running a
1-row Spark job per probe answers that correctly but costs ~100 ms of job
overhead — at point-lookup QPS the scheduling dominates a read that is
otherwise one bucket + bloom-skipped row groups (VERDICT r4 finding #1). This
module computes the same 64-bit value on the driver in microseconds.

The algorithm is public: xxHash (XXH64) by Yann Collet
(https://github.com/Cyan4973/xxHash, BSD-2), seeded with 42 and applied
per-column with hash chaining (each column's hash seeds the next, nulls
skipped) exactly as Spark's ``XxHash64`` expression documents. Per-type input
framing follows the Spark SQL semantics: integral types ≤32 bits hash as a
4-byte int, longs/timestamps as an 8-byte word, floats/doubles as their IEEE
bit patterns (−0.0 normalized to 0.0), strings as UTF-8 bytes, booleans as
int 1/0, dates as the epoch-day int.

Bit-equality against ``F.xxhash64`` is property-tested per type in
``tests/test_xxhash_twin.py``; :func:`bucket_of` returns ``None`` for any
type or value shape it can't guarantee (the caller falls back to the 1-row
job — correctness never rides the fast path alone).
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SEED = 42  # Spark's XxHash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, word: int) -> int:
    acc = (acc + word * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian word (Spark hashes longs,
    timestamps and double bit-patterns this way)."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte word (ints, shorts, bytes, booleans, dates,
    float bit-patterns)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark's framing for strings/binary:
    8-byte words, then one 4-byte word, then single bytes)."""
    length = len(data)
    n32 = length & ~31
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i < n32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while i + 8 <= length:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)

_INT_RANGES = {
    T.ByteType: (-(1 << 7), (1 << 7) - 1),
    T.ShortType: (-(1 << 15), (1 << 15) - 1),
    T.IntegerType: (-(1 << 31), (1 << 31) - 1),
}


def _hash_one(value, dtype: T.DataType, seed: int) -> int | None:
    """One column's contribution; None = unsupported (caller falls back)."""
    cls = type(dtype)
    if cls in _INT_RANGES:
        if not isinstance(value, int) or isinstance(value, bool):
            return None
        lo, hi = _INT_RANGES[cls]
        if not lo <= value <= hi:
            return None
        return hash_int(value, seed)
    if cls is T.LongType:
        if not isinstance(value, int) or isinstance(value, bool):
            return None
        if not -(1 << 63) <= value < (1 << 63):
            return None
        return hash_long(value, seed)
    if cls is T.StringType:
        if not isinstance(value, str):
            return None
        return hash_bytes(value.encode("utf-8"), seed)
    if cls is T.BinaryType:
        if not isinstance(value, (bytes, bytearray)):
            return None
        return hash_bytes(bytes(value), seed)
    if cls is T.BooleanType:
        if not isinstance(value, bool):
            return None
        return hash_int(1 if value else 0, seed)
    if cls is T.DoubleType:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        import math
        import struct

        d = float(value)
        if math.isnan(d):
            # Spark canonicalizes EVERY NaN payload to Double.NaN bits
            # before hashing; a payload NaN packed as-is would mis-route
            return hash_long(0x7FF8000000000000, seed)
        if d == 0.0:
            d = 0.0  # −0.0 normalizes to 0.0 before hashing
        return hash_long(struct.unpack("<q", struct.pack("<d", d))[0], seed)
    if cls is T.FloatType:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        import math
        import struct

        if math.isnan(float(value)):
            return hash_int(0x7FC00000, seed)  # canonical Float.NaN bits
        try:
            fl = struct.unpack("<f", struct.pack("<f", float(value)))[0]
        except OverflowError:
            return None
        if fl == 0.0:
            fl = 0.0
        return hash_int(struct.unpack("<i", struct.pack("<f", fl))[0], seed)
    if cls is T.DateType:
        if not isinstance(value, datetime.date) or isinstance(
            value, datetime.datetime
        ):
            return None
        return hash_int((value - _EPOCH_DATE).days, seed)
    if cls is T.TimestampNTZType:
        if not isinstance(value, datetime.datetime) or value.tzinfo is not None:
            return None
        td = value - _EPOCH_TS
        micros = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        return hash_long(micros, seed)
    return None  # timestamps-with-tz, decimals, nested types → Spark job


def xxhash64(values, dtypes, seed: int = SEED) -> int | None:
    """Spark-equivalent ``xxhash64(col1, ..., colN)`` over driver-side
    values: per-column hash chained (previous hash is the next seed), nulls
    skipped. Returns a SIGNED 64-bit int (Spark's LongType convention), or
    None when any column's type/value isn't on the guaranteed-equal list."""
    h = seed
    for value, dtype in zip(values, dtypes):
        if value is None:
            continue  # Spark skips null columns
        nxt = _hash_one(value, dtype, h)
        if nxt is None:
            return None
        h = nxt
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(values, dtypes, num_buckets: int, seed: int = SEED) -> int | None:
    """``pmod(xxhash64(cols), num_buckets)`` — the bucket router's exact
    arithmetic, driver-side. None = fall back to the 1-row Spark job."""
    h = xxhash64(values, dtypes, seed)
    if h is None:
        return None
    return h % num_buckets  # Python % is already the positive mod
