"""Property test: the driver-side xxhash64 twin is BIT-EQUAL to Spark's
``F.xxhash64`` for every type/value shape it claims to support (VERDICT r4
finding #1 — ``lookup()`` routes buckets driver-side only because of this
guarantee; anything the twin declines falls back to the 1-row job)."""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_tools_spark.functions.xxhash import bucket_of, xxhash64

_R = random.Random(0xC0FFEE)


def _fuzz_strings(n):
    alpha = "abc é中\U0001f600xyz0123/._-"
    out = ["", "a", "abcdefg", "abcdefgh", "abcdefghi", "x" * 31, "y" * 32,
           "z" * 33, "w" * 100, "中文" * 20]
    for _ in range(n):
        out.append("".join(_R.choice(alpha) for _ in range(_R.randrange(0, 64))))
    return out


CASES = [
    (T.StringType(), _fuzz_strings(60)),
    (T.BinaryType(), [b"", b"\x00", bytes(range(256)),
                      *(bytes(_R.randrange(256) for _ in range(_R.randrange(0, 70)))
                        for _ in range(40))]),
    (T.LongType(), [0, 1, -1, 42, 2**63 - 1, -(2**63),
                    *(_R.randrange(-(2**63), 2**63) for _ in range(40))]),
    (T.IntegerType(), [0, 1, -1, 2**31 - 1, -(2**31),
                       *(_R.randrange(-(2**31), 2**31) for _ in range(40))]),
    (T.ShortType(), [0, -1, 32767, -32768, *(_R.randrange(-32768, 32768) for _ in range(20))]),
    (T.ByteType(), list(range(-128, 128, 7))),
    (T.BooleanType(), [True, False]),
    (T.DoubleType(), [0.0, -0.0, 1.5, -2.25, 1e300, -1e-300, 3.141592653589793,
                      float("inf"), float("-inf"),
                      *(_R.uniform(-1e6, 1e6) for _ in range(30))]),
    (T.FloatType(), [0.0, -0.0, 1.5, -2.25, *( _R.uniform(-1e3, 1e3) for _ in range(30))]),
    (T.DateType(), [datetime.date(1970, 1, 1), datetime.date(1969, 12, 31),
                    datetime.date(2026, 8, 17), datetime.date(1900, 2, 28),
                    datetime.date(2200, 12, 31)]),
    (T.TimestampNTZType(), [datetime.datetime(1970, 1, 1),
                            datetime.datetime(2026, 8, 17, 12, 34, 56, 789012),
                            datetime.datetime(1955, 11, 5, 6, 0, 0, 1)]),
]


@pytest.mark.parametrize("dtype,values", CASES, ids=lambda c: str(c) if isinstance(c, T.DataType) else None)
def test_single_column_bit_equal(spark, dtype, values):
    schema = T.StructType([T.StructField("v", dtype)])
    df = spark.createDataFrame([(v,) for v in values], schema=schema)
    got_spark = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    got_twin = [xxhash64([v], [dtype]) for v in values]
    assert got_twin == got_spark


def test_multi_column_chaining_and_nulls(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.LongType()),
            T.StructField("c", T.StringType()),
        ]
    )
    rows = [
        ("repo/x", 17, "src/main.py"),
        (None, 17, "src/main.py"),  # null column skipped, not zero-hashed
        ("repo/x", None, None),
        (None, None, None),  # all-null row hashes to the seed
        ("", 0, ""),
    ]
    df = spark.createDataFrame(rows, schema=schema)
    got_spark = [r["h"] for r in df.select(F.xxhash64("a", "b", "c").alias("h")).collect()]
    dtypes = [f.dataType for f in schema.fields]
    got_twin = [xxhash64(list(r), dtypes) for r in rows]
    assert got_twin == got_spark


def test_bucket_of_matches_pmod(spark):
    vals = [("r", "p"), ("a/b", "c.py"), ("", ""), ("x" * 50, "y" * 40)]
    dtypes = [T.StringType(), T.StringType()]
    df = spark.createDataFrame(vals, schema="k1 string, k2 string")
    for nb in (8, 16, 131_072):
        got_spark = [
            r["b"]
            for r in df.select(
                F.pmod(F.xxhash64("k1", "k2"), F.lit(nb)).cast("int").alias("b")
            ).collect()
        ]
        got_twin = [bucket_of(list(v), dtypes, nb) for v in vals]
        assert got_twin == got_spark


def test_nan_payloads_canonicalize_like_spark(spark):
    """Spark hashes every NaN payload as the canonical NaN bits; the twin
    must do the same (a payload NaN packed as-is would mis-route buckets)."""
    import struct

    weird = struct.unpack("<d", struct.pack("<Q", 0x7FF8_0000_00BE_EF00))[0]
    for dtype, values in (
        (T.DoubleType(), [float("nan"), weird]),
        (T.FloatType(), [float("nan"), weird]),
    ):
        schema = T.StructType([T.StructField("v", dtype)])
        df = spark.createDataFrame([(v,) for v in values], schema=schema)
        got_spark = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
        got_twin = [xxhash64([v], [dtype]) for v in values]
        assert got_twin == got_spark
        assert len(set(got_spark)) == 1  # all NaNs hash identically


def test_unsupported_shapes_decline_not_lie():
    # wrong python type for the column, out-of-range ints, exotic types:
    # the twin must return None (fallback to the Spark job), never a guess
    assert xxhash64([3], [T.StringType()]) is None
    assert xxhash64(["x"], [T.LongType()]) is None
    assert xxhash64([2**40], [T.IntegerType()]) is None
    assert xxhash64([True], [T.IntegerType()]) is None
    assert xxhash64([1.5], [T.DecimalType(10, 2)]) is None
    assert bucket_of([None, 3], [T.StringType(), T.StringType()], 8) is None
    # but an all-supported row with a null passes through
    assert bucket_of([None, "p"], [T.StringType(), T.StringType()], 8) is not None
