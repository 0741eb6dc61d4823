"""Avro *binary* codec as Arrow-batched pandas UDFs (P7 sandbox path).

Production uses the spark-avro jar (``to_avro``/``from_avro`` — JVM,
codegen); this sandbox ships no such jar, so the codec itself is
implemented here against the Avro 1.11 binary spec: zigzag-varint
ints/longs, length-prefixed UTF-8/bytes, little-endian IEEE float/double,
union-index-prefixed nullables, and the logical types the reference's
type table uses (decimal → big-endian two's-complement unscaled bytes,
date → int days, timestamp-micros → long) — the encode/decode pair the
reference implements per SQL type in AvroTableTypeConverter.cs (encode
:35-92, decode :37-82), minus its lossy decimal→double (:63).

Spark boundary rules: one pandas UDF per encode/decode, Arrow batch in →
Arrow batch out, zero per-row Python crossings. This is deliberately the
slow path — it exists for bus interop, never inside the merge hot path.
"""

from __future__ import annotations

import datetime
import decimal
import io
import struct as _struct

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from cdc_tools_spark.functions.avro_schema import avro_to_struct_type

# -- primitive writers/readers (Avro 1.11 binary encoding) ------------------


def _write_varint(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)  # zigzag64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


_EPOCH_DATE = datetime.date(1970, 1, 1)


def _encode_value(out: io.BytesIO, v, at) -> None:
    if isinstance(at, list):  # nullable union ["null", T]
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            _write_varint(out, 0)
            return
        _write_varint(out, 1)
        _encode_value(out, v, at[1])
        return
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "decimal":
            unscaled = int(
                decimal.Decimal(v).scaleb(at["scale"]).to_integral_value()
            )
            raw = unscaled.to_bytes((unscaled.bit_length() + 8) // 8 or 1, "big", signed=True)
            _write_varint(out, len(raw))
            out.write(raw)
            return
        if lt == "date":
            # datetime.datetime (and pd.Timestamp) are SUBCLASSES of
            # datetime.date, so the check must be "is a datetime → take its
            # .date()", never "has .date() and is not a date" — the latter
            # is dead for datetimes and breaks the day arithmetic (ADVICE r2)
            d = v.date() if isinstance(v, datetime.datetime) else v
            _write_varint(out, (d - _EPOCH_DATE).days)
            return
        if lt == "timestamp-micros":
            ts = pd.Timestamp(v)
            _write_varint(out, ts.value // 1000)  # ns → µs
            return
        if at["type"] == "record":
            for f in at["fields"]:
                fv = v.get(f["name"]) if isinstance(v, dict) else v[f["name"]]
                _encode_value(out, fv, f["type"])
            return
        if at["type"] == "array":
            if len(v):
                _write_varint(out, len(v))
                for item in v:
                    _encode_value(out, item, at["items"])
            _write_varint(out, 0)
            return
        at = at["type"]  # {"type": "string"} style wrapper
    if at == "string":
        raw = str(v).encode("utf-8")
        _write_varint(out, len(raw))
        out.write(raw)
    elif at in ("int", "long"):
        _write_varint(out, int(v))
    elif at == "bytes":
        raw = bytes(v)
        _write_varint(out, len(raw))
        out.write(raw)
    elif at == "double":
        out.write(_struct.pack("<d", float(v)))
    elif at == "float":
        out.write(_struct.pack("<f", float(v)))
    elif at == "boolean":
        out.write(b"\x01" if v else b"\x00")
    else:
        raise ValueError(f"unsupported avro type {at!r}")


def _decode_value(buf: io.BytesIO, at):
    if isinstance(at, list):
        return None if _read_varint(buf) == 0 else _decode_value(buf, at[1])
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "decimal":
            raw = buf.read(_read_varint(buf))
            unscaled = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-at["scale"])
        if lt == "date":
            return _EPOCH_DATE + datetime.timedelta(days=_read_varint(buf))
        if lt == "timestamp-micros":
            return pd.Timestamp(_read_varint(buf) * 1000)
        if at["type"] == "record":
            return {f["name"]: _decode_value(buf, f["type"]) for f in at["fields"]}
        if at["type"] == "array":
            out = []
            while True:
                n = _read_varint(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    _read_varint(buf)
                    n = -n
                out.extend(_decode_value(buf, at["items"]) for _ in range(n))
        at = at["type"]
    if at == "string":
        return buf.read(_read_varint(buf)).decode("utf-8")
    if at in ("int", "long"):
        return _read_varint(buf)
    if at == "bytes":
        return bytes(buf.read(_read_varint(buf)))
    if at == "double":
        return _struct.unpack("<d", buf.read(8))[0]
    if at == "float":
        return _struct.unpack("<f", buf.read(4))[0]
    if at == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"unsupported avro type {at!r}")


def encode_record(row: dict, schema: dict) -> bytes:
    out = io.BytesIO()
    for f in schema["fields"]:
        _encode_value(out, row.get(f["name"]), f["type"])
    return out.getvalue()


def decode_record(raw: bytes, schema: dict) -> dict:
    buf = io.BytesIO(raw)
    return {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}


# -- Spark surface -----------------------------------------------------------


def avro_encode(col: Column | str, schema: dict) -> Column:
    """struct column → Avro-binary column (Arrow-batched pandas UDF)."""

    @pandas_udf(T.BinaryType())
    def _enc(pdf: pd.DataFrame) -> pd.Series:
        rows = pdf.to_dict("records")
        return pd.Series([encode_record(r, schema) for r in rows])

    return _enc(F.col(col) if isinstance(col, str) else col)


def avro_decode(col: Column | str, schema: dict) -> Column:
    """Avro-binary column → struct column typed from the Avro schema
    (all record fields, envelope included if the schema carries one)."""
    spark_type = avro_to_struct_type(schema, envelope=False)

    @pandas_udf(spark_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([decode_record(bytes(b), schema) for b in s])

    return _dec(F.col(col) if isinstance(col, str) else col)
