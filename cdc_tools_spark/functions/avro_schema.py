"""Avro schema generation + envelope typing (P7/P8).

Spark-native counterpart of the reference's SQL-type→Avro generator
(AvroSchemaGenerator.cs:10-96): given the payload ``StructType``, emit the
Avro record the keyed Avro producer would register, with the same four
envelope fields (Lsn/SeqVal as string, ChangeKey string, ChangeType int —
AvroSchemaGenerator.cs:19-37) followed by the payload columns in ordinal
order (:43 ``OrderBy(OrdinalPosition)`` ≡ StructType field order).

Logical-type table (AvroSchemaGenerator.cs:45-88), mapped from Spark types:

=================  =======================================  ===============
Spark type         Avro                                     reference case
=================  =======================================  ===============
StringType         string                                   varchar/nchar/…
LongType           long                                     bigint
Byte/Short/Int     int                                      tinyint/…/int
BinaryType         bytes                                    binary/image
DecimalType(p,s)   bytes + logical decimal(p,s)             decimal
DateType           int + logical date                       date
TimestampType      long + logical timestamp-micros          datetime2
FloatType          float                                    (Spark-only)
DoubleType         double                                   (Spark-only)
BooleanType        boolean                                  (Spark-only)
=================  =======================================  ===============

Deliberate deviations (SURVEY §1.2): decimal keeps the lossless
bytes+logical-decimal form everywhere (the reference's SqlToAvro path is
faithful; its consumer decode path lossily rounds decimal→double,
AvroTableTypeConverter.cs:63 — we do not reproduce that); ``datetime``'s
millis vs ``datetime2``'s micros collapse to micros (Spark has one
timestamp type).

The binary Avro codec itself (``to_avro``/``from_avro``) requires the
spark-avro jar, which this sandbox does not ship; :func:`avro_codec_available`
gates that path and tests skip when absent. Schema generation, round-trip
typing, and consumer-side schema-change detection
(:func:`schema_fingerprint`, the KeyedAvroConsumer.cs:139-142 analog) are
fully exercised without it.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import types as T

_ENVELOPE_FIELDS = [
    {"name": "lsn", "type": "string"},
    {"name": "seqval", "type": "string"},
    {"name": "change_key", "type": "string"},
    {"name": "change_type", "type": "int"},
]

_SIMPLE = {
    "string": "string",
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "binary": "bytes",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
}


def _avro_type(dt: T.DataType) -> dict | str:
    name = dt.typeName()
    if name in _SIMPLE:
        return _SIMPLE[name]
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": f"nested_{abs(hash(dt.json())) % 10**8}",
            "fields": [_field(f) for f in dt.fields],
        }
    raise ValueError(f"no Avro mapping for Spark type {dt}")


def _field(f: T.StructField) -> dict:
    at = _avro_type(f.dataType)
    return {"name": f.name, "type": ["null", at] if f.nullable else at}


def generate_avro_schema(
    payload_schema: T.StructType,
    name: str = "repo_files",
    namespace: str = "cdc_tools_spark",
    envelope: bool = True,
) -> dict:
    """Avro record schema for the change message (dict; ``json.dumps`` it
    for a schema registry / ``to_avro`` jsonFormatSchema)."""
    fields = list(_ENVELOPE_FIELDS) if envelope else []
    fields += [_field(f) for f in payload_schema.fields]
    return {
        "namespace": namespace,
        "name": name,
        "type": "record",
        "fields": fields,
    }


_FROM_AVRO = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "bytes": T.BinaryType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _spark_type(at) -> T.DataType:
    if isinstance(at, list):  # ["null", T] union
        non_null = [x for x in at if x != "null"]
        return _spark_type(non_null[0])
    if isinstance(at, str):
        return _FROM_AVRO[at]
    lt = at.get("logicalType")
    if lt == "decimal":
        return T.DecimalType(at["precision"], at["scale"])
    if lt == "date":
        return T.DateType()
    if lt in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType()
    if at["type"] == "array":
        return T.ArrayType(_spark_type(at["items"]))
    if at["type"] == "record":
        return T.StructType(
            [
                T.StructField(f["name"], _spark_type(f["type"]), isinstance(f["type"], list))
                for f in at["fields"]
            ]
        )
    return _FROM_AVRO[at["type"]]


def avro_to_struct_type(schema: dict, envelope: bool = True) -> T.StructType:
    """Inverse mapping: Avro record → payload StructType (consumer side).
    ``envelope=True`` skips the four meta fields."""
    fields = schema["fields"][4:] if envelope else schema["fields"]
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), isinstance(f["type"], list))
            for f in fields
        ]
    )


def schema_fingerprint(schema: dict) -> str:
    """Stable fingerprint for consumer-side schema-change detection — the
    reference consumer compares message schema versions and re-resolves the
    column map on change (KeyedAvroConsumer.cs:139-142); here a changed
    fingerprint tells the sink to run schema evolution before the merge."""
    return hashlib.sha256(
        json.dumps(schema, sort_keys=True).encode("utf-8")
    ).hexdigest()


def avro_codec_available(spark) -> bool:
    """True iff the spark-avro jar is on the classpath (to_avro/from_avro)."""
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        jvm_class = spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return jvm_class is not None
    except Exception:
        return False
