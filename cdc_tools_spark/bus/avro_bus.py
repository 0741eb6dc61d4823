"""Keyed/non-keyed **Avro** changelog codec (the K1 Avro producer twins).

The reference's KeyedAvroProducer serializes each change as an Avro record
with envelope fields Lsn/SeqVal (strings), ChangeKey, ChangeType followed
by the payload columns (KeyedAvroProducer.cs:39-55 via
AvroTableTypeConverter.cs:35-92); KeyedAvroConsumer decodes and watches the
schema version for mid-stream evolution (KeyedAvroConsumer.cs:95-159).

Here: the envelope record schema comes from
:func:`cdc_tools_spark.functions.avro_schema.generate_avro_schema` and the
binary codec is the Arrow-batched pandas-UDF implementation in
:mod:`cdc_tools_spark.functions.avro_codec` (spark-avro's ``to_avro`` /
``from_avro`` on clusters that ship the jar). Values are ``binary`` —
pair with ``FileTopic(value_type="binary")``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from cdc_tools_spark.functions.avro_codec import avro_decode, avro_encode
from cdc_tools_spark.functions.avro_schema import generate_avro_schema
from cdc_tools_spark.functions.hashing import change_key
from cdc_tools_spark.sources.binlog import KEY_COLS, META_COLS
from pyspark.sql import types as T


def changelog_avro_schema(payload_schema: T.StructType) -> dict:
    """The on-wire Avro record: envelope (lsn/seqval strings, change_key,
    change_type int — AvroSchemaGenerator.cs:19-37) + payload fields."""
    return generate_avro_schema(payload_schema, name="change_record", envelope=True)


def serialize_changelog_avro(
    df: DataFrame,
    key_cols: Sequence[str] = KEY_COLS,
    carry_cols: Sequence[str] = (),
    keyed: bool = True,
) -> DataFrame:
    """Changelog → ``(key string|null, value binary)`` Avro messages."""
    payload_fields = [f for f in df.schema.fields if f.name not in META_COLS]
    schema = changelog_avro_schema(T.StructType(payload_fields))
    record = F.struct(
        F.col("lsn").cast("string").alias("lsn"),
        F.col("seqval").cast("string").alias("seqval"),
        change_key(*key_cols).alias("change_key"),
        F.col("change_type").cast("int").alias("change_type"),
        *[F.col(f.name) for f in payload_fields],
    )
    key = change_key(*key_cols) if keyed else F.lit(None).cast("string")
    return df.select(
        key.alias("key"),
        avro_encode(record, schema).alias("value"),
        *[F.col(c) for c in carry_cols],
    )


def deserialize_changelog_avro(
    df: DataFrame, payload_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Avro messages → changelog rows (KeyedAvroConsumer decode path);
    envelope lsn/seqval strings restored to longs."""
    schema = changelog_avro_schema(payload_schema)
    rec = avro_decode(F.col(value_col), schema)
    return df.select(rec.alias("_r")).select(
        F.col("_r.lsn").cast("long").alias("lsn"),
        F.col("_r.seqval").cast("long").alias("seqval"),
        F.col("_r.change_type").alias("change_type"),
        *[F.col(f"_r.{f.name}").alias(f.name) for f in payload_schema.fields],
    )
