"""Keyed JSON changelog codec (K1 + P6).

The reference publishes each change as a Kafka message keyed by the
flattened ChangeKey with a JSON envelope value
``{ChangeType, Data, ChangeKey, Lsn, SeqVal}``
(KeyedJsonProducer.cs:32-48, ProducerBase.cs:18-28) and the consumer
deserializes it back into a RowChange (KeyedJsonConsumer.cs:144-152).

Spark-native equivalent: ``to_json(struct(...))`` / ``from_json`` — JVM-side
codegen JSON codecs, zero Python. The envelope carries the ordering meta
``(lsn, seqval, change_type, change_key)`` at the top level and the payload
columns under ``data`` (the reference's column-name→value dictionary), so a
consumer can route/compact on meta without parsing the payload.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from cdc_tools_spark.functions.hashing import change_key
from cdc_tools_spark.sources.binlog import KEY_COLS, META_COLS


def serialize_changelog(
    df: DataFrame,
    key_cols: Sequence[str] = KEY_COLS,
    carry_cols: Sequence[str] = (),
    keyed: bool = True,
) -> DataFrame:
    """Changelog → keyed messages ``(key string, value string)``.

    ``key`` is the flattened ChangeKey (same-key messages land on one topic
    partition, preserving per-key order — the reference's keyed-producer
    guarantee); ``value`` is the JSON envelope. ``carry_cols`` rides extra
    columns alongside (e.g. ``("lsn", "seqval")`` for the topic's offset
    ordering) — they are not part of the message.

    ``keyed=False`` is the reference's non-keyed producer twin
    (NonKeyedJsonProducer.cs — identical but for the ``Null`` key type):
    key is null, the topic spreads messages by value hash, and no per-key
    ordering is guaranteed — compaction downstream must rely on the
    envelope's ``(lsn, seqval)``, which the ordered merge does anyway."""
    payload_cols = [c for c in df.columns if c not in META_COLS]
    envelope = F.struct(
        F.col("lsn"),
        F.col("seqval"),
        F.col("change_type"),
        change_key(*key_cols).alias("change_key"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("data"),
    )
    key = change_key(*key_cols) if keyed else F.lit(None).cast("string")
    return df.select(
        key.alias("key"),
        F.to_json(envelope).alias("value"),
        *[F.col(c) for c in carry_cols],
    )


def changelog_value_schema(payload_schema: T.StructType) -> T.StructType:
    """The envelope schema a consumer needs for ``from_json`` decode."""
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), True),
            T.StructField("seqval", T.LongType(), True),
            T.StructField("change_type", T.IntegerType(), True),
            T.StructField("change_key", T.StringType(), True),
            T.StructField("data", payload_schema, True),
        ]
    )


def deserialize_changelog(
    df: DataFrame, payload_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Keyed messages → changelog rows (the KeyedJsonConsumer decode path).

    Restores the F2 changelog shape ``(lsn, seqval, change_type, payload...)``
    — a publish→consume round trip is the identity on the changelog."""
    v = F.from_json(F.col(value_col), changelog_value_schema(payload_schema))
    return df.select(
        v["lsn"].alias("lsn"),
        v["seqval"].alias("seqval"),
        v["change_type"].alias("change_type"),
        *[v["data"][f.name].alias(f.name) for f in payload_schema.fields],
    )
