"""Changelog publisher — one entry point, two sinks (VERDICT r3 #4/#5).

The reference's producer processes (KeyedJsonProducer.cs:32-48,
NonKeyedJsonProducer.cs, and the Avro twins) serialize each change and hand
it to a Kafka producer configured with bootstrap servers + topic + acks.
Spark-native equivalent: serialize with the JVM-side codecs
(:mod:`cdc_tools_spark.bus.json_codec` / ``avro_bus``) and either

* ``sink="file"`` — append to a :class:`~cdc_tools_spark.bus.FileTopic`
  (the in-sandbox bus with Kafka's two load-bearing properties: keyed
  partitioning and dense per-partition offsets), or
* ``sink="kafka"`` — ``df.write.format("kafka")`` with options symmetric
  to the consume side's
  :func:`cdc_tools_spark.streaming.tail.kafka_source_options` (requires
  the spark-sql-kafka package on a real cluster; the sandbox has no
  broker, so tests exercise the wire frame + options construction and the
  decode round trip, not a live produce).

The Kafka sink shape is exactly what ``format("kafka")`` consumes: a
``key``/``value`` pair (string or binary — the sink casts strings); keyed
publishing preserves per-key order because Kafka's default partitioner
routes by key hash, the same guarantee FileTopic implements explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from cdc_tools_spark.bus.avro_bus import serialize_changelog_avro
from cdc_tools_spark.bus.json_codec import serialize_changelog
from cdc_tools_spark.sources.binlog import KEY_COLS


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    acks: str = "all",
    idempotent: bool = True,
    compression: str | None = None,
) -> dict[str, str]:
    """Options for ``df.write.format("kafka")`` — the produce-side twin of
    :func:`~cdc_tools_spark.streaming.tail.kafka_source_options`
    (KeyedJsonProducer.cs:32-48: bootstrap servers + topic + delivery
    guarantees). ``acks=all`` + idempotence is the reference's effective
    at-least-once-no-reorder producer contract; downstream exactly-once
    still lives in the idempotent merge + commit log, so duplicate
    deliveries are harmless."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.acks": acks,
        "kafka.enable.idempotence": "true" if idempotent else "false",
    }
    if compression:
        opts["kafka.compression.type"] = compression
    return opts


def changelog_messages(
    df: DataFrame,
    codec: str = "json",
    keyed: bool = True,
    key_cols: Sequence[str] = KEY_COLS,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Changelog → ``(key, value)`` wire messages under the chosen codec —
    the 4 producer variants (keyed/non-keyed × JSON/Avro) behind one
    switch."""
    if codec == "json":
        return serialize_changelog(df, key_cols, carry_cols, keyed)
    if codec == "avro":
        return serialize_changelog_avro(df, key_cols, carry_cols, keyed)
    raise ValueError(f"unknown codec: {codec!r} (expected 'json' or 'avro')")


def publish_changelog(
    df: DataFrame,
    sink: str = "file",
    codec: str = "json",
    keyed: bool = True,
    key_cols: Sequence[str] = KEY_COLS,
    order_cols: Sequence[str] = ("lsn", "seqval"),
    # file sink
    topic_root: str | None = None,
    n_partitions: int = 8,
    partitioner: str = "md5",
    # kafka sink
    bootstrap_servers: str | None = None,
    topic: str | None = None,
    sink_options: dict[str, str] | None = None,
    execute: bool = True,
):
    """Publish a changelog batch.

    ``sink="file"`` appends to the FileTopic at ``topic_root`` (offsets
    ordered by ``order_cols`` within the batch) and returns the message
    count. ``sink="kafka"`` builds the ``write.format("kafka")`` writer
    from ``bootstrap_servers``/``topic`` (+ ``sink_options`` overrides);
    with ``execute=False`` it returns the configured ``DataFrameWriter``
    without producing — the seam tests (and dry runs) use, since this
    sandbox has no broker. Kafka assigns offsets itself, so ``order_cols``
    only matter for the file sink; per-key order comes from keyed
    partitioning on either sink."""
    if sink == "file":
        from cdc_tools_spark.bus.file_topic import FileTopic

        if topic_root is None:
            raise ValueError("sink='file' requires topic_root")
        msgs = changelog_messages(df, codec, keyed, key_cols, tuple(order_cols))
        t = FileTopic(
            df.sparkSession,
            topic_root,
            n_partitions=n_partitions,
            partitioner=partitioner,
            value_type="binary" if codec == "avro" else "string",
        )
        return t.append(msgs, tuple(order_cols))
    if sink == "kafka":
        if not (bootstrap_servers and topic):
            raise ValueError("sink='kafka' requires bootstrap_servers and topic")
        msgs = changelog_messages(df, codec, keyed, key_cols)
        opts = kafka_sink_options(bootstrap_servers, topic)
        opts.update(sink_options or {})
        writer = msgs.select("key", "value").write.format("kafka").options(**opts)
        if not execute:
            return writer
        writer.save()
        return None
    raise ValueError(f"unknown sink: {sink!r} (expected 'file' or 'kafka')")
