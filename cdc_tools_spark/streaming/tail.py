"""Structured Streaming tail: continuous binlog → lake merge.

The Spark-native form of the reference's consumer/writer thread pair
(KeyedJsonConsumer.cs:88-144 + RedshiftWriter.cs:28-63): ``readStream`` over
the append-only binlog directory (the sandbox stand-in for the Kafka source
S9 — swap for ``format("kafka")`` + ``from_json``/``from_avro`` on a real
bus), then ``foreachBatch``: compact → newer-wins MERGE → commit marker.

The hand-rolled windowing (WindowMs OR WindowItems, RedshiftWriter.cs:52-61)
becomes the trigger + ``maxFilesPerTrigger``; the bounded-buffer backpressure
becomes the trigger's batch sizing; per-key apply order is guaranteed not by
partition ordering but by the **ordered merge** (the lake table stores
``(lsn, seqval)`` per row and keeps the newer tuple), so late or reordered
micro-batches converge to the same final state as an in-order replay.

Exactly-once: Spark's streaming checkpoint gives each source file to exactly
one micro-batch; our merge is idempotent per batch and the commit log keyed
by ``batch_id`` records metrics — a replayed ``foreachBatch`` (after driver
crash) re-merges harmlessly, same argument as the batch pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cdc_tools_spark.lake.parquet_merge import META_COLS, ParquetMergeTable

from cdc_tools_spark.sources.binlog import BINLOG_SCHEMA
from cdc_tools_spark.state.commit_log import CommitLog, EpochCommit


@dataclass
class StreamConfig:
    key_cols: tuple[str, ...] = ("repo", "path")
    num_buckets: int = 64
    max_files_per_trigger: int = 8
    processing_time: str = "0 seconds"  # as-fast-as-possible micro-batches
    # "mor" appends O(batch) deltas per micro-batch (high-frequency tails);
    # the governor below keeps read amplification bounded on long streams.
    merge_mode: str = "cow"
    # MOR governor cadence: after each micro-batch, fold any bucket whose
    # delta chain exceeds this (manifest-only check when nothing is over —
    # no Spark job). None disables. Without it a long-running MOR stream
    # grows delta chains without bound. Ignored for COW.
    mor_max_deltas: int | None = 16
    # S9 source selection for stream_tail_topic: "file" tails a FileTopic
    # directory (the in-sandbox bus); "kafka" builds the real
    # readStream.format("kafka") reader (needs the spark-sql-kafka package
    # on the cluster) — decode and merge plans are identical either way.
    source: str = "file"
    bootstrap_servers: str | None = None
    topic: str | None = None
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None  # Kafka's backpressure knob
    # physical layout for the table the stream creates (see ReplayConfig):
    # cluster_by sorts bucket files (row-group pruning on lsn scans),
    # bloom_filter_cols writes key bloom filters (point-probe skipping)
    cluster_by: tuple[str, ...] | None = None
    bloom_filter_cols: tuple[str, ...] | None = None


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")`` matching the
    reference consumer's subscribe/poll configuration
    (KeyedJsonConsumer.cs:88-144: subscribe by topic, resume from committed
    or earliest). ``maxOffsetsPerTrigger`` is the micro-batch sizing /
    backpressure bound (the file path's ``maxFilesPerTrigger`` twin)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # exactly-once lives in the idempotent merge + commit log, not in
        # Kafka's (at-least-once) delivery — never fail the query on GC'd
        # source offsets
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def decode_kafka_batch(batch: DataFrame, payload_schema) -> DataFrame:
    """Kafka wire records → changelog rows: cast the binary key/value to
    string (keyed-JSON codec) and ``from_json``-decode the envelope — the
    exact decode plan the FileTopic path runs, applied to Kafka's
    ``(key binary, value binary, topic, partition, offset, ...)`` shape."""
    from cdc_tools_spark.bus.json_codec import deserialize_changelog

    msgs = batch.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    return deserialize_changelog(msgs, payload_schema)


def stream_tail(
    spark: SparkSession,
    log_dir: str,
    table_root: str,
    state_root: str,
    checkpoint_dir: str,
    execution_id: str = "stream-0",
    config: StreamConfig | None = None,
) -> StreamingQuery:
    """Start the continuous tail; returns the StreamingQuery handle."""
    config = config or StreamConfig()
    commit_log = CommitLog(state_root, execution_id)

    table = ParquetMergeTable(spark, table_root, config.key_cols)
    if not table.exists():
        import pyspark.sql.types as T

        payload = T.StructType(
            [f for f in BINLOG_SCHEMA.fields if f.name not in META_COLS]
        )
        ParquetMergeTable.create(
            spark,
            table_root,
            payload,
            config.key_cols,
            config.num_buckets,
            order_cols=("lsn", "seqval"),
            merge_mode=config.merge_mode,
            cluster_by=config.cluster_by,
            bloom_filter_cols=config.bloom_filter_cols,
        )

    stream = (
        spark.readStream.schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", config.max_files_per_trigger)
        .parquet(log_dir)
    )

    return (
        stream.writeStream.foreachBatch(
            _merge_batch_fn(
                table, commit_log, execution_id,
                config.mor_max_deltas if config.merge_mode == "mor" else None,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=config.processing_time)
        .start()
    )


def _merge_batch_fn(table, commit_log, execution_id, mor_max_deltas=None):
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # merge() compacts internally — one aggregation does micro-batch
        # compaction and newer-wins dedup together. The commit marker's
        # bounds (min/max lsn, raw count) ride the merge job's own
        # Observation (MergeResult.batch_min/max_lsn + raw_events) — no
        # second aggregation pass over the micro-batch (VERDICT r2 #2).
        result = table.merge(batch, epoch_id=batch_id, collect_metrics=True)
        commit_log.commit(
            EpochCommit(
                execution_id=execution_id,
                table_name=commit_log.table_name,
                epoch=batch_id,
                from_lsn=result.batch_min_lsn,
                to_lsn=result.batch_max_lsn,
                applied_upserts=result.upserts,
                applied_deletes=result.deletes,
                skipped_events=max(
                    0, max(0, result.raw_events) - result.upserts - result.deletes
                ),
                table_version=result.version,
                partition_lineage={str(k): v for k, v in result.partition_lineage.items()},
            )
        )
        # MOR read-amplification governor (same cadence as the batch
        # pipeline): manifest-only check when no chain is over threshold
        if mor_max_deltas is not None and hasattr(table, "compact_table"):
            table.compact_table(max_deltas=mor_max_deltas)

    return apply_batch


def stream_tail_topic(
    spark: SparkSession,
    topic_root: str,
    table_root: str,
    state_root: str,
    checkpoint_dir: str,
    execution_id: str = "stream-topic-0",
    config: StreamConfig | None = None,
) -> StreamingQuery:
    """The S9 Kafka-shape source: tail a keyed-JSON message topic and
    ``from_json``-decode each micro-batch back into changelog rows before
    the ordered merge — the KeyedJsonConsumer.cs:88-152
    consume→deserialize→buffer path.

    ``config.source`` picks the bus: ``"file"`` tails a
    :class:`cdc_tools_spark.bus.FileTopic` directory (the in-sandbox bus,
    ``topic_root``); ``"kafka"`` builds the real
    ``readStream.format("kafka")`` reader from
    ``config.bootstrap_servers``/``config.topic`` (requires the
    spark-sql-kafka package on the cluster). Decode and merge plans are
    identical — only the source node differs."""
    import pyspark.sql.types as T

    from cdc_tools_spark.bus.file_topic import TOPIC_SCHEMA
    from cdc_tools_spark.bus.json_codec import deserialize_changelog

    config = config or StreamConfig()
    commit_log = CommitLog(state_root, execution_id)
    payload = T.StructType([f for f in BINLOG_SCHEMA.fields if f.name not in META_COLS])

    table = ParquetMergeTable(spark, table_root, config.key_cols)
    if not table.exists():
        ParquetMergeTable.create(
            spark, table_root, payload, config.key_cols, config.num_buckets,
            order_cols=("lsn", "seqval"), merge_mode=config.merge_mode,
            cluster_by=config.cluster_by,
            bloom_filter_cols=config.bloom_filter_cols,
        )

    merge = _merge_batch_fn(
        table, commit_log, execution_id,
        config.mor_max_deltas if config.merge_mode == "mor" else None,
    )
    if config.source == "kafka":
        if not (config.bootstrap_servers and config.topic):
            raise ValueError(
                "source='kafka' requires StreamConfig.bootstrap_servers and .topic"
            )
        stream = (
            spark.readStream.format("kafka")
            .options(
                **kafka_source_options(
                    config.bootstrap_servers,
                    config.topic,
                    config.starting_offsets,
                    config.max_offsets_per_trigger,
                )
            )
            .load()
        )

        def apply_batch(batch: DataFrame, batch_id: int) -> None:
            merge(decode_kafka_batch(batch, payload), batch_id)

    elif config.source == "file":
        stream = (
            spark.readStream.schema(TOPIC_SCHEMA)
            .option("maxFilesPerTrigger", config.max_files_per_trigger)
            .parquet(topic_root)
        )

        def apply_batch(batch: DataFrame, batch_id: int) -> None:
            merge(deserialize_changelog(batch, payload), batch_id)

    else:
        raise ValueError(f"unknown stream source: {config.source!r}")

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=config.processing_time)
        .start()
    )
