#!/usr/bin/env python3
"""Pipeline shape 1 (DB → bus → sink) end to end, Spark-native.

The reference runs this as two processes — CdcToKafka.Streaming (reader →
keyed JSON/Avro producer) and KafkaToRedshift (consumer → windowed Redshift
writer). Here the same shape is: changelog → keyed JSON messages →
partitioned FileTopic → Structured-Streaming tail with ``from_json`` decode
→ ordered MERGE into the lake table.

Run:  spark-submit --py-files dist/cdc_tools_spark.zip examples/publish_consume_job.py
(or plain ``python examples/publish_consume_job.py`` in this sandbox).
On a real bus, set ``bus.publish_changelog(..., sink="kafka",
bootstrap_servers=..., topic=...)`` on the produce side and
``StreamConfig(source="kafka", ...)`` on the consume side — key, value,
and the decode/merge plan are identical; only the transport node changes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_tools_spark.bus import FileTopic, serialize_changelog
from cdc_tools_spark.functions.avro_schema import (
    generate_avro_schema,
    schema_fingerprint,
)
from cdc_tools_spark.lake.parquet_merge import META_COLS, ParquetMergeTable
from cdc_tools_spark.session import get_spark
from cdc_tools_spark.sources.binlog import synthetic_binlog
from cdc_tools_spark.streaming.tail import StreamConfig, stream_tail_topic


def main() -> None:
    spark = get_spark("publish-consume-example", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="pubsub_")
    topic_dir, table_dir, state_dir, ckpt = (
        f"{work}/topic", f"{work}/table", f"{work}/state", f"{work}/ckpt"
    )

    # -- producer side: changelog → keyed JSON messages → topic -----------
    log = synthetic_binlog(spark, n_events=50_000, n_keys=2_000, hot_key_pct=10)
    topic = FileTopic(spark, topic_dir, n_partitions=8)
    n = topic.append(
        serialize_changelog(log, carry_cols=("lsn", "seqval")),
        order_cols=("lsn", "seqval"),
    )
    print(f"published {n} keyed messages across 8 partitions")

    # the Avro record schema the producer would register for this stream
    import pyspark.sql.types as T

    payload = T.StructType([f for f in log.schema.fields if f.name not in META_COLS])
    schema = generate_avro_schema(payload, name="repo_files")
    print("avro schema fingerprint:", schema_fingerprint(schema)[:16])
    print(json.dumps(schema, indent=1)[:400], "...")

    # -- consumer side: stream the topic into the lake table --------------
    q = stream_tail_topic(
        spark, topic_dir, table_dir, state_dir, ckpt,
        config=StreamConfig(num_buckets=16, max_files_per_trigger=4),
    )
    q.processAllAvailable()
    q.stop()

    final = ParquetMergeTable(spark, table_dir).read()
    print("final table rows:", final.count())
    print("end offsets:", topic.end_offsets())


if __name__ == "__main__":
    main()
