"""FileTopic — a partitioned, offset-addressed message log on any
Hadoop-visible filesystem.

The sandbox stand-in for the Kafka topic between the reference's producer
(CdcToKafka.Streaming) and consumer (KafkaToRedshift) processes, with the
two Kafka properties the pipeline actually relies on:

* **keyed partitioning** — ``partition = hash(key) % n`` routes every
  message of one key to one partition (per-key order preservation,
  KeyedJsonProducer.cs:39);
* **monotonic offsets** — per-partition dense offsets so a consumer can
  resume from a committed position (``(partition, offset)`` checkpointing,
  the reference's consumer.CommitAsync path, KafkaToRedshift
  MessageProxy/RedshiftWriter.cs:46-49).

Layout: ``root/partition={p}/append-{seq}.parquet`` with rows
``(key, value, offset)``; appends are whole-batch atomic per partition
directory (parquet job commit). The default partitioner is the first md5
nibble mod n — deliberately engine-portable so the DuckDB oracle reproduces
partition assignment bit-for-bit; production can pass
``partitioner="xxhash64"`` for better dispersion at large n.

Reads are plain parquet scans: Structured Streaming can tail the same
directory (``spark.readStream.schema(...).parquet(root)``) — see
cdc_tools_spark.streaming.tail.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)


def partition_for_key(key, n_partitions: int, partitioner: str = "md5"):
    """Deterministic key→partition routing (a Column expression)."""
    k = F.col(key) if isinstance(key, str) else key
    if partitioner == "md5":
        # first md5 nibble mod n — reproducible in DuckDB for the oracle
        nibble = F.conv(F.substring(F.md5(k), 1, 1), 16, 10).cast("int")
        return F.pmod(nibble, F.lit(n_partitions)).cast("int")
    if partitioner == "xxhash64":
        return F.pmod(F.xxhash64(k), F.lit(n_partitions)).cast("int")
    raise ValueError(f"unknown partitioner: {partitioner!r}")


class FileTopic:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_partitions: int = 8,
        partitioner: str = "md5",
    ):
        self.spark = spark
        self.root = root
        self.n_partitions = n_partitions
        self.partitioner = partitioner

    def end_offsets(self) -> dict[int, int]:
        """Next offset per partition (0 for empty/new partitions)."""
        try:
            existing = self.spark.read.schema(TOPIC_SCHEMA).parquet(self.root)
        except Exception:
            return {p: 0 for p in range(self.n_partitions)}
        rows = (
            existing.groupBy("partition").agg(F.max("offset").alias("mx")).collect()
        )
        out = {p: 0 for p in range(self.n_partitions)}
        for r in rows:
            out[int(r["partition"])] = int(r["mx"]) + 1
        return out

    def append(self, messages: DataFrame, order_cols: tuple[str, ...] = ()) -> int:
        """Publish one batch of ``(key, value)`` messages; returns the row
        count. Offsets are densely assigned per partition, continuing from
        the partition's current end offset; within the batch, message order
        follows ``order_cols`` (pass the changelog's ``(lsn, seqval)``
        carried on the frame, or leave empty for key order).

        The offset window is per-partition — at n_partitions comparable to
        the shuffle width this is the same parallelism Kafka itself gives a
        topic; it never globally sorts the batch."""
        ends = self.end_offsets()
        base = F.create_map(
            *[F.lit(x) for kv in ends.items() for x in kv]
        )
        # non-keyed messages (key null — the NonKeyed producer twins) spread
        # by value hash: no per-key order to preserve, just dispersion.
        part = partition_for_key(
            F.coalesce(F.col("key"), F.col("value")),
            self.n_partitions,
            self.partitioner,
        )
        w = Window.partitionBy("partition").orderBy(
            *[F.col(c) for c in order_cols], F.col("key")
        )
        out = (
            messages.withColumn("partition", part)
            .withColumn(
                "offset",
                F.row_number().over(w).cast("long")
                - 1
                + base[F.col("partition")],
            )
            .select([f.name for f in TOPIC_SCHEMA.fields])
        )
        n = out.count()
        (
            out.repartition(F.col("partition"))
            .write.mode("append")
            .partitionBy("partition")
            .parquet(self.root)
        )
        return n

    def read(
        self,
        from_offsets: dict[int, int] | None = None,
        to_offsets: dict[int, int] | None = None,
    ) -> DataFrame:
        """Consume ``[from, to)`` per partition (Kafka offset-range scan).
        No bounds → the whole topic."""
        df = self.spark.read.schema(TOPIC_SCHEMA).parquet(self.root)
        if from_offsets:
            lo = F.create_map(*[F.lit(x) for kv in from_offsets.items() for x in kv])
            df = df.where(F.col("offset") >= F.coalesce(lo[F.col("partition")], F.lit(0)))
        if to_offsets:
            hi = F.create_map(*[F.lit(x) for kv in to_offsets.items() for x in kv])
            df = df.where(F.col("offset") < F.coalesce(hi[F.col("partition")], F.lit(1 << 62)))
        return df
