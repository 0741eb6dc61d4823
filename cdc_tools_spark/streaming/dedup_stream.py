"""Structured-Streaming incremental dedup: a continuously-arriving corpus
deduped batch by batch against its own accumulated LSH index.

``readStream`` over an append-only documents directory; each micro-batch

1. probes the accumulated band index for new×corpus candidates and
   self-joins for new×new (``ops.dedup.minhash_lsh_candidates_incremental``
   via :func:`cdc_tools_spark.ops.dedup.neardup_pairs_incremental`),
2. exact-Jaccard verifies candidates only,
3. appends three batch-partitioned artifacts under ``out_root``:
   ``pairs/batch_id=N`` (verified near-dup pairs), ``band_index/batch_id=N``
   (the batch's bands — the next batches' probe target), and
   ``corpus/batch_id=N`` (the batch's docs — the verify-stage text source).

**Coverage invariant**: every near-dup pair (a, b) of the full corpus is
found exactly when the LATER of the two documents arrives (the earlier one
is in the index by then; same-batch pairs come from the self-join), so the
union of all ``pairs/`` partitions equals the batch-at-once
``neardup_pairs`` over the whole corpus — asserted in
``tests/test_streaming_dedup.py``.

**Exactly-once**: Spark's streaming checkpoint assigns each source file to
one micro-batch; every artifact is written to a ``batch_id=N`` partition
with dynamic partition overwrite, so a replayed ``foreachBatch`` (driver
crash between writes) overwrites its own partitions and nothing else —
idempotent without a transaction log.

At 100 TB the probe join is the whole point: a daily increment pays
O(|batch| × matched buckets), never a corpus self-join; the band index is
an append-only parquet table a real deployment would bucket by
``(band, band_key)`` so the probe co-locates.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from cdc_tools_spark.ops.dedup import lsh_band_index, neardup_pairs_incremental

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@dataclass
class DedupStreamConfig:
    num_hashes: int = 32
    rows_per_band: int = 4
    shingle_n: int = 3
    threshold: float = 0.5
    max_files_per_trigger: int = 4
    id_col: str = "doc_id"
    text_col: str = "text"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    from cdc_tools_spark.lake import fsio

    if fsio.exists(path) and any(
        n.startswith("batch_id=") for n in fsio.listdir(path)
    ):
        return spark.read.option("basePath", path).parquet(path)
    return spark.createDataFrame([], schema=schema)


def stream_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_root: str,
    checkpoint_dir: str,
    config: DedupStreamConfig | None = None,
    schema: T.StructType = DOCS_SCHEMA,
) -> StreamingQuery:
    cfg = config or DedupStreamConfig()
    id_c, tx_c = cfg.id_col, cfg.text_col

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(id_c, tx_c)
        corpus = _read_or_empty(
            spark, f"{out_root}/corpus", f"{id_c} long, {tx_c} string, batch_id long"
        ).select(id_c, tx_c)
        index = _read_or_empty(
            spark,
            f"{out_root}/band_index",
            f"{id_c} long, band int, band_key string, batch_id long",
        ).select(id_c, "band", "band_key")
        pairs = neardup_pairs_incremental(
            batch,
            corpus,
            num_hashes=cfg.num_hashes,
            rows_per_band=cfg.rows_per_band,
            n=cfg.shingle_n,
            threshold=cfg.threshold,
            text_col=tx_c,
            id_col=id_c,
            corpus_index=index,
        )
        bid = F.lit(int(batch_id)).cast("long")

        def _write(df: DataFrame, sub: str) -> None:
            # per-write dynamic partition overwrite: a replayed batch
            # (driver crash between writes) overwrites ONLY its own
            # batch_id=N partition — idempotent without touching the
            # session-global conf
            (
                df.withColumn("batch_id", bid)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{out_root}/{sub}")
            )

        _write(pairs, "pairs")
        _write(
            lsh_band_index(
                batch, cfg.num_hashes, cfg.rows_per_band, cfg.shingle_n, tx_c, id_c
            ),
            "band_index",
        )
        _write(batch, "corpus")

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", cfg.max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        reader.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def accumulated_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    """The stream's verified near-dup pairs so far (distinct across the
    crash-replay duplicates dynamic overwrite already prevents; distinct
    here additionally collapses the same pair re-verified in two batches,
    which cannot happen under disjoint batch ids but is cheap insurance)."""
    return (
        _read_or_empty(
            spark,
            f"{out_root}/pairs",
            "doc_a long, doc_b long, jaccard double, batch_id long",
        )
        .select("doc_a", "doc_b", "jaccard")
        .distinct()
    )
