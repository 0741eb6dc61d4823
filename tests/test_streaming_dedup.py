"""Streaming incremental dedup: the union of per-batch pair partitions must
equal the batch-at-once pipeline over the whole corpus (every pair is found
when its LATER doc arrives), and a replayed micro-batch must be idempotent
(dynamic partition overwrite of its own batch_id partitions)."""

import time

import pyspark.sql.functions as F

from cdc_tools_spark.ops.dedup import neardup_pairs
from cdc_tools_spark.streaming.dedup_stream import (
    DedupStreamConfig,
    accumulated_pairs,
    stream_dedup,
)


def _write_docs(docs_df, path):
    docs_df.coalesce(1).write.mode("append").parquet(path)


def test_stream_dedup_converges_to_batch_at_once(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    thirds = [docs.where((F.col("doc_id") % 3) == i) for i in range(3)]
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_docs(thirds[0], in_dir)

    cfg = DedupStreamConfig(threshold=0.3, max_files_per_trigger=1)
    query = stream_dedup(spark, in_dir, out, str(tmp_path / "ckpt"), cfg)
    try:
        query.processAllAvailable()
        _write_docs(thirds[1], in_dir)
        query.processAllAvailable()
        _write_docs(thirds[2], in_dir)
        query.processAllAvailable()
    finally:
        query.stop()

    got = {tuple(r) for r in accumulated_pairs(spark, out).collect()}
    want = {tuple(r) for r in neardup_pairs(docs, threshold=0.3).collect()}
    assert got == want and len(want) > 0

    # index/corpus artifacts accumulated batch-partitioned
    idx = spark.read.parquet(out + "/band_index")
    assert idx.select("batch_id").distinct().count() == 3
    assert spark.read.parquet(out + "/corpus").count() == docs.count()


def test_stream_dedup_replayed_batch_is_idempotent(spark, tmp_path):
    """Simulate a foreachBatch replay (crash after partial writes): running
    the SAME batch id twice leaves one copy of its partitions."""
    from cdc_tools_spark.streaming.dedup_stream import _read_or_empty

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_docs(docs, in_dir)

    cfg = DedupStreamConfig(threshold=0.3)
    q = stream_dedup(spark, in_dir, out, str(tmp_path / "ckpt"), cfg)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = accumulated_pairs(spark, out).count()
    corpus_n = spark.read.parquet(out + "/corpus").count()

    # replay batch 0 with a FRESH checkpoint (Spark re-delivers the files,
    # foreachBatch runs again with the same inputs): artifacts must not grow
    q2 = stream_dedup(spark, in_dir, out, str(tmp_path / "ckpt2"), cfg)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert accumulated_pairs(spark, out).count() == first
    assert spark.read.parquet(out + "/corpus").count() == corpus_n
