"""cdc_tools_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the capabilities of Vanlightly/CDC-Tools
(reference at /root/reference, C#) on Spark primitives:

- ordered change-event log (binlog/WAL shape) keyed by (repo, path) with a
  total order given by (lsn, seqval) — see ``sources.binlog``;
- per-key last-write-wins compaction (the reference's GetValidChanges,
  S3Uploader.cs:120-136) — see ``operators.compaction``;
- transaction-boundary-safe epoch planning (the reference's windowed
  micro-batches, RedshiftWriter.cs:52-61) — see ``operators.epochs``;
- idempotent MERGE into a lake table with schema evolution
  (the reference's staged Redshift merge, RedshiftDao.cs:50-126) — see
  ``lake.parquet_merge`` (self-contained) and ``lake.iceberg`` (MERGE INTO);
- an epoch/offset commit log for exactly-once replay (the reference's
  ChangeState table, StateManager.cs:28-81) — see ``state.commit_log``;
- the end-to-end replay driver (watermark-based crash resume, job-level
  retries, multi-table fan-out) — see ``pipeline``;
- the changelog bus: keyed/non-keyed × JSON/Avro producer-consumer pairs
  over a partitioned offset-addressed topic (the reference's Kafka hop) —
  see ``bus``; Avro schema generation + binary codec in ``functions``;
- merge-on-read mode (O(batch) delta appends + read-time compaction +
  fold governor) next to copy-on-write — see ``lake.parquet_merge``;
- training-data ops: dedup (exact/MinHash-LSH/SimHash/Jaccard + the
  composed discovery→verify pipeline), banded-LSH + IVF-flat ANN, text
  analysis, multimodal ``mapInPandas`` plumbing — see ``ops``.

Everything is pyspark.sql DataFrames; Python touches data only through
Arrow-vectorized pandas UDFs (sha256 parity, Avro binary codec, media
decode). All manifest/marker I/O goes through the Hadoop FileSystem API.
"""

from cdc_tools_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
