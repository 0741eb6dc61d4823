"""LakeTable — the engine's sink abstraction.

The reference's sink is a staged Redshift merge: COPY two stage tables from
S3, then ``DELETE USING stage_upsert; DELETE USING stage_delete; INSERT
SELECT * FROM stage_upsert`` in one transaction (RedshiftDao.cs:50-126).
That is exactly the semantics of a lake-format ``MERGE INTO`` keyed on the
primary key, which is what this interface exposes:

    MERGE INTO target t USING batch s
      ON t.repo = s.repo AND t.path = s.path
    WHEN MATCHED AND s.change_type = 1 THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.change_type != 1 THEN INSERT *

Implementations:

* :class:`cdc_tools_spark.lake.parquet_merge.ParquetMergeTable` — runs in
  this sandbox (no Iceberg/Delta jars): key-hash-bucketed parquet + an
  atomic JSON snapshot manifest.
* :class:`cdc_tools_spark.lake.iceberg.IcebergTable` — emits real Iceberg
  ``MERGE INTO`` / ``ALTER TABLE`` SQL for clusters with the runtime jar.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class MergeResult:
    """Metrics of one applied merge batch (the reference logs these as
    "N redundant changes were omitted", S3Uploader.cs:30,45)."""

    epoch_id: int
    upserts: int
    deletes: int
    touched_partitions: int
    version: int
    partition_lineage: dict[int, int] = field(default_factory=dict)
    # raw batch rows BEFORE compaction — observed on the merge job itself
    # (no second pass over the batch); -1 when metrics were not collected.
    raw_events: int = -1
    # [min, max] lsn of the raw batch, observed on the same job — the
    # commit-marker bounds for streaming micro-batches (no per-batch
    # agg/collect in foreachBatch); -1/-1 when empty or not collected.
    batch_min_lsn: int = -1
    batch_max_lsn: int = -1


class LakeTable(ABC):
    """A key-addressed, MERGE-capable, schema-evolving table."""

    key_cols: Sequence[str]

    @abstractmethod
    def exists(self) -> bool: ...

    @abstractmethod
    def read(self) -> DataFrame:
        """Current snapshot as a DataFrame."""

    @abstractmethod
    def merge(
        self,
        batch: DataFrame,
        epoch_id: int,
        collect_metrics: bool = True,
        prune_buckets: bool = True,
    ) -> MergeResult:
        """Apply one change batch (raw or compacted; carries ``lsn``,
        ``seqval``, ``change_type``). Must be idempotent: re-merging the
        same batch leaves the table unchanged. Must evolve the table schema
        (column add / type widen) before applying, per the north rule."""
