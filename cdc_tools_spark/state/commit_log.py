"""Epoch/offset commit log — the exactly-once marker table.

Mirrors the reference's ``ChangeState`` table keyed by
``(ExecutionId, TableName)`` (CdcReader.Database/Tables/ChangeState.sql:1-12,
StateManager.cs:28-81), generalized from "last offset" to one immutable
marker per epoch (FIXTURES.md F4), carrying the applied/skipped metrics and
per-partition lineage.

Protocol (same ordering argument as the reference's
store-offset-after-upload, RedshiftWriter.cs:46-49):

1. merge epoch N into the lake table (idempotent);
2. write marker N (atomic file create).

Crash between 1 and 2 → replay re-merges N: idempotent, no double-apply.
Marker present → epoch skipped on replay. Net effect: exactly-once.

One JSON file per epoch keeps markers immutable and the "is epoch N
committed?" check O(1). All I/O goes through the Hadoop FileSystem API
(:mod:`cdc_tools_spark.lake.fsio`), so the marker directory runs unchanged
on S3A/HDFS; marker creation is create-if-absent (object-store conditional
put is the hardening for concurrent drivers).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cdc_tools_spark.lake import fsio


@dataclass(frozen=True)
class EpochCommit:
    execution_id: str
    table_name: str
    epoch: int
    from_lsn: int
    to_lsn: int
    applied_upserts: int = 0
    applied_deletes: int = 0
    skipped_events: int = 0  # redundant changes eliminated by compaction
    table_version: int = 0
    partition_lineage: dict[str, int] = field(default_factory=dict)


class CommitLog:
    def __init__(self, root: str, execution_id: str, table_name: str = "repo_files"):
        self.execution_id = execution_id
        self.table_name = table_name
        self.dir = os.path.join(root, f"execution_id={execution_id}", f"table={table_name}")
        fsio.mkdirs(self.dir)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch-{epoch:010d}.json")

    def is_committed(self, epoch: int) -> bool:
        return fsio.exists(self._path(epoch))

    def commit(self, rec: EpochCommit) -> bool:
        """Atomic create-if-absent marker write (``fsio.create_exclusive``
        — no check-then-write window). Two drivers replaying the same epoch
        both merged idempotently; the first marker wins and the second
        commit is a no-op. Returns True iff this call created the marker."""
        return fsio.create_exclusive_json(
            self._path(rec.epoch), asdict(rec), indent=None
        )

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(f[len("epoch-") : -len(".json")])
            for f in fsio.listdir(self.dir)
            if f.startswith("epoch-") and f.endswith(".json")
        )

    def records(self) -> list[EpochCommit]:
        return [
            EpochCommit(**json.loads(fsio.read_text(self._path(e))))
            for e in self.committed_epochs()
        ]

    def last_committed(self) -> EpochCommit | None:
        epochs = self.committed_epochs()
        if not epochs:
            return None  # the reference's NoStoredState sentinel
        return EpochCommit(**json.loads(fsio.read_text(self._path(epochs[-1]))))

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        """The commit log as a metrics DataFrame (F4 shape)."""
        rows = [
            {**asdict(r), "partition_lineage": json.dumps(r.partition_lineage)}
            for r in self.records()
        ]
        schema = (
            "execution_id string, table_name string, epoch long, from_lsn long, "
            "to_lsn long, applied_upserts long, applied_deletes long, "
            "skipped_events long, table_version long, partition_lineage string"
        )
        return spark.createDataFrame(rows, schema=schema)
