"""Concurrent-writer safety: the manifest-chain CAS (fsio.create_exclusive)
must never lose a committed version, and the loser of a racing commit must
get a clean CommitConflictError having mutated nothing visible.

The reference gets this for free from the Redshift transaction wrapping its
staged merge (RedshiftDao.cs:91-115); the lake analog is optimistic
concurrency on the manifest chain plus per-attempt unique data directories.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from cdc_tools_spark.lake import fsio
from cdc_tools_spark.lake.fsio import CommitConflictError
from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable
from cdc_tools_spark.state.commit_log import CommitLog, EpochCommit

from tests.conftest import EVENT_SCHEMA, INSERT

PAYLOAD = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _events(lsn: int, repo: str, n: int) -> list[dict]:
    return [
        {
            "lsn": lsn,
            "seqval": i,
            "change_type": INSERT,
            "repo": repo,
            "path": str(i),
            "commit": f"c{lsn}_{i}",
            "lang": "py",
            "content": f"{repo}:{i}",
        }
        for i in range(1, n + 1)
    ]


def test_create_exclusive_is_cas(tmp_path):
    p = str(tmp_path / "marker.json")
    assert fsio.create_exclusive(p, "first") is True
    assert fsio.create_exclusive(p, "second") is False
    assert fsio.read_text(p) == "first"  # loser never overwrites


def test_stale_manifest_store_conflicts(spark, tmp_path):
    """Two writers loading the same manifest: the second _store (same seq)
    must raise, and the winner's commit must be untouched."""
    root = str(tmp_path / "table")
    t = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)
    m_a = t._load()
    m_b = t._load()  # second writer's stale view of the same seq
    m_a["version"] = 1
    t._store(m_a)
    with pytest.raises(CommitConflictError):
        t._store(m_b)
    assert t._load()["version"] == 1  # winner's manifest survived intact


def test_create_on_existing_table_conflicts(spark, tmp_path):
    root = str(tmp_path / "table")
    ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)
    with pytest.raises(CommitConflictError):
        ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)


def test_two_driver_contention_no_lost_update(spark, tmp_path):
    """Two concurrent drivers merging disjoint batches into one table: with
    retry-on-conflict, both commits land; no version or row is ever lost.
    Unique data dirs guarantee the loser's files can't clobber the winner's
    even while both jobs run simultaneously."""
    root = str(tmp_path / "table")
    ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)

    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def driver(repo: str, epoch: int) -> None:
        try:
            table = ParquetMergeTable(spark, root)  # own handle, own loads
            batch = spark.createDataFrame(_events(epoch, repo, 40), EVENT_SCHEMA)
            barrier.wait()
            for _ in range(5):  # optimistic retry loop
                try:
                    table.merge(batch, epoch_id=epoch)
                    return
                except CommitConflictError:
                    continue
            raise AssertionError(f"driver {repo} never won a commit")
        except Exception as e:  # noqa: BLE001 — surfaced to the main thread
            errors.append(e)

    t1 = threading.Thread(target=driver, args=("alpha", 1))
    t2 = threading.Thread(target=driver, args=("beta", 2))
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert errors == []

    t = ParquetMergeTable(spark, root)
    m = t._load()
    assert m["version"] == 2  # both commits present, none lost
    rows = t.read().groupBy("repo").count().collect()
    assert {r["repo"]: r["count"] for r in rows} == {"alpha": 40, "beta": 40}


def test_conflict_loser_orphan_dir_is_vacuumed(spark, tmp_path):
    """A CAS loser's data directory is unreferenced garbage; vacuum removes
    it while keeping every referenced directory (including a same-version
    committed twin). A directory numbered beyond the current version (an
    in-flight writer) is left alone."""
    root = str(tmp_path / "table")
    t = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4, retained_snapshots=1)
    t.merge(spark.createDataFrame(_events(1, "alpha", 10), EVENT_SCHEMA), epoch_id=1)
    m = t._load()
    committed_dir = m["dirs"]["1"]
    # fabricate a CAS loser's orphan twin of version 1 and an in-flight v2 dir
    fsio.mkdirs(str(tmp_path / "table" / "d1-deadbeef" / "bucket=0"))
    fsio.mkdirs(str(tmp_path / "table" / "d2-cafef00d" / "bucket=0"))
    removed = t.vacuum(keep_versions=1, grace_seconds=0)
    assert removed == [1]
    names = set(fsio.listdir(root))
    assert committed_dir in names
    assert "d1-deadbeef" not in names
    assert "d2-cafef00d" in names  # version 2 > current version 1: in-flight
    assert t.read().count() == 10


def test_commit_marker_create_if_absent(tmp_path):
    log = CommitLog(str(tmp_path / "state"), "exec-1")
    rec = EpochCommit("exec-1", "repo_files", 0, 0, 10)
    assert log.commit(rec) is True
    # racing idempotent re-commit: first marker wins, no overwrite
    rec2 = EpochCommit("exec-1", "repo_files", 0, 0, 99)
    assert log.commit(rec2) is False
    assert log.last_committed().to_lsn == 10


def test_manifest_pointer_loss_is_recoverable(spark, tmp_path):
    """ADVICE r2: the old single-file manifest could be lost forever in the
    delete+rename window. The chain layout survives losing the pointer hint
    entirely — loads list the manifest directory, and the next commit
    rewrites the pointer."""
    root = str(tmp_path / "table")
    t = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)
    t.merge(spark.createDataFrame(_events(1, "alpha", 10), EVENT_SCHEMA), 1)
    fsio.delete(str(tmp_path / "table" / "manifest.json"))  # pointer gone
    t2 = ParquetMergeTable(spark, root)  # fresh handle, no cached state
    assert t2.exists() and t2._load()["version"] == 1
    assert t2.read().count() == 10
    t2.merge(spark.createDataFrame(_events(2, "beta", 5), EVENT_SCHEMA), 2)
    assert t2.read().count() == 15
    assert fsio.exists(str(tmp_path / "table" / "manifest.json"))  # rewritten


def test_two_driver_contention_mor_deltas(spark, tmp_path):
    """Same race on a merge-on-read table: both drivers' delta appends land
    (the loser retries its O(batch) append), newer-wins read-time
    compaction stays correct."""
    root = str(tmp_path / "table")
    ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=4,
        order_cols=("lsn", "seqval"), merge_mode="mor",
    )
    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def driver(repo: str, epoch: int) -> None:
        try:
            table = ParquetMergeTable(spark, root)
            batch = spark.createDataFrame(_events(epoch, repo, 30), EVENT_SCHEMA)
            barrier.wait()
            for _ in range(5):
                try:
                    table.merge(batch, epoch_id=epoch)
                    return
                except CommitConflictError:
                    continue
            raise AssertionError(f"driver {repo} never won a commit")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=driver, args=(r, e))
          for r, e in (("alpha", 1), ("beta", 2))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert errors == []
    t = ParquetMergeTable(spark, root)
    rows = t.read().groupBy("repo").count().collect()
    assert {r["repo"]: r["count"] for r in rows} == {"alpha": 30, "beta": 30}


def test_reader_sees_only_committed_snapshots_during_writes(spark, tmp_path):
    """Snapshot isolation under a live writer: every concurrent read
    returns exactly one committed epoch's state (row multiples of a full
    batch), never a torn mixture — immutable manifests + retained version
    dirs make reads repeatable without locks."""
    root = str(tmp_path / "table")
    ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=4)
    stop = threading.Event()
    counts: list[int] = []
    errors: list[Exception] = []

    def reader() -> None:
        try:
            table = ParquetMergeTable(spark, root)
            while not stop.is_set():
                counts.append(table.read().count())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    r = threading.Thread(target=reader)
    r.start()
    writer = ParquetMergeTable(spark, root)
    for epoch in range(1, 5):  # 4 commits of 25 fresh keys each
        writer.merge(
            spark.createDataFrame(_events(epoch, f"repo{epoch}", 25), EVENT_SCHEMA),
            epoch_id=epoch,
        )
    stop.set()
    r.join()
    assert errors == []
    assert counts, "reader never completed a read"
    assert set(counts) <= {0, 25, 50, 75, 100}  # only whole committed states
