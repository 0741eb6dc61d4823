"""Manifest metadata must not scale with table width (VERDICT r3 #1).

The r3 format serialized the FULL bucket→version map — for the live state
AND every retained snapshot — into each commit's manifest JSON. At the
module's own 100-TB sizing (suggest_num_buckets → 131072 buckets) that is
~2M map entries per commit, written on the driver inside the CAS window.

The v2 chain commits an O(touched-buckets) delta instead, checkpointing the
fold every checkpoint_interval commits; snapshots carry a commit-seq (time
travel refolds the chain) and a live-version set (vacuum) — never a bucket
map. These tests pin that contract on a table at full 100-TB metadata
width, plus the reconstruction paths the design leans on.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from cdc_tools_spark.lake import fsio
from cdc_tools_spark.lake.parquet_merge import (
    ParquetMergeTable,
    suggest_num_buckets,
)

PAYLOAD = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

SCHEMA = (
    "lsn long, seqval long, change_type int, repo string, path string, content string"
)


def _batch(spark, lsn, paths, content):
    return spark.createDataFrame(
        [
            {"lsn": lsn, "seqval": i, "change_type": 2, "repo": "r", "path": p,
             "content": content}
            for i, p in enumerate(paths)
        ],
        schema=SCHEMA,
    )


def _head_manifest(t):
    seq = t._latest_seq()
    path = t._mpath(seq)
    return seq, json.loads(fsio.read_text(path)), os.path.getsize(path)


def test_commit_bytes_are_o_touched_at_100tb_bucket_width(spark, tmp_path):
    """A fully-populated 131072-bucket table (suggest_num_buckets(100 TB))
    where every small merge commits a delta of a few KB — per-commit
    manifest bytes track the touched set, not the table width."""
    n = suggest_num_buckets(100 * (1 << 40))
    assert n == 131072
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=n, checkpoint_interval=8
    )
    # populate the full metadata width without 131072 data files: mark every
    # bucket explicitly empty (-1) — exactly the map width a fully loaded
    # table carries, with no data I/O
    m = t._load()
    m["buckets"] = {str(b): -1 for b in range(n)}
    t._store(m)
    seq, head, ckpt_bytes = _head_manifest(t)
    assert head["kind"] == "checkpoint"  # table-width diff escalates
    assert ckpt_bytes > 500_000  # the full map really is table-width

    delta_sizes, ckpt_seqs = [], []
    for i in range(12):
        t.merge(_batch(spark, i, [f"p{i}-{j}" for j in range(50)], f"v{i}"), i)
        seq, head, size = _head_manifest(t)
        if head["kind"] == "delta":
            delta_sizes.append(size)
            assert len(head["buckets_set"]) <= 50
        else:
            ckpt_seqs.append(seq)
    # deltas stay KB-sized on a 131072-bucket-wide table: >100x under the
    # checkpoint, independent of how many commits have accumulated
    assert delta_sizes and max(delta_sizes) < ckpt_bytes / 100
    assert max(delta_sizes) < 16_000
    # checkpoints appear on the interval cadence only
    assert all(s % 8 == 0 for s in ckpt_seqs) and len(ckpt_seqs) >= 1

    # the fold reads the table back correctly through checkpoint + deltas
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert len(got) == 12 * 50 and got["p11-0"] == "v11"


def test_time_travel_reconstructs_snapshots_from_the_chain(spark, tmp_path):
    """Snapshots store no bucket maps; read_version refolds the chain to
    the snapshot's commit — across delta commits AND checkpoint boundaries."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=4, checkpoint_interval=3
    )
    for i in range(7):  # crosses two checkpoint boundaries (seq 3, 6)
        t.merge(_batch(spark, i, ["a", f"p{i}"], f"v{i}"), i)
    m = t._load()
    assert all("buckets" not in e for e in m["versions"].values())
    for v in (2, 4, 6):
        snap = {r["path"]: r["content"] for r in t.read_version(v).collect()}
        assert snap["a"] == f"v{v - 1}"
        assert set(snap) == {"a"} | {f"p{i}" for i in range(v)}


def test_manifest_gc_keeps_only_what_retained_snapshots_need(spark, tmp_path):
    """The chain floor = the oldest checkpoint any retained snapshot folds
    from; manifests below it are GC'd, listing stays bounded."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=4,
        checkpoint_interval=4, retained_snapshots=3,
    )
    for i in range(30):
        t.merge(_batch(spark, i, [f"p{i % 5}"], f"v{i}"), i)
    names = [x for x in fsio.listdir(t._manifest_dir) if t._mseq(x) is not None]
    # 3 retained snapshots × interval 4 → floor within ~2 intervals of head
    assert len(names) <= 12
    # everything retained is still readable
    m = t._load()
    for v in sorted(int(x) for x in m["versions"])[:3]:
        assert t.read_version(v).count() >= 1


def test_concurrent_delta_commits_still_cas_conflict(spark, tmp_path):
    """Two writers diffing against the same base collide on the same seq
    file — the delta format must not weaken the CAS."""
    t = ParquetMergeTable.create(spark, str(tmp_path / "t"), PAYLOAD, num_buckets=4)
    t.merge(_batch(spark, 0, ["a"], "v0"), 0)
    m_a, m_b = t._load(), t._load()
    m_a["version"] = 2
    m_b["version"] = 2
    t._store(m_a)
    with pytest.raises(Exception):
        t._store(m_b)
    assert t._load()["version"] == 2


def _obatch(spark, lsn, rows):
    """rows: list of (change_type, path)."""
    return spark.createDataFrame(
        [
            {"lsn": lsn, "seqval": i, "change_type": ct, "repo": "r", "path": p,
             "content": f"c{lsn}"}
            for i, (ct, p) in enumerate(rows)
        ],
        schema=SCHEMA,
    )


def test_tombstone_gc_is_manifest_driven_and_touches_only_flagged_buckets(
    spark, tmp_path, monkeypatch
):
    """VERDICT r3 #2 'Done' criterion: on a 64-bucket table with tombstones
    in a couple of buckets, expire_tombstones must launch a job touching
    ONLY those buckets' files — candidate discovery comes from the
    manifest's per-bucket stats, with no full-table scan."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=64,
        order_cols=("lsn", "seqval"),
    )
    # spread 120 upserts across ~64 buckets, then delete exactly 2 keys
    t.merge(_obatch(spark, 1, [(2, f"p{i}") for i in range(120)]), 0)
    t.merge(_obatch(spark, 5, [(1, "p3"), (1, "p77")]), 1)

    m = t._load()
    tomb_buckets = {int(b) for b in m.get("bstats", {})}
    assert 1 <= len(tomb_buckets) <= 2  # the delete keys' buckets only
    assert all(s == [1, 5] or s[1] == 5 for s in m["bstats"].values())

    reads = []
    orig = ParquetMergeTable._read_dirs

    def spy(self, dirs, schema):
        reads.append(list(dirs))
        return orig(self, dirs, schema)

    monkeypatch.setattr(ParquetMergeTable, "_read_dirs", spy)
    v = t.expire_tombstones(below_lsn=100, epoch_id=9)
    assert v == 3
    # exactly one read — the rewrite of the flagged buckets; no discovery scan
    assert len(reads) == 1
    got_buckets = {int(d.rsplit("bucket=", 1)[1]) for d in reads[0]}
    assert got_buckets == tomb_buckets
    # stats drained; data intact minus the deleted keys
    m2 = t._load()
    assert m2.get("bstats", {}) == {}
    paths = {r["path"] for r in t.read().collect()}
    assert "p3" not in paths and "p77" not in paths and len(paths) == 118
    # idempotent no-op afterwards: nothing flagged, no version bump
    assert t.expire_tombstones(below_lsn=100, epoch_id=10) == 3


def test_mor_tombstone_stats_combine_and_reset(spark, tmp_path):
    """MOR appends combine delta stats as running upper bounds;
    compact_table resets them to exact; expire uses them for discovery."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=4,
        order_cols=("lsn", "seqval"), merge_mode="mor",
    )
    t.merge(_obatch(spark, 1, [(2, "a"), (2, "b")]), 0)
    t.merge(_obatch(spark, 2, [(1, "a")]), 1)   # tombstone for a
    t.merge(_obatch(spark, 3, [(1, "a")]), 2)   # superseding tombstone
    m = t._load()
    total = sum(s[0] for s in m["bstats"].values())
    assert total == 2  # upper bound: both deltas counted
    assert min(s[1] for s in m["bstats"].values()) == 2
    # compaction folds the chain -> exact count (1 surviving tombstone)
    t.compact_table(max_deltas=0)
    m = t._load()
    assert sum(s[0] for s in m["bstats"].values()) == 1
    # watermark below the tombstone: no candidates, no-op
    v = t._load()["version"]
    assert t.expire_tombstones(below_lsn=2, epoch_id=8) == v
    # watermark above: tombstone GC'd, stats drained
    t.expire_tombstones(below_lsn=10, epoch_id=9)
    m = t._load()
    assert m.get("bstats", {}) == {}
    assert {r["path"] for r in t.read().collect()} == {"b"}


def test_v1_full_manifest_upgrades_in_place(spark, tmp_path):
    """A table written by the pre-delta format (one FULL manifest per
    commit, snapshot entries embedding complete bucket maps, no 'kind')
    must keep reading, time-travel off the embedded maps, and silently
    upgrade to the v2 chain on its next commit."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=4,
        order_cols=("lsn", "seqval"),
    )
    t.merge(_obatch(spark, 1, [(2, "a"), (2, "b")]), 0)
    t.merge(_obatch(spark, 2, [(2, "a"), (2, "c")]), 1)
    m = t._load()

    # rewrite the manifest dir as an r3-style head: full map, embedded
    # snapshot buckets, no kind/ckpt metadata
    v1 = {
        "format_version": 1,
        "version": m["version"],
        "num_buckets": m["num_buckets"],
        "key_cols": list(t.key_cols),
        "retained_snapshots": 16,
        "merge_mode": "cow",
        "order_cols": ["lsn", "seqval"],
        "cluster_by": None,
        "bloom_filter_cols": None,
        "schema": m["schema"],
        "buckets": dict(m["buckets"]),
        "dirs": dict(m["dirs"]),
        "versions": {
            v: {
                "schema": e["schema"],
                "buckets": dict(t._state_at(e["commit_seq"])["buckets"]),
                "epoch_id": e["epoch_id"],
            }
            for v, e in m["versions"].items()
        },
    }
    for name in fsio.listdir(t._manifest_dir):
        fsio.delete(os.path.join(t._manifest_dir, name))
    fsio.create_exclusive(t._mpath(7), json.dumps(v1))  # arbitrary old seq

    t2 = ParquetMergeTable(spark, str(tmp_path / "t"))  # key_cols from manifest
    assert t2.key_cols == t.key_cols
    got = {r["path"]: r["content"] for r in t2.read().collect()}
    assert got == {"a": "c2", "b": "c1", "c": "c2"}
    # time travel reads the EMBEDDED map (no chain exists to fold)
    v1_snap = {r["path"]: r["content"] for r in t2.read_version(1).collect()}
    assert v1_snap == {"a": "c1", "b": "c1"}

    # next commit upgrades: the v1 full manifest doubles as the chain's
    # checkpoint (it carries the complete map), so the new head is a v2
    # delta folded onto it; new snapshots carry no bucket maps; old + new
    # time travel both still work
    t2.merge(_obatch(spark, 3, [(2, "d")]), 2)
    seq, head, _ = _head_manifest(t2)
    assert seq == 8 and head["kind"] == "delta" and head["ckpt_seq"] == 7
    m2 = t2._load()
    assert "buckets" in m2["versions"]["1"]      # legacy entry kept embedded
    assert "buckets" not in m2["versions"]["3"]  # new entry chain-backed
    assert {r["path"] for r in t2.read_version(3).collect()} == {"a", "b", "c", "d"}
    assert {r["path"] for r in t2.read_version(1).collect()} == {"a", "b"}
    # tombstone stats stay off for legacy tables: expire uses the scan path
    t2.merge(_obatch(spark, 4, [(1, "a")]), 3)
    t2.expire_tombstones(below_lsn=100, epoch_id=9)
    assert {r["path"] for r in t2.read().collect()} == {"b", "c", "d"}


def test_wide_metrics_off_merge_keeps_exact_tombstone_stats(
    spark, tmp_path, monkeypatch
):
    """VERDICT r4 #4 'done' gate: a metrics-OFF merge touching far more
    than 16 buckets must still record EXACT per-bucket tombstone stats
    (footer-pruned read of the just-written directory), so the subsequent
    expire_tombstones reads only buckets truly holding expired tombstones
    — the former whole-batch charge flagged every touched bucket."""
    t = ParquetMergeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, num_buckets=64,
        order_cols=("lsn", "seqval"),
    )
    # ONE wide batch: ~64 buckets touched, metrics off, deletes on 2 keys
    rows = [(2, f"p{i}") for i in range(120)] + [(1, "p3"), (1, "p77")]
    t.merge(_obatch(spark, 1, rows), 0, collect_metrics=False)

    m = t._load()
    tomb_buckets = {int(b) for b in m.get("bstats", {})}
    assert 1 <= len(tomb_buckets) <= 2  # exact: only the delete keys' buckets
    assert all(s[0] == 1 and s[1] == 1 for s in m["bstats"].values())

    reads = []
    orig = ParquetMergeTable._read_dirs

    def spy(self, dirs, schema):
        reads.append(list(dirs))
        return orig(self, dirs, schema)

    monkeypatch.setattr(ParquetMergeTable, "_read_dirs", spy)
    t.expire_tombstones(below_lsn=100, epoch_id=9)
    assert len(reads) == 1
    got_buckets = {int(d.rsplit("bucket=", 1)[1]) for d in reads[0]}
    assert got_buckets == tomb_buckets
    assert t._load().get("bstats", {}) == {}
    paths = {r["path"] for r in t.read().collect()}
    assert "p3" not in paths and "p77" not in paths and len(paths) == 118
