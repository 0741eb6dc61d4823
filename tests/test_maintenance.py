from pyspark.sql import types as T

from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable

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


def _row(lsn, ct, path, content=None):
    return {"lsn": lsn, "seqval": 0, "change_type": ct, "repo": "r", "path": path,
            "content": content}


def test_vacuum_removes_dead_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    table = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=2)
    for i in range(4):  # every merge rewrites both buckets → old versions die
        table.merge(
            spark.createDataFrame(
                [_row(i, 2, "a", f"v{i}"), _row(i, 2, "b", f"v{i}")], schema=SCHEMA
            ),
            i,
        )
    removed = table.vacuum(keep_versions=1, grace_seconds=0)
    assert removed and all(v < 4 for v in removed)
    got = {r["path"]: r["content"] for r in table.read().collect()}
    assert got == {"a": "v3", "b": "v3"}
    assert table.read_version(4).count() == 2  # newest snapshot still travels


def test_expire_tombstones(spark, tmp_path):
    root = str(tmp_path / "t")
    ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=2, order_cols=("lsn", "seqval")
    )
    table = ParquetMergeTable(spark, root)
    table.merge(
        spark.createDataFrame(
            [_row(1, 2, "a", "v1"), _row(2, 1, "a"), _row(3, 2, "b", "v1")],
            schema=SCHEMA,
        ),
        0,
    )
    m = table._load()
    raw = table._read_dirs(
        table._leaf_dirs(m),
        __import__("pyspark").sql.types.StructType.fromJson(
            __import__("json").loads(m["schema"])
        ),
    )
    assert raw.where("_tombstone").count() == 1  # delete of 'a' persisted
    table.expire_tombstones(below_lsn=10, epoch_id=1)
    m = table._load()
    raw = table._read_dirs(
        m and table._leaf_dirs(m),
        __import__("pyspark").sql.types.StructType.fromJson(
            __import__("json").loads(m["schema"])
        ),
    )
    assert raw.where("_tombstone").count() == 0
    assert {r["path"] for r in table.read().collect()} == {"b"}

    # late batch BELOW the watermark must never arrive; one above still works
    table.merge(spark.createDataFrame([_row(12, 2, "c", "v9")], schema=SCHEMA), 2)
    assert {r["path"] for r in table.read().collect()} == {"b", "c"}


def test_vacuum_keeps_dirs_referenced_by_retained_snapshots(spark, tmp_path):
    """Regression (ADVICE r1 #2): a retained snapshot's bucket map may
    point at *older* version dirs for buckets unchanged at that snapshot;
    vacuum must keep those dirs or time travel breaks."""
    root = str(tmp_path / "t")
    # many buckets so each merge touches only the key's own bucket
    table = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=8)
    table.merge(spark.createDataFrame([_row(0, 2, "a", "a0")], schema=SCHEMA), 0)  # v1
    table.merge(spark.createDataFrame([_row(1, 2, "b", "b0")], schema=SCHEMA), 1)  # v2
    table.merge(spark.createDataFrame([_row(2, 2, "c", "c0")], schema=SCHEMA), 2)  # v3
    # keep 2 snapshots: v3 and v2; v2's bucket map references v1 for "a"
    removed = table.vacuum(keep_versions=2, grace_seconds=0)
    assert 1 not in removed, "v1 is referenced by retained snapshot v2"
    v2 = {r["path"]: r["content"] for r in table.read_version(2).collect()}
    assert v2 == {"a": "a0", "b": "b0"}  # time travel to v2 fully intact


def test_read_version_expired_raises_descriptive_error(spark, tmp_path):
    import pytest

    root = str(tmp_path / "t")
    table = ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=2, retained_snapshots=2
    )
    for i in range(4):
        table.merge(spark.createDataFrame([_row(i, 2, "a", f"v{i}")], schema=SCHEMA), i)
    with pytest.raises(ValueError, match="snapshot 1 expired or unknown"):
        table.read_version(1)
    assert table.read_version(4).count() == 1  # inside the window


def test_rescale_buckets_preserves_reads_and_merges(spark, tmp_path):
    """Bucket split: grow 2 → 8 buckets; reads unchanged, later merges use
    the new routing (the 100-TB growth path for a fixed create-time count)."""
    from cdc_tools_spark.lake.parquet_merge import suggest_num_buckets

    root = str(tmp_path / "t")
    table = ParquetMergeTable.create(spark, root, PAYLOAD, num_buckets=2)
    rows = [_row(i, 2, f"p{i}", f"v{i}") for i in range(10)]
    table.merge(spark.createDataFrame(rows, schema=SCHEMA), 0)

    before = {r["path"]: r["content"] for r in table.read().collect()}
    table.rescale(8)
    after = {r["path"]: r["content"] for r in table.read().collect()}
    assert after == before
    assert table._load()["num_buckets"] == 8

    table.merge(spark.createDataFrame([_row(99, 2, "p3", "NEW"),
                                       _row(99, 1, "p4", None)], schema=SCHEMA), 1)
    got = {r["path"]: r["content"] for r in table.read().collect()}
    assert got["p3"] == "NEW" and "p4" not in got and len(got) == 9

    # sizing helper: 100 TB at 1 GiB/bucket -> 131072 buckets
    assert suggest_num_buckets(100 * (1 << 40)) == 131072


def _entries(table):
    m = table._load()
    return {b: (tuple(v) if isinstance(v, list) else v) for b, v in m["buckets"].items()}


def test_incremental_rescale_cow(spark, tmp_path):
    """begin_rescale is manifest-only; merges split the groups they touch as
    a side effect; rescale_step splits quiescent groups in bounded batches;
    untouched groups' entries never change (VERDICT r2 #3a)."""
    root = str(tmp_path / "t")
    table = ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=4, retained_snapshots=1
    )
    rows = [_row(i, 2, f"p{i}", f"v{i}") for i in range(40)]
    table.merge(spark.createDataFrame(rows, schema=SCHEMA), 0)
    before_state = {r["path"]: r["content"] for r in table.read().collect()}

    table.begin_rescale(8)  # zero data I/O
    m = table._load()
    assert m["num_buckets"] == 8 and m["rescale"]["old_n"] == 4
    for b in range(4):  # sibling groups alias the old bucket's data
        assert m["buckets"][str(b)] == m["buckets"][str(b + 4)]
    assert {r["path"]: r["content"] for r in table.read().collect()} == before_state

    # a merge touching one key splits exactly that key's sibling group
    pre = _entries(table)
    table.merge(spark.createDataFrame([_row(99, 2, "p3", "NEW")], schema=SCHEMA), 1)
    post = _entries(table)
    changed = {int(b) for b in post if post[b] != pre[b]}
    assert changed, "the touched group must split"
    groups = {b % 4 for b in changed}
    assert len(groups) == 1  # exactly one sibling group rewritten
    g = groups.pop()
    assert changed <= {g, g + 4}
    expected = dict(before_state, p3="NEW")
    assert {r["path"]: r["content"] for r in table.read().collect()} == expected

    # bounded maintenance steps split the quiescent groups
    pre = _entries(table)
    split1 = table.rescale_step(max_groups=1)
    assert len(split1) == 1
    post = _entries(table)
    assert {int(b) % 4 for b in post if post[b] != pre[b]} == set(split1)
    while table.rescale_step(max_groups=8):
        pass
    assert table.rescale_step() == []
    m = table._load()
    assert "rescale" not in m, "record retires once nothing pre-split is referenced"
    assert {r["path"]: r["content"] for r in table.read().collect()} == expected

    # routing is fully on the new count afterwards
    table.merge(spark.createDataFrame([_row(100, 1, "p5", None)], schema=SCHEMA), 2)
    got = {r["path"]: r["content"] for r in table.read().collect()}
    assert "p5" not in got and got["p3"] == "NEW" and len(got) == 39


def test_incremental_rescale_mor(spark, tmp_path):
    """MOR mid-rescale: delta appends stay O(batch) (no split needed —
    shared bases are read-deduped), reads stay correct, and compaction
    folds-and-splits whole sibling groups."""
    root = str(tmp_path / "t")
    ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=4, order_cols=("lsn", "seqval"),
        merge_mode="mor", retained_snapshots=1,
    )
    table = ParquetMergeTable(spark, root)
    rows = [_row(i, 2, f"p{i}", f"v{i}") for i in range(30)]
    table.merge(spark.createDataFrame(rows, schema=SCHEMA), 0)

    table.begin_rescale(8)
    # a delta append mid-rescale: update + delete land correctly
    table.merge(
        spark.createDataFrame(
            [_row(50, 2, "p7", "NEW"), _row(50, 1, "p8", None)], schema=SCHEMA
        ),
        1,
    )
    got = {r["path"]: r["content"] for r in table.read().collect()}
    assert got["p7"] == "NEW" and "p8" not in got and len(got) == 29

    # compaction folds + splits every over-threshold group
    table.compact_table(max_deltas=0)
    while table.rescale_step(max_groups=8):
        pass
    table.rescale_step()
    m = table._load()
    assert "rescale" not in m
    assert all(len(v) <= 1 for v in m["buckets"].values() if isinstance(v, list))
    got = {r["path"]: r["content"] for r in table.read().collect()}
    assert got["p7"] == "NEW" and "p8" not in got and len(got) == 29


def test_expire_tombstones_rewrites_only_tombstone_buckets(spark, tmp_path):
    """Tombstone GC is targeted: buckets without expired tombstones keep
    their version entries untouched (VERDICT r2 #3b)."""
    import json as _json

    import pyspark.sql.functions as F
    from pyspark.sql import types as T2

    root = str(tmp_path / "t")
    ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=8, order_cols=("lsn", "seqval")
    )
    table = ParquetMergeTable(spark, root)
    rows = [_row(i, 2, f"p{i}", f"v{i}") for i in range(16)]
    table.merge(spark.createDataFrame(rows, schema=SCHEMA), 0)
    table.merge(
        spark.createDataFrame([_row(20, 1, "p0"), _row(20, 1, "p9")], schema=SCHEMA), 1
    )

    m = table._load()
    schema = T2.StructType.fromJson(_json.loads(m["schema"]))
    raw = table._read_dirs(table._leaf_dirs(m), schema)
    tomb_buckets = {
        r["_b"]
        for r in raw.where("_tombstone")
        .select(table._bucket_expr(8).alias("_b"))
        .distinct()
        .collect()
    }
    assert tomb_buckets  # sanity

    pre = _entries(table)
    table.expire_tombstones(below_lsn=100, epoch_id=2)
    post = _entries(table)
    changed = {int(b) for b in post if post[b] != pre[b]}
    assert changed == tomb_buckets  # only tombstone-bearing buckets rewrote
    m = table._load()
    raw = table._read_dirs(table._leaf_dirs(m), schema)
    assert raw.where("_tombstone").count() == 0
    got = {r["path"] for r in table.read().collect()}
    assert got == {f"p{i}" for i in range(16)} - {"p0", "p9"}

    # nothing expired -> no new version, zero writes
    v = m["version"]
    assert table.expire_tombstones(below_lsn=100, epoch_id=3) == v
