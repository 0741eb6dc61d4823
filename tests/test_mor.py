"""Merge-on-read mode: delta appends, read-time compaction, governor."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable, _versions_of

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


def _row(lsn, ct, path, content=None, seq=0):
    return {"lsn": lsn, "seqval": seq, "change_type": ct, "repo": "r", "path": path,
            "content": content}


def _mor(spark, root, num_buckets=4):
    return ParquetMergeTable.create(
        spark, root, PAYLOAD, num_buckets=num_buckets,
        order_cols=("lsn", "seqval"), merge_mode="mor",
    )


def _state(table):
    return {r["path"]: r["content"] for r in table.read().collect()}


def test_mor_upsert_delete_cycle(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    r1 = t.merge(spark.createDataFrame(
        [_row(1, 2, "a", "v1"), _row(1, 2, "b", "v1", seq=1)], schema=SCHEMA), 0)
    assert r1.upserts == 2 and r1.deletes == 0 and r1.raw_events == 2
    assert _state(t) == {"a": "v1", "b": "v1"}

    r2 = t.merge(spark.createDataFrame(
        [_row(2, 4, "a", "v2"), _row(2, 1, "b", None, seq=1)], schema=SCHEMA), 1)
    assert r2.upserts == 1 and r2.deletes == 1
    assert _state(t) == {"a": "v2"}  # delete applied, newer content wins

    # late-arriving OLDER event must lose (tombstone + newer-wins)
    t.merge(spark.createDataFrame(
        [_row(0, 2, "a", "stale"), _row(0, 2, "b", "resurrect?")], schema=SCHEMA), 2)
    assert _state(t) == {"a": "v2"}


def test_mor_writes_are_o_batch_not_o_table(spark, tmp_path):
    """The MOR scale property: after loading many keys, a 1-key merge
    writes exactly 1 row (COW would rewrite the whole touched bucket)."""
    t = _mor(spark, str(tmp_path / "t"), num_buckets=1)  # worst case: 1 bucket
    big = [_row(1, 2, f"p{i}", f"v{i}", seq=i) for i in range(500)]
    t.merge(spark.createDataFrame(big, schema=SCHEMA), 0)
    r = t.merge(spark.createDataFrame([_row(2, 4, "p7", "NEW")], schema=SCHEMA), 1)
    assert sum(r.partition_lineage.values()) == 1  # one delta row written
    got = _state(t)
    assert got["p7"] == "NEW" and len(got) == 500


def test_mor_out_of_order_epochs_converge(spark, tmp_path):
    rows = [_row(i, 2 if i % 3 else 4, f"p{i % 5}", f"v{i}", seq=0) for i in range(30)]
    df = spark.createDataFrame(rows, schema=SCHEMA)
    t = _mor(spark, str(tmp_path / "t"))
    for eid, lo in enumerate(reversed(range(0, 30, 10))):  # epochs newest-first
        t.merge(df.where((F.col("lsn") >= lo) & (F.col("lsn") < lo + 10)), eid)
    # oracle: plain LWW
    want = {f"p{i % 5}": f"v{i}" for i in range(30)}
    assert _state(t) == {p: want[p] for p in want}


def test_mor_idempotent_replay_duplicate_delta(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    batch = spark.createDataFrame(
        [_row(1, 2, "a", "v1"), _row(2, 1, "b")], schema=SCHEMA)
    t.merge(batch, 0)
    before = _state(t)
    t.merge(batch, 0)  # crash-replay re-applies the same epoch
    assert _state(t) == before == {"a": "v1"}


def test_mor_compact_table_folds_delta_chains(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"), num_buckets=1)
    for i in range(12):
        t.merge(spark.createDataFrame([_row(i, 2, "a", f"v{i}")], schema=SCHEMA), i)
    m = t._load()
    assert len(_versions_of(m["buckets"]["0"])) == 12  # chain grew per epoch
    v = t.compact_table(max_deltas=8)
    m2 = t._load()
    assert _versions_of(m2["buckets"]["0"]) == [v]  # folded to one base
    assert _state(t) == {"a": "v11"}
    # under the threshold -> no-op
    assert t.compact_table(max_deltas=8) == v
    # vacuum now reclaims the dead delta dirs; reads still correct
    removed = t.vacuum(keep_versions=1, grace_seconds=0)
    assert removed and _state(t) == {"a": "v11"}


def test_mor_schema_evolution_mid_stream(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    t.merge(spark.createDataFrame([_row(1, 2, "a", "v1")], schema=SCHEMA), 0)
    b2 = spark.createDataFrame(
        [{**_row(2, 2, "b", "v2"), "stars": 5}], schema=SCHEMA + ", stars long")
    t.merge(b2, 1)
    got = {r["path"]: (r["content"], r["stars"]) for r in t.read().collect()}
    assert got == {"a": ("v1", None), "b": ("v2", 5)}  # base rows read as null


def test_mor_full_replay_matches_oracle(spark, tmp_path):
    """End-to-end: pipeline.replay in merge_mode='mor' reproduces the
    pandas oracle exactly (FIXTURES F3 golden scenario)."""
    import hashlib

    from cdc_tools_spark.pipeline import ReplayConfig, replay
    from tests.conftest import EVENT_SCHEMA, person_scenario

    events, oracle = person_scenario()
    log = spark.createDataFrame(events, schema=EVENT_SCHEMA)
    cfg = ReplayConfig(epoch_events=6, num_buckets=8, epoch_strategy="exact",
                       merge_mode="mor")
    replay(spark, log, str(tmp_path / "t"), str(tmp_path / "s"), config=cfg)
    t = ParquetMergeTable(spark, str(tmp_path / "t"))
    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert set(got) == set(oracle)
    for k, v in oracle.items():
        assert hashlib.sha256(str(got[k]).encode()).hexdigest() == hashlib.sha256(
            str(v["content"]).encode()
        ).hexdigest()


def test_mor_rescale_buckets(spark, tmp_path):
    """rescale() on a MOR table folds delta chains into the new bucket
    layout (read-time compaction feeds the rewrite); subsequent merges
    append deltas under the new count."""
    t = _mor(spark, str(tmp_path / "t"), num_buckets=2)
    for i in range(5):
        t.merge(spark.createDataFrame(
            [_row(i, 2, f"p{i}", f"v{i}"), _row(i, 4, "p0", f"u{i}")],
            schema=SCHEMA), i)
    before = _state(t)
    t.rescale(8)
    assert _state(t) == before
    m = t._load()
    assert m["num_buckets"] == 8
    t.merge(spark.createDataFrame([_row(9, 2, "p1", "NEW")], schema=SCHEMA), 9)
    got = _state(t)
    assert got["p1"] == "NEW" and got["p0"] == "u4"
