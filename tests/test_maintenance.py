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
    removed = table.vacuum(keep_versions=1)
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
