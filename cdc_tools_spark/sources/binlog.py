"""Ordered change-event log ("binlog") sources.

The engine's input contract (FIXTURES.md F2) mirrors the reference's
``ChangeRecord`` (CdcReader/Changes/ChangeRecord.cs:8-48) with the SQL Server
``__$operation`` encoding (CdcReader/Changes/ChangeType.cs:7-14):

    lsn:long, seqval:long, change_type:int, repo:string, path:string,
    commit:string, lang:string, content:string

``(lsn, seqval)`` is unique and totally ordered; ``lsn`` groups the events of
one transaction. Key = ``(repo, path)``.

Two generators:

* :func:`synthetic_binlog` — fully distributed, seed-deterministic generator
  built on ``spark.range``; every column is a pure function of the event id,
  so output is identical regardless of partitioning (safe for the
  two-parallelism scaling benchmark). Parameterized hot-key skew.
* :func:`changelog_from_events` — derives the same shape from the driver's
  ``events.parquet`` test table, with a DuckDB-runnable SQL twin
  (:func:`changelog_sql`) so the driver's oracle can reproduce it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Change-type encoding — parity with the reference (ChangeType.cs:7-14).
DELETE = 1
INSERT = 2
UPDATE_BEFORE = 3  # never applied (S3Uploader.cs:23,38 admit only {1,2,4})
UPDATE_AFTER = 4

KEY_COLS = ("repo", "path")
META_COLS = ("lsn", "seqval", "change_type")
PAYLOAD_COLS = ("commit", "lang", "content")

BINLOG_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("seqval", LongType(), False),
        StructField("change_type", IntegerType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)


def synthetic_binlog(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 10_000,
    txn_size: int = 4,
    n_repos: int = 100,
    hot_key_pct: int = 0,
    n_hot_keys: int = 1,
    content_chars: int = 256,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic distributed change-event log of ``n_events`` rows.

    Every column derives from the row id via ``xxhash64`` mixing — no
    ``rand()``, no driver-side loops — so the log is reproducible at any
    partitioning and any scale (the same generator runs at 10^10 events on a
    cluster; only ``n_events``/``num_partitions`` change).

    ``hot_key_pct`` routes that percentage of events onto ``n_hot_keys`` keys
    inside ``repo_0`` (FIXTURES.md F6 skew fixture).
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_events, 1, num_partitions)

    def mix(salt: int):
        # xxhash64 of (id, salt) — cheap JVM-side deterministic mixing.
        return F.xxhash64(F.col("id"), F.lit(seed + salt))

    uniform = F.pmod(mix(1), F.lit(n_keys))
    is_hot = (F.pmod(mix(2), F.lit(100)) < F.lit(hot_key_pct)) & (hot_key_pct > 0)
    kid = F.when(is_hot, F.pmod(mix(3), F.lit(n_hot_keys))).otherwise(uniform)

    ct_bucket = F.pmod(mix(4), F.lit(10))
    change_type = (
        F.when(ct_bucket == 0, F.lit(DELETE))
        .when(ct_bucket == 1, F.lit(UPDATE_BEFORE))
        .when(ct_bucket <= 3, F.lit(INSERT))
        .otherwise(F.lit(UPDATE_AFTER))
        .cast("int")
    )

    commit = F.sha2(F.concat(F.lit("commit:"), F.col("id").cast("string")), 256)
    # content is a pure function of (key, event id): replaying any prefix of
    # the log converges on the same bytes — the sha256-parity column.
    content_unit = F.sha2(
        F.concat(F.lit("content:"), kid.cast("string"), F.lit(":"), F.col("id").cast("string")),
        256,
    )
    content = F.substring(
        F.repeat(content_unit, (content_chars + 63) // 64), 1, content_chars
    )

    return df.select(
        (F.col("id") / txn_size).cast("long").alias("lsn"),
        F.pmod(F.col("id"), F.lit(txn_size)).cast("long").alias("seqval"),
        change_type.alias("change_type"),
        F.concat(F.lit("repo_"), F.pmod(kid, F.lit(n_repos)).cast("string")).alias("repo"),
        F.concat(F.lit("path_"), kid.cast("string")).alias("path"),
        commit.alias("commit"),
        F.element_at(
            F.array(F.lit("py"), F.lit("c"), F.lit("md"), F.lit("rs"), F.lit("go")),
            (F.pmod(mix(5), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        content.alias("content"),
    )


# ---------------------------------------------------------------------------
# Testdata-derived changelog (shared Spark/DuckDB derivation for the oracle)
# ---------------------------------------------------------------------------

_CHANGELOG_TEMPLATE = """
SELECT
  CAST((event_id - (event_id % 4)) / 4 AS BIGINT) AS lsn,
  CAST(event_id % 4 AS BIGINT) AS seqval,
  CAST(CASE event_type
         WHEN 'error' THEN 1
         WHEN 'click' THEN 2
         WHEN 'signup' THEN 2
         WHEN 'view' THEN 3
         WHEN 'purchase' THEN 4
         ELSE 2 END AS INT) AS change_type,
  'repo_' || CAST((user_id * 20 + event_id % 20) % 25 AS STRING) AS repo,
  'path_' || CAST(user_id * 20 + event_id % 20 AS STRING) AS path,
  md5(CAST(event_id AS STRING)) AS {q}commit{q},
  event_type AS lang,
  'c:' || CAST(user_id * 20 + event_id % 20 AS STRING) || ':' || CAST(event_id AS STRING) AS content
FROM events
"""


def changelog_sql(dialect: str = "duckdb") -> str:
    """The changelog derivation over the ``events`` view, per dialect.

    The only dialect difference is identifier quoting for the reserved word
    ``commit`` (backticks in Spark, double quotes in DuckDB).
    """
    q = "`" if dialect == "spark" else '"'
    return _CHANGELOG_TEMPLATE.format(q=q)


def changelog_from_events(
    spark: SparkSession, sf_dir: str, parallel: bool = True
) -> DataFrame:
    """F2-shaped change log derived from ``{sf_dir}/events.parquet``.

    Shares one SQL derivation with the DuckDB oracle so every downstream
    operator is oracle-checkable end to end.

    ``parallel`` routes the read through
    :func:`cdc_tools_spark.sources.scan.parallel_read` (unsplittable-input
    guard) — the right default for the heavy consumers (compaction, merge
    replays); pass ``False`` for plain scan→project consumers where the
    repartition costs more than the single-task scan (r7).
    """
    from cdc_tools_spark.sources.scan import parallel_read

    src = (
        parallel_read(spark, f"{sf_dir}/events.parquet")
        if parallel
        else spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    src.createOrReplaceTempView("events")
    return spark.sql(changelog_sql("spark"))


# The typed-payload changelog: same event derivation, payload exercising the
# reference's §1.2 type surface (ColumnSchema.cs:19-53 round-trips
# decimal/date/datetime alongside strings) — decimal(12,2), date, timestamp.
# Dialect-neutral SQL (no reserved identifiers), shared with the oracle.
TYPED_CHANGELOG_SQL = """
SELECT
  CAST((event_id - (event_id % 4)) / 4 AS BIGINT) AS lsn,
  CAST(event_id % 4 AS BIGINT) AS seqval,
  CAST(CASE event_type
         WHEN 'error' THEN 1
         WHEN 'click' THEN 2
         WHEN 'signup' THEN 2
         WHEN 'view' THEN 3
         WHEN 'purchase' THEN 4
         ELSE 2 END AS INT) AS change_type,
  'repo_' || CAST((user_id * 20 + event_id % 20) % 25 AS STRING) AS repo,
  'path_' || CAST(user_id * 20 + event_id % 20 AS STRING) AS path,
  CAST(value AS DECIMAL(12,2)) AS amount,
  CAST(ts AS DATE) AS event_date,
  ts AS event_ts,
  'c:' || CAST(event_id AS STRING) AS content
FROM events
"""


def typed_changelog_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-payload change log (decimal/date/timestamp) over events.parquet."""
    from cdc_tools_spark.sources.scan import parallel_read

    parallel_read(spark, f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(TYPED_CHANGELOG_SQL)
