"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full CDC replay → final table
state with sha256 parity column) at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator with its DuckDB oracle.
Implementations live in :mod:`cdc_tools_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_tools_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC replay (epoch plan → compaction → bucketed
    MERGE → commit log) over the sf0.001 changelog; returns the final lake
    table state with the sha256(content) parity column."""
    return _q.q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
