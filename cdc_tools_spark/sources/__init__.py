from cdc_tools_spark.sources.binlog import (
    BINLOG_SCHEMA,
    changelog_from_events,
    changelog_sql,
    synthetic_binlog,
)

__all__ = [
    "BINLOG_SCHEMA",
    "changelog_from_events",
    "changelog_sql",
    "synthetic_binlog",
]
