"""P9: staging-document cell formatting — the S3 CSV hop's cell rules.

The reference serializes each compacted change into pipe-delimited staging
documents for Redshift COPY (S3Uploader.cs:79-107; cell formatting
:88-100): dates as ``yyyy-MM-dd``, everything else invariant ``ToString()``,
nulls as empty cells, ``|`` delimiter, columns in table order. Our engine's
merge consumes the compacted DataFrame directly — the staging hop is
unnecessary (SURVEY §7.5) — but the formatting surface itself is part of
what a reference user has (inspectable staging docs, COPY-compatible
exports), so it exists as pure JVM column expressions: ``date_format`` +
casts + ``concat_ws``, zero UDFs, reproducible bit-for-bit by any engine
with the same rules (the DuckDB oracle mirrors them with strftime).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T


def csv_cell(col: Column, dtype: T.DataType) -> Column:
    """One formatted cell: reference rules (S3Uploader.cs:88-100) — date →
    ``yyyy-MM-dd``, timestamp → ``yyyy-MM-dd HH:mm:ss``, anything else its
    canonical string form; null → empty cell."""
    if isinstance(dtype, T.DateType):
        s = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        s = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    else:
        s = col.cast("string")
    return F.coalesce(s, F.lit(""))


def csv_stage_line(
    df: DataFrame, cols: Sequence[str] | None = None, delimiter: str = "|"
) -> Column:
    """The pipe-delimited staging line for each row (columns in table
    order, the reference's doc-build loop S3Uploader.cs:79-107)."""
    names = list(cols) if cols is not None else list(df.columns)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    return F.concat_ws(delimiter, *[csv_cell(F.col(c), dtypes[c]) for c in names])


def stage_documents(
    compacted: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    delimiter: str = "|",
) -> DataFrame:
    """K2/K3 staging-doc split over a compacted batch: rows whose last
    change is a DELETE go to the delete doc as key-only lines
    (PutS3DeleteAsync, S3Uploader.cs:35-48); everything else to the upsert
    doc with the full column list (PutS3UpsertAsync, :21-33). Returns
    ``(doc_type, key_cols..., line)``."""
    from cdc_tools_spark.sources.binlog import DELETE

    is_del = F.col("change_type") == DELETE
    upsert_line = csv_stage_line(compacted, [*key_cols, *value_cols], delimiter)
    delete_line = csv_stage_line(compacted, list(key_cols), delimiter)
    return compacted.select(
        F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")).alias("doc_type"),
        *[F.col(c) for c in key_cols],
        F.when(is_del, delete_line).otherwise(upsert_line).alias("line"),
    )
