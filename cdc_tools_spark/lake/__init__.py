from cdc_tools_spark.lake.base import LakeTable, MergeResult
from cdc_tools_spark.lake.iceberg import IcebergTable
from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable

__all__ = ["IcebergTable", "LakeTable", "MergeResult", "ParquetMergeTable"]
