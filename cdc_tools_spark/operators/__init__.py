from cdc_tools_spark.operators.compaction import (
    compact_last_write_wins,
    split_upserts_deletes,
)
from cdc_tools_spark.operators.epochs import Epoch, plan_epochs
from cdc_tools_spark.operators.transactions import group_transactions

__all__ = [
    "Epoch",
    "compact_last_write_wins",
    "group_transactions",
    "plan_epochs",
    "split_upserts_deletes",
]
