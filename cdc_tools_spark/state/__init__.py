from cdc_tools_spark.state.commit_log import CommitLog, EpochCommit

__all__ = ["CommitLog", "EpochCommit"]
