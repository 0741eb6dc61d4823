from cdc_tools_spark.streaming.tail import stream_tail

__all__ = ["stream_tail"]
