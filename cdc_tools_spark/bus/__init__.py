"""Changelog bus: keyed JSON serialize/deserialize + file-backed topic.

The Spark-native equivalent of the reference's Kafka hop (pipeline shape 1,
DB → Kafka → sink): a keyed JSON changelog publisher/consumer pair and a
partitioned, offset-addressed topic log that Structured Streaming or batch
replay can tail. See :mod:`cdc_tools_spark.bus.json_codec` and
:mod:`cdc_tools_spark.bus.file_topic`.
"""

from cdc_tools_spark.bus.avro_bus import (
    changelog_avro_schema,
    deserialize_changelog_avro,
    serialize_changelog_avro,
)
from cdc_tools_spark.bus.file_topic import FileTopic
from cdc_tools_spark.bus.json_codec import (
    changelog_value_schema,
    deserialize_changelog,
    serialize_changelog,
)
from cdc_tools_spark.bus.publish import (
    changelog_messages,
    kafka_sink_options,
    publish_changelog,
)

__all__ = [
    "FileTopic",
    "changelog_avro_schema",
    "changelog_messages",
    "kafka_sink_options",
    "publish_changelog",
    "changelog_value_schema",
    "deserialize_changelog",
    "deserialize_changelog_avro",
    "serialize_changelog",
    "serialize_changelog_avro",
]
