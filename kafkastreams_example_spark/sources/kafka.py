"""Kafka source/sink builders — the S1/S2/E1/K1 surface of the reference.

Reference behavior reproduced (SURVEY.md §2a):
- S1 source subscribe (KafkaStreamsApplication.java:108-109) →
  spark.readStream.format("kafka"), startingOffsets=latest matching
  AUTO_OFFSET_RESET_CONFIG=latest (KafkaStreamsApplication.java:65).
- S2 JSON decode (JsonDeserializer.java:26-38) → from_json. Jackson
  throws on malformed/unknown-field input; from_json is PERMISSIVE
  (malformed → null struct). We surface that as a dead-letter split
  instead of crashing — a documented semantic upgrade (SURVEY.md §1).
- E1/K1 encode+produce (JsonSerializer.java:22-31,
  KafkaStreamsApplication.java:110-111) → to_json + kafka sink.

These builders only declare plans; nothing here needs a broker until
.start(), so unit tests drive the same transforms on batch DataFrames
(the TopologyTestDriver pattern, SURVEY.md §3 entry point 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LOG_SCHEMA


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: raw kafka stream with key/value bytes + record timestamp."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def decode_log_events(raw: DataFrame) -> DataFrame:
    """S2: bytes → typed LogEvent columns, keeping key + record timestamp.

    Output: key string, event_time timestamp, event struct<LOG_SCHEMA>.
    Malformed JSON yields event IS NULL (dead-letter rows) rather than the
    reference's hard failure (JsonDeserializer.java:33-34).
    """
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("event_time"),
        F.from_json(F.col("value").cast("string"), LOG_SCHEMA).alias("event"),
    )


def split_dead_letters(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split on parse success."""
    good = decoded.filter(F.col("event").isNotNull())
    dead = decoded.filter(F.col("event").isNull())
    return good, dead


def encode_log_events(decoded: DataFrame, key_col: str = "key", event_col: str = "event") -> DataFrame:
    """E1: typed record → (key, value-json) ready for the kafka sink."""
    return decoded.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.col(event_col)).alias("value"),
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    trigger_interval: str = "1 second",
):
    """K1: kafka sink, at-least-once, 1 s trigger ≈ the reference's
    COMMIT_INTERVAL_MS_CONFIG=1000 (KafkaStreamsApplication.java:63)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .trigger(processingTime=trigger_interval)
        .start()
    )
