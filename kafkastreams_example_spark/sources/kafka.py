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

Deployment note: the Kafka connector artifact
(org.apache.spark:spark-sql-kafka-0-10_2.13) is not bundled with a
plain pyspark install (and is absent in this environment) — ship it
via spark-submit --packages / cluster classpath. The decode/encode
transforms below are connector-independent and fully tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LOG_SCHEMA


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """S1 source contract as data: subscribe-by-topic (the reference
    consumes one named input topic, KafkaStreamsApplication.java:108),
    startingOffsets=latest matching AUTO_OFFSET_RESET_CONFIG=latest
    (KafkaStreamsApplication.java:65). Split out from the reader build
    so the contract is assertable without a broker or connector jar."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: raw kafka stream with key/value bytes + record timestamp."""
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap_servers, topic, starting_offsets))
        .load()
    )


CORRUPT_FIELD = "_corrupt_record"


def decode_log_events(raw: DataFrame, mode: str = "PERMISSIVE") -> DataFrame:
    """S2: bytes → typed LogEvent columns, keeping key + record timestamp.

    mode="PERMISSIVE" (default): output is key string, event_time
    timestamp, event struct<LOG_SCHEMA + _corrupt_record>. PERMISSIVE
    from_json does NOT return a null struct on malformed input — it
    returns all-null fields — so reliable dead-letter detection needs
    columnNameOfCorruptRecord: the field carries the raw payload on
    parse failure and is null on success. This is the documented
    semantic upgrade over the reference's hard crash.

    mode="FAILFAST": exact Jackson-strictness parity — malformed JSON
    raises at execution (JsonDeserializer.java:33-34 wraps the parse
    error as SerializationException and kills the app). No corrupt
    field in the schema; do not pair with split_dead_letters.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    if mode == "FAILFAST":
        event = F.from_json(
            F.col("value").cast("string"), LOG_SCHEMA, {"mode": "FAILFAST"}
        )
    else:
        schema = StructType(
            list(LOG_SCHEMA.fields) + [StructField(CORRUPT_FIELD, StringType())]
        )
        event = F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_FIELD},
        )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("event_time"),
        event.alias("event"),
    )


def split_dead_letters(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split on parse success; good rows shed the corrupt
    marker field, dead rows keep the raw payload for replay."""
    corrupt = F.col("event").getField(CORRUPT_FIELD)
    good = decoded.filter(corrupt.isNull()).withColumn(
        "event", F.col("event").dropFields(CORRUPT_FIELD)
    )
    dead = decoded.filter(corrupt.isNotNull()).select(
        "key", "event_time", corrupt.alias("raw_payload")
    )
    return good, dead


def encode_log_events(decoded: DataFrame, key_col: str = "key", event_col: str = "event") -> DataFrame:
    """E1: typed record → (key, value-json) ready for the kafka sink."""
    return decoded.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.col(event_col)).alias("value"),
    )


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_location: str
) -> dict[str, str]:
    """K1 sink contract as data: produce to one named output topic
    (KafkaStreamsApplication.java:110-111) with a checkpoint directory
    standing in for Streams' local state/offset commit dir."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_location,
    }


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
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint_location))
        .trigger(processingTime=trigger_interval)
        .start()
    )
