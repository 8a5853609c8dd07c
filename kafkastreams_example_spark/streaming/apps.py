"""Application entry points — the C1 config/lifecycle surface of the
reference, Spark-first.

Reference behavior reproduced:
- properties-file configuration with the same keys the reference reads
  (input/output topic, bootstrap servers, application id —
  streamconfig.properties, KStreamDistinct.java:172-179,190-196);
- commit interval 1000 ms → 1 s processing-time trigger
  (KafkaStreamsApplication.java:63);
- auto.offset.reset=latest → startingOffsets=latest
  (KafkaStreamsApplication.java:65);
- shutdown hook → StreamingQuery.stop() on signal
  (KafkaStreamsApplication.java:74-80).

Topic administration (A1, KStreamDistinct.java:155-170) is gated
behind confluent-kafka, which is optional — brokers usually auto-create
in the environments these apps target, and a query engine shouldn't
hard-depend on admin rights.
"""

from __future__ import annotations

import signal
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.kafka import (
    decode_log_events,
    encode_log_events,
    read_kafka_stream,
    split_dead_letters,
    write_kafka_stream,
)
from .dedup_refresh import dedup_refresh_stream
from .pipelines import dedup_pipeline_within_watermark, filter_pipeline


@dataclass(frozen=True)
class AppConfig:
    """The reference's properties surface (streamconfig.properties)."""

    application_id: str
    bootstrap_servers: str
    input_topic: str
    output_topic: str
    checkpoint_location: str
    trigger_interval: str = "1 second"  # COMMIT_INTERVAL_MS_CONFIG=1000
    starting_offsets: str = "latest"  # AUTO_OFFSET_RESET_CONFIG


def load_properties(path: str) -> dict[str, str]:
    """Minimal java-.properties reader (key=value, # comments) — the
    loadEnvProperties analog (KStreamDistinct.java:172-179)."""
    props: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            key, _, value = line.partition("=")
            props[key.strip()] = value.strip()
    return props


def config_from_properties(props: dict[str, str], checkpoint_location: str) -> AppConfig:
    return AppConfig(
        application_id=props.get("application.id", "kafkastreams-example-spark"),
        bootstrap_servers=props.get("bootstrap.servers", "localhost:9092"),
        input_topic=props["input.topic.name"],
        output_topic=props["output.topic.name"],
        checkpoint_location=checkpoint_location,
        starting_offsets="latest" if props.get("auto.offset.reset", "latest") == "latest" else "earliest",
    )


def build_filter_app(spark: SparkSession, conf: AppConfig):
    """Topology 1 (KafkaStreamsApplication.java:92-114):
    kafka → decode → filter(level==INFO) → encode → kafka."""
    raw = read_kafka_stream(spark, conf.bootstrap_servers, conf.input_topic, conf.starting_offsets)
    good, _dead = split_dead_letters(decode_log_events(raw))
    filtered = filter_pipeline(good)
    return write_kafka_stream(
        encode_log_events(filtered),
        conf.bootstrap_servers,
        conf.output_topic,
        conf.checkpoint_location,
        conf.trigger_interval,
    )


def dedup_topology(
    decoded: DataFrame, exact_parity: bool = False, evict_state: bool = True
):
    """The dedup transform between source and sink (KStreamDistinct.java:
    145-151): windowed dedup on exception_class → not-null filter →
    encode. Takes decoded (key, event_time, event) rows, returns
    (key STRING, value STRING) ready for the Kafka sink.

    exact_parity=True swaps in the refresh-on-duplicate stateful
    processor. The record payload is encoded to its sink form FIRST and
    carried through the stateful function's output schema — re-joining
    survivors to the source stream would be a second stateful op, which
    Structured Streaming restricts, and any synthetic row id would be
    replay-unstable (see dedup_refresh_stream). evict_state must be
    False when driven with Trigger.AvailableNow (pending
    processing-time timers never fire, the query never terminates);
    True for the continuous production trigger.
    """
    from pyspark.sql import functions as F

    if exact_parity:
        keyed = decoded.select(
            F.col("event.exception.exception_class").alias("dedup_id"),
            F.col("event_time"),
            F.col("key"),
            F.to_json(F.col("event")).alias("value"),
        )
        survivors = dedup_refresh_stream(
            keyed, payload_cols=("key", "value"), evict_state=evict_state
        )
        return survivors.select("key", "value")
    return encode_log_events(dedup_pipeline_within_watermark(decoded))


def build_dedup_app(spark: SparkSession, conf: AppConfig, exact_parity: bool = False):
    """Topology 2 (KStreamDistinct.java:129-153): kafka → decode →
    windowed dedup on exception_class → not-null filter → encode →
    kafka. exact_parity=True uses the refresh-on-duplicate stateful
    processor (evicting state — continuous trigger)."""
    raw = read_kafka_stream(spark, conf.bootstrap_servers, conf.input_topic, conf.starting_offsets)
    good, _dead = split_dead_letters(decode_log_events(raw))
    out = dedup_topology(good, exact_parity=exact_parity, evict_state=True)
    return write_kafka_stream(
        out,
        conf.bootstrap_servers,
        conf.output_topic,
        conf.checkpoint_location,
        conf.trigger_interval,
    )


def install_shutdown_hook(query) -> None:
    """SIGTERM/SIGINT → query.stop(), the shutdown-hook analog
    (KafkaStreamsApplication.java:74-80)."""

    def _stop(signum, frame):
        query.stop()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)


def create_topics(bootstrap_servers: str, topics: list[str], partitions: int = 1) -> bool:
    """A1 topic admin (KStreamDistinct.java:155-170); optional —
    returns False when no admin client library is available."""
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # type: ignore
    except ImportError:
        return False
    client = AdminClient({"bootstrap.servers": bootstrap_servers})
    client.create_topics([NewTopic(t, num_partitions=partitions, replication_factor=1) for t in topics])
    return True
