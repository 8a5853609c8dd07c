"""File-source tests: CSV/JSON loaders with dead-letter splits, and the
streaming windowed-count pipeline."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafkastreams_example_spark.schema import LOG_SCHEMA
from kafkastreams_example_spark.sources.files import read_csv, read_jsonl
from kafkastreams_example_spark.streaming.pipelines import windowed_count_pipeline


def test_jsonl_dead_letter_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"a": 1, "b": "x"}),
                json.dumps({"a": 2, "b": "y"}),
                "{definitely not json",
            ]
        )
    )
    good, dead = read_jsonl(spark, str(p), "a INT, b STRING")
    assert {(r["a"], r["b"]) for r in good.collect()} == {(1, "x"), (2, "y")}
    assert dead.count() == 1


def test_csv_dead_letter_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n3,z\n")
    good, dead = read_csv(spark, str(p), "a INT, b STRING")
    assert {(r["a"], r["b"]) for r in good.collect()} == {(1, "x"), (3, "z")}
    assert dead.count() == 1


def test_app_config_from_properties(tmp_path):
    """C1 lifecycle parity: the reference's .properties surface parses
    into an AppConfig with the reference's defaults (1 s trigger =
    commit interval 1000 ms, startingOffsets latest)."""
    from kafkastreams_example_spark.streaming.apps import (
        config_from_properties,
        load_properties,
    )

    p = tmp_path / "streamconfig.properties"
    p.write_text(
        "# dedup app\n"
        "application.id=kafka-streams-distinct\n"
        "bootstrap.servers=broker:9092\n"
        "input.topic.name=splunknew\n"
        "output.topic.name=splunknew-distict-streams\n"
    )
    conf = config_from_properties(load_properties(str(p)), "/tmp/ckpt")
    assert conf.application_id == "kafka-streams-distinct"
    assert conf.input_topic == "splunknew"
    assert conf.output_topic == "splunknew-distict-streams"
    assert conf.trigger_interval == "1 second"
    assert conf.starting_offsets == "latest"


def test_topic_admin_degrades_without_library():
    from kafkastreams_example_spark.streaming.apps import create_topics

    assert create_topics("broker:9092", ["t1"]) is False


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch idempotent sink: batch dirs written once; replaying
    the same batch id is a no-op (simulated by re-invoking the sink fn
    with the replayed id)."""
    from kafkastreams_example_spark.streaming.foreach_sink import (
        idempotent_parquet_sink,
        start_foreach_batch,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text('{"a": 1}\n{"a": 2}')
    stream = spark.readStream.schema("a INT").json(str(src))
    out = tmp_path / "out"
    q = start_foreach_batch(
        stream, str(out), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    first = spark.read.parquet(str(out)).collect()
    assert sorted(r["a"] for r in first) == [1, 2]

    # simulate a post-failure replay of batch 0 with different content:
    # the sink must not overwrite the committed batch
    replay = spark.createDataFrame([(99,)], "a INT")
    idempotent_parquet_sink(str(out))(replay, 0)
    again = spark.read.parquet(str(out)).collect()
    assert sorted(r["a"] for r in again) == [1, 2]


def test_kafka_codec_dead_letter_roundtrip(spark):
    """decode → split → encode round trip: malformed payloads routed to
    the dead queue with the raw bytes preserved; good rows shed the
    corrupt marker and re-encode compactly (S2/E1 parity with
    PERMISSIVE upgrade, JsonDeserializer.java:33-34)."""
    import datetime

    from kafkastreams_example_spark.sources.kafka import (
        decode_log_events,
        encode_log_events,
        split_dead_letters,
    )

    rows = [
        ("k1", b'{"version":1,"level":"INFO","message":"ok"}'),
        ("k2", b"{{{not json"),
    ]
    raw = spark.createDataFrame(
        [(k, v, datetime.datetime(2024, 1, 1)) for k, v in rows],
        "key STRING, value BINARY, timestamp TIMESTAMP",
    )
    good, dead = split_dead_letters(decode_log_events(raw))
    assert [r["key"] for r in good.collect()] == ["k1"]
    assert "_corrupt_record" not in good.schema["event"].dataType.fieldNames()
    assert [(r["key"], r["raw_payload"]) for r in dead.collect()] == [("k2", "{{{not json")]
    enc = {r["key"]: r["value"] for r in encode_log_events(good).collect()}
    assert enc["k1"] == '{"version":1,"message":"ok","level":"INFO"}'


def test_kafka_decode_failfast_matches_jackson_strictness(spark):
    """FAILFAST decode mode: malformed JSON raises at execution —
    exact parity with the reference serde's hard failure
    (JsonDeserializer.java:33-34 wraps the Jackson error as
    SerializationException and the app dies). Well-formed payloads
    decode identically to PERMISSIVE mode."""
    import datetime

    import pytest

    from kafkastreams_example_spark.sources.kafka import decode_log_events

    ok = spark.createDataFrame(
        [("k1", b'{"version":1,"level":"INFO","message":"ok"}',
          datetime.datetime(2024, 1, 1))],
        "key STRING, value BINARY, timestamp TIMESTAMP",
    )
    row = decode_log_events(ok, mode="FAILFAST").collect()[0]
    assert row["event"]["level"] == "INFO" and row["event"]["version"] == 1
    assert "_corrupt_record" not in row["event"].asDict()

    bad = spark.createDataFrame(
        [("k2", b"{{{not json", datetime.datetime(2024, 1, 1))],
        "key STRING, value BINARY, timestamp TIMESTAMP",
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        decode_log_events(bad, mode="FAILFAST").collect()


def test_windowed_count_pipeline_streaming(spark, tmp_path):
    """Streaming tumbling-window aggregation over decoded LogEvents
    (complete mode: closed and open windows both visible)."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"ts_ms": 0, "level": "INFO"},
        {"ts_ms": 10_000, "level": "INFO"},
        {"ts_ms": 3_600_000 + 5_000, "level": "ERROR"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts_ms BIGINT, level STRING")
        .json(str(src))
        .select(
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            F.struct(F.col("level").alias("level")).alias("event"),
        )
    )
    out = windowed_count_pipeline(stream, window="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].isoformat(), r["level"]): r["n"]
        for r in spark.table("win_counts").collect()
    }
    assert got == {
        ("1970-01-01T00:00:00", "INFO"): 2,
        ("1970-01-01T01:00:00", "ERROR"): 1,
    }


def test_kafka_source_sink_contract_without_broker(spark, monkeypatch, tmp_path):
    """Broker-less S1/K1 contract: assert the EXACT options and build
    sequence the Kafka builders produce — format 'kafka', subscribe by
    named topic (not assign/pattern), startingOffsets=latest mirroring
    the reference's AUTO_OFFSET_RESET_CONFIG=latest
    (KafkaStreamsApplication.java:65,108-111), checkpoint wiring, and
    the 1 s processing-time trigger mirroring COMMIT_INTERVAL_MS=1000.
    The connector jar is absent in this environment, so load()/start()
    are intercepted at the Python API boundary — everything up to them
    is the real builder code path."""
    from pyspark.sql.streaming.readwriter import DataStreamReader, DataStreamWriter

    from kafkastreams_example_spark.sources.kafka import (
        kafka_sink_options,
        kafka_source_options,
        read_kafka_stream,
        write_kafka_stream,
    )

    # the declarative contracts themselves
    assert kafka_source_options("b:9092", "logs-input") == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "logs-input",
        "startingOffsets": "latest",
    }
    assert kafka_sink_options("b:9092", "logs-output", "/ckpt") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "logs-output",
        "checkpointLocation": "/ckpt",
    }

    # a real streaming frame (built-in rate source, no broker) — built
    # BEFORE the reader monkeypatch so the sink side exercises a genuine
    # streaming writeStream up to the intercepted start()
    encoded = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    ).selectExpr("CAST(value AS STRING) AS key", "'{}' AS value")

    # source wiring: capture what reaches the DataStreamReader
    src: dict = {"options": {}}
    monkeypatch.setattr(
        DataStreamReader, "format", lambda self, f: src.__setitem__("format", f) or self
    )

    def _roptions(self, **kw):
        src["options"].update(kw)
        return self

    monkeypatch.setattr(DataStreamReader, "options", _roptions)
    monkeypatch.setattr(DataStreamReader, "load", lambda self, *a, **k: "RAW_DF")
    assert read_kafka_stream(spark, "b:9092", "logs-input") == "RAW_DF"
    assert src == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "b:9092",
            "subscribe": "logs-input",
            "startingOffsets": "latest",
        },
    }

    # sink wiring: capture what reaches the DataStreamWriter
    sink: dict = {"options": {}}
    monkeypatch.setattr(
        DataStreamWriter, "format", lambda self, f: sink.__setitem__("format", f) or self
    )

    def _woptions(self, **kw):
        sink["options"].update(kw)
        return self

    def _trigger(self, **kw):
        sink["trigger"] = kw
        return self

    monkeypatch.setattr(DataStreamWriter, "options", _woptions)
    monkeypatch.setattr(DataStreamWriter, "trigger", _trigger)
    monkeypatch.setattr(DataStreamWriter, "start", lambda self, *a, **k: "QUERY")
    ckpt = str(tmp_path / "ckpt")
    assert write_kafka_stream(encoded, "b:9092", "logs-output", ckpt) == "QUERY"
    assert sink == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "b:9092",
            "topic": "logs-output",
            "checkpointLocation": ckpt,
        },
        "trigger": {"processingTime": "1 second"},
    }


BROKER_ENV = "SPARK_GRAFT_KAFKA_BOOTSTRAP"


@pytest.mark.skipif(
    not os.environ.get(BROKER_ENV),
    reason=f"no Kafka broker in this environment (set {BROKER_ENV}=host:port; "
    "also requires the spark-sql-kafka connector on the session classpath)",
)
def test_kafka_roundtrip_real_broker(spark, tmp_path):
    """S1/K1 against a REAL broker, auto-enabled wherever one exists:
    produce the reference pipeline's encoded events to a fresh topic
    via the kafka sink, consume them back earliest-offset, and check
    payload identity through the decode path. The broker-less contract
    test (above) pins the wiring; this pins the wire."""
    import uuid as _uuid

    from kafkastreams_example_spark.sources.kafka import (
        decode_log_events,
        encode_log_events,
    )

    bootstrap = os.environ[BROKER_ENV]
    topic = f"graft_smoke_{_uuid.uuid4().hex[:8]}"
    events = spark.createDataFrame(
        [(str(i), {"level": "INFO", "message": f"m{i}"}) for i in range(50)],
        "key STRING, event STRUCT<level STRING, message STRING>",
    )
    (
        encode_log_events(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    decoded = decode_log_events(
        raw.select(
            F.col("key").cast("string"),
            F.col("value"),
            F.col("timestamp"),
        )
    )
    got = {
        (r["key"], r["event"]["message"])
        for r in decoded.select("key", "event").collect()
    }
    assert got == {(str(i), f"m{i}") for i in range(50)}
