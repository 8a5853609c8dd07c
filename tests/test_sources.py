"""File-source tests: CSV/JSON loaders with dead-letter splits, and the
streaming windowed-count pipeline."""

from __future__ import annotations

import json

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
