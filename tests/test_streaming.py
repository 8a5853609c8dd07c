"""Streaming semantics tests — the MemoryStream/TopologyTestDriver
analog (SURVEY.md §5): file-source micro-batches + memory sink, driving
the dedup edge cases from FIXTURES.md §5.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kafkastreams_example_spark.schema import LOG_SCHEMA
from kafkastreams_example_spark.streaming.pipelines import (
    filter_pipeline,
    dedup_pipeline_within_watermark,
)
from kafkastreams_example_spark.streaming.dedup_refresh import dedup_refresh_stream

MIN = 60 * 1000  # ms

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


@pytest.fixture(autouse=True)
def _restore_state_provider():
    """The TWS wiring points flip the SESSION's state-store provider
    to RocksDB (ensure_tws_state_provider — TWS cannot run on the
    HDFS provider), which would otherwise leak past the TWS test into
    every later streaming test and silently drop the HDFS-provider
    tiny-state configuration conftest.py deliberately pins (post-close
    review: test-order-dependent config drift). Restore the provider
    after each test; no session started yet → nothing to restore
    (conftest's fixture pins HDFS at session build)."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    prev = s.conf.get(_PROVIDER_KEY, _HDFS_PROVIDER) if s else None
    yield
    s2 = SparkSession.getActiveSession()
    if s2 is not None:
        s2.conf.set(_PROVIDER_KEY, prev if prev is not None else _HDFS_PROVIDER)


def _event(row_id: int, ts_ms: int, exc: str | None):
    return {"row_id": row_id, "ts_ms": ts_ms, "dedup_id": exc}


def _write_batch(d: Path, name: str, rows: list[dict]):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_dedup_batch(spark, src: Path, ckpt: Path, out_dir: Path):
    """One availableNow round into a json file sink (file sinks support
    checkpoint recovery across rounds; the memory sink does not)."""
    stream = (
        spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = dedup_refresh_stream(stream)
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _read_sink(spark, out_dir: Path) -> set[int]:
    df = spark.read.schema("row_id BIGINT, ts_ms BIGINT").json(str(out_dir))
    return {r["row_id"] for r in df.collect()}


def test_dedup_refresh_reference_semantics(spark, tmp_path):
    """FIXTURES.md §5 cases 1,3,5 + in-order refresh chain."""
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    rows = [
        # NPE chain: 0 passes; 3min dup; 7min dup-of-refreshed (gap 4min);
        # 20min passes again (gap 13min > 5min)
        _event(0, 0 * MIN, "NPE"),
        _event(1, 3 * MIN, "NPE"),
        _event(2, 7 * MIN, "NPE"),
        _event(3, 20 * MIN, "NPE"),
        # null ids always pass (KStreamDistinct.java:71-72)
        _event(4, 1 * MIN, None),
        _event(5, 1 * MIN, None),
        # distinct key unaffected
        _event(6, 3 * MIN, "OOM"),
    ]
    _write_batch(src, "b1.json", rows)
    out_dir = tmp_path / "out"
    _run_dedup_batch(spark, src, ckpt, out_dir)
    assert _read_sink(spark, out_dir) == {0, 3, 4, 5, 6}


def test_dedup_refresh_out_of_order_and_expiry(spark, tmp_path):
    """FIXTURES.md §5 cases 2,4: centered probe suppresses a record
    older than a remembered one (≤ left half-window); state survives
    across micro-batches via the checkpoint."""
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    out_dir = tmp_path / "out"
    # batch 1: OOM seen at t=10min
    _write_batch(src, "b1.json", [_event(0, 10 * MIN, "OOM")])
    _run_dedup_batch(spark, src, ckpt, out_dir)
    # batch 2: out-of-order record at t=6min — 4min OLDER than stored,
    # inside the left half-window (5min) → suppressed (:88-91);
    # then t=30min — far past → passes
    _write_batch(src, "b2.json", [_event(1, 6 * MIN, "OOM"), _event(2, 30 * MIN, "OOM")])
    _run_dedup_batch(spark, src, ckpt, out_dir)
    assert _read_sink(spark, out_dir) == {0, 2}


def test_dedup_refresh_remembers_older_entries(spark, tmp_path):
    """WindowStore parity: the store retains EVERY remembered timestamp
    within retention (put adds, KStreamDistinct.java:97-103), so an
    out-of-order record must be suppressed by an OLD entry even after a
    newer one was remembered. key@0 emits; key@9min emits (gap > 5min
    half-window); then key@3.5min in a later micro-batch probes
    [-1.5, 8.5]min and finds the 0min entry (inside 10-min retention)
    → suppressed. A single last-seen scalar would only remember 9min
    and wrongly emit."""
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    out_dir = tmp_path / "out"
    _write_batch(
        src, "b1.json", [_event(0, 0 * MIN, "NPE"), _event(1, 9 * MIN, "NPE")]
    )
    _run_dedup_batch(spark, src, ckpt, out_dir)
    _write_batch(src, "b2.json", [_event(2, int(3.5 * MIN), "NPE")])
    _run_dedup_batch(spark, src, ckpt, out_dir)
    assert _read_sink(spark, out_dir) == {0, 1}


def test_dedup_refresh_stream_time_variant(spark, tmp_path):
    """D1′ (KStreamDistinct_example.java:65,94,97): the FixedKeyProcessor
    variant substitutes stream time for every timestamp. Divergence
    case: k@10min, then out-of-order k@2min. Event clock (D1) probes
    centered on 2min → [−3, 7]min misses the 10min entry → emits.
    Stream clock (D1′) probes at the 10min high-water mark → [5, 15]min
    finds it → suppresses."""
    from kafkastreams_example_spark.streaming.dedup_refresh import (
        dedup_refresh_stream,
    )

    def run(clock: str, base: Path) -> set[int]:
        src, ckpt, out_dir = base / "src", base / "ckpt", base / "out"
        src.mkdir(parents=True)
        _write_batch(src, "b1.json", [_event(0, 10 * MIN, "OOM")])
        stream = (
            spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING")
            .json(str(src))
            .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
        )
        out = dedup_refresh_stream(stream, clock=clock)
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        _write_batch(src, "b2.json", [_event(1, 2 * MIN, "OOM")])
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return _read_sink(spark, out_dir)

    assert run("event", tmp_path / "ev") == {0, 1}
    assert run("stream", tmp_path / "st") == {0}


def test_session_window_streaming_matches_batch_claim(spark, tmp_path):
    """session_window runs identically under a watermark on a stream —
    the claim q_session_window_agg's docstring makes. Two users: one
    with a 2-event session (gap < 5min) and a separate later session,
    one single-event session. Watermark-closed sessions emit in append
    mode once a later batch advances the clock."""
    src = tmp_path / "src"
    src.mkdir()
    T0 = 1_704_067_200_000
    rows = [
        {"user_id": 1, "ts_ms": T0},
        {"user_id": 1, "ts_ms": T0 + 2 * MIN},   # same session (gap 2min)
        {"user_id": 1, "ts_ms": T0 + 20 * MIN},  # new session (gap 18min)
        {"user_id": 2, "ts_ms": T0 + 1 * MIN},
    ]
    _write_batch(src, "b1.json", rows)
    stream = (
        spark.readStream.schema("user_id BIGINT, ts_ms BIGINT")
        .json(str(src))
        .select("user_id", F.timestamp_millis(F.col("ts_ms")).alias("event_time"))
    )
    out = (
        stream.withWatermark("event_time", "10 minutes")
        .groupBy("user_id", F.session_window("event_time", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    out_dir = tmp_path / "out"

    def run():
        # file sink, not memory: the memory sink cannot recover from a
        # checkpoint across availableNow rounds
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # advance the watermark far past every session's close
    _write_batch(src, "b2.json", [{"user_id": 9, "ts_ms": T0 + 120 * MIN}])
    run()
    df = spark.read.schema("user_id BIGINT, n_events BIGINT").json(str(out_dir))
    got = sorted((r["user_id"], r["n_events"]) for r in df.collect() if r["user_id"] != 9)
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_dedup_topology_exact_parity_wiring(spark, tmp_path):
    """build_dedup_app's exact-parity transform, driven as a real
    stream (file source standing in for the Kafka endpoints): decoded
    (key, event_time, event) rows → stateful refresh-dedup with the
    encoded payload riding through the state function's output schema →
    (key, value) sink rows. No post-stateful join, no synthetic row
    ids — the wiring ADVICE flagged as unrunnable in round 1."""
    from kafkastreams_example_spark.streaming.apps import dedup_topology

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"key": "a", "ts_ms": 0 * MIN, "level": "ERROR", "exc": "NPE", "msg": "m0"},
        {"key": "b", "ts_ms": 3 * MIN, "level": "ERROR", "exc": "NPE", "msg": "m1"},
        {"key": "c", "ts_ms": 1 * MIN, "level": "INFO", "exc": None, "msg": "m2"},
    ]
    _write_batch(src, "b1.json", rows)
    decoded = (
        spark.readStream.schema(
            "key STRING, ts_ms BIGINT, level STRING, exc STRING, msg STRING"
        )
        .json(str(src))
        .select(
            "key",
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            F.struct(
                F.col("level").alias("level"),
                F.col("msg").alias("message"),
                F.when(
                    F.col("exc").isNotNull(),
                    F.struct(F.col("exc").alias("exception_class")),
                ).alias("exception"),
            ).alias("event"),
        )
    )
    out = dedup_topology(decoded, exact_parity=True, evict_state=False)
    table = f"parity_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["key"]: r["value"] for r in spark.table(table).collect()}
    # NPE@0 survives, NPE@3min suppressed (within ±5min), null-id passes
    assert set(got) == {"a", "c"}
    assert json.loads(got["a"])["exception"]["exception_class"] == "NPE"
    assert json.loads(got["c"])["message"] == "m2"


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream inner join with watermarks and a time-range
    condition — impressions ⋈ clicks within 10 min (the ad-attribution
    shape; a capability class absent from the reference, SURVEY §2b)."""
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    MIN_ = 60_000
    # NOT epoch 0: rows at the initial watermark value (0) are filtered
    # as late before the join ever sees them
    T0 = 1_704_067_200_000  # 2024-01-01
    (imp_dir / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ad_id": 1, "ts_ms": T0},
                {"ad_id": 2, "ts_ms": T0},
            ]
        )
    )
    (clk_dir / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ad_id": 1, "ts_ms": T0 + 5 * MIN_},   # within window → joins
                {"ad_id": 2, "ts_ms": T0 + 30 * MIN_},  # too late → dropped
            ]
        )
    )
    imps = (
        spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT").json(str(imp_dir))
        .select("ad_id", F.timestamp_millis(F.col("ts_ms")).alias("imp_time"))
        .withWatermark("imp_time", "20 minutes")
    )
    clicks = (
        spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT").json(str(clk_dir))
        .select(F.col("ad_id").alias("c_ad_id"), F.timestamp_millis(F.col("ts_ms")).alias("click_time"))
        .withWatermark("click_time", "20 minutes")
    )
    joined = imps.join(
        clicks,
        (F.col("ad_id") == F.col("c_ad_id"))
        & (F.col("click_time") >= F.col("imp_time"))
        & (F.col("click_time") <= F.col("imp_time") + F.expr("INTERVAL 10 MINUTES")),
    )
    table = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["ad_id"] for r in spark.table(table).collect()}
    assert got == {1}


def test_sliding_window_counts(spark, tmp_path):
    """Hopping windows: a 10min/5min sliding count puts each event in
    two windows. Events at T0 and T0+6min (T0 aligned to the 5-min
    grid): T0 → windows [T0−5,T0+5) and [T0,T0+10); T0+6 → [T0+5,T0+15)
    and [T0,T0+10) — the shared middle window counts both."""
    from kafkastreams_example_spark.streaming.pipelines import sliding_window_pipeline

    src = tmp_path / "src"
    src.mkdir()
    T0 = 1_704_067_200_000  # 2024-01-01, multiple of 5 minutes
    rows = [
        {"ts_ms": T0, "level": "INFO"},
        {"ts_ms": T0 + 6 * MIN, "level": "INFO"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    decoded = (
        spark.readStream.schema("ts_ms BIGINT, level STRING")
        .json(str(src))
        .select(
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            F.struct(F.col("level").alias("level")).alias("event"),
        )
    )
    out = sliding_window_pipeline(decoded)
    table = f"slide_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].isoformat(), r["n"]) for r in spark.table(table).collect()
    }
    assert got == {
        ("2023-12-31T23:55:00", 1),  # [T0-5, T0+5): first event only
        ("2024-01-01T00:00:00", 2),  # [T0, T0+10): both
        ("2024-01-01T00:05:00", 1),  # [T0+5, T0+15): second event only
    }


def test_session_window_pipeline_merges_and_splits(spark, tmp_path):
    """Streaming session windows with a 5-min gap: events at T0, T0+3,
    T0+6 chain into ONE session (each ≤5 min from the previous) with
    span 6 min + gap tail; an event at T0+20 opens a separate session.
    A different level never merges across levels."""
    from kafkastreams_example_spark.streaming.pipelines import session_window_pipeline

    src = tmp_path / "src"
    src.mkdir()
    T0 = 1_704_067_200_000  # 2024-01-01
    rows = [
        {"ts_ms": T0, "level": "INFO"},
        {"ts_ms": T0 + 3 * MIN, "level": "INFO"},
        {"ts_ms": T0 + 6 * MIN, "level": "INFO"},
        {"ts_ms": T0 + 20 * MIN, "level": "INFO"},
        {"ts_ms": T0 + 1 * MIN, "level": "ERROR"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    decoded = (
        spark.readStream.schema("ts_ms BIGINT, level STRING")
        .json(str(src))
        .select(
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            F.struct(F.col("level").alias("level")).alias("event"),
        )
    )
    out = session_window_pipeline(decoded)
    table = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["level"], r["session_window"]["start"].isoformat(), r["n"], r["span_ms"])
        for r in spark.table(table).collect()
    }
    gap_ms = 5 * MIN
    assert got == {
        # 3-event chain: [T0, T0+6min+gap)
        ("INFO", "2024-01-01T00:00:00", 3, 6 * MIN + gap_ms),
        # isolated event: [T0+20, T0+20+gap)
        ("INFO", "2024-01-01T00:20:00", 1, gap_ms),
        # other level: its own session
        ("ERROR", "2024-01-01T00:01:00", 1, gap_ms),
    }


def test_quality_filter_pipeline_streaming_matches_batch(spark, tmp_path):
    """The streaming quality gate and the batch scorer share one set of
    signal expressions: the set of doc_ids the stream keeps must equal
    the ids a batch filter with the same thresholds keeps."""
    from kafkastreams_example_spark.functions.text import quality_signal_cols
    from kafkastreams_example_spark.streaming.pipelines import quality_filter_pipeline

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"doc_id": 0, "text": "the cat sat on a mat and it is close to the door"},
        {"doc_id": 1, "text": "too short"},                      # < 8 tokens
        {"doc_id": 2, "text": "the the the the the the the the"},  # all stopwords
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta eta theta"},  # 0 stopwords
        {"doc_id": 4, "text": "it is a fine day to walk in the park with friends"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "doc_id BIGINT, text STRING"
    stream = spark.readStream.schema(schema).json(str(src))
    out = quality_filter_pipeline(stream)
    table = f"qf_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table(table).collect()}
    batch = spark.createDataFrame([tuple(r.values()) for r in rows], schema)
    sig = quality_signal_cols(F.col("text"))
    want = {
        r["doc_id"]
        for r in batch.filter(
            (sig["n_tokens"] >= 8)
            & (sig["stopword_ratio"] <= 0.8)
            & (sig["stopword_ratio"] >= 0.01)
        ).collect()
    }
    assert got == want == {0, 4}


def test_minhash_band_dedup_pipeline_streaming(spark, tmp_path):
    """In-stream near-dup suppression: identical documents collapse
    within the watermark window regardless of doc id; documents with
    different token sets survive. All-band semantics: a doc sharing
    only PART of its signature is kept (the batch sweep's job)."""
    from kafkastreams_example_spark.streaming.pipelines import (
        minhash_band_dedup_pipeline,
    )

    src = tmp_path / "src"
    src.mkdir()
    T0 = 1_704_067_200_000
    base = "the quick brown fox jumps over the lazy dog near a river bank today"
    rows = [
        {"doc_id": 0, "ts_ms": T0, "text": base},
        # token-identical (order/duplication don't change the token SET)
        {"doc_id": 1, "ts_ms": T0 + MIN, "text": base + " the quick fox"},
        # disjoint vocabulary -> different signature -> survives
        {"doc_id": 2, "ts_ms": T0 + MIN, "text": "completely different words entirely"},
        # exact duplicate of 0 -> suppressed
        {"doc_id": 3, "ts_ms": T0 + 2 * MIN, "text": base},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("doc_id BIGINT, ts_ms BIGINT, text STRING")
        .json(str(src))
        .select(
            "doc_id", "text", F.timestamp_millis(F.col("ts_ms")).alias("event_time")
        )
    )
    out = minhash_band_dedup_pipeline(stream)
    table = f"mhd_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table(table).collect()}
    # one survivor of the {0,1,3} token-identical family + doc 2
    assert 2 in got
    assert len(got & {0, 1, 3}) == 1
    assert len(got) == 2


def test_band_dedup_any_pipeline_chained_stateful(spark, tmp_path):
    """ANY-band streaming dedup (two chained built-in stateful ops):
    a doc sharing ONE band key with an earlier doc is suppressed even
    though its other bands are fresh — the semantics the all-band tier
    deliberately relaxes. Batches arrive in separate availableNow
    rounds so first-wins ordering is deterministic; clock docs advance
    the watermark so the verdict aggregation closes."""
    from kafkastreams_example_spark.streaming.pipelines import band_dedup_any_pipeline

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    T0 = 1_704_067_200_000

    def run_round():
        stream = (
            spark.readStream.schema(
                "doc_id BIGINT, ts_ms BIGINT, b0 STRING, b1 STRING, b2 STRING, b3 STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select(
                "doc_id",
                F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
                "b0", "b1", "b2", "b3",
            )
        )
        out = band_dedup_any_pipeline(stream, ["b0", "b1", "b2", "b3"])
        q = (
            out.select("doc_id", "n_won")
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def doc(did, ts, *bands):
        return {"doc_id": did, "ts_ms": ts, **{f"b{i}": b for i, b in enumerate(bands)}}

    # round 1: d0 claims bands a0..a3
    _write_batch(src, "b1.json", [doc(0, T0, "a0", "a1", "a2", "a3")])
    run_round()
    # round 2: d1 shares ONE band (a0) -> must be suppressed;
    #          d2 fully disjoint -> survivor
    _write_batch(
        src,
        "b2.json",
        [
            doc(1, T0 + MIN, "a0", "x1", "x2", "x3"),
            doc(2, T0 + MIN, "c0", "c1", "c2", "c3"),
        ],
    )
    run_round()
    # rounds 3-4: clock docs push the watermark past the first window's
    # end so the verdict aggregation emits
    _write_batch(src, "b3.json", [doc(90, T0 + 40 * MIN, "k0", "k1", "k2", "k3")])
    run_round()
    _write_batch(src, "b4.json", [doc(91, T0 + 41 * MIN, "m0", "m1", "m2", "m3")])
    run_round()

    rows = spark.read.schema("doc_id BIGINT, n_won BIGINT").json(str(out_dir)).collect()
    got = {r["doc_id"] for r in rows}
    assert got == {0, 2}
    assert all(r["n_won"] == 4 for r in rows)


def test_band_dedup_any_hot_band_cap(spark, tmp_path):
    """With (0, a0) denylisted as a hot band, a doc sharing ONLY that
    band must now SURVIVE: its hot row is rewritten to a per-doc solo
    key (never dropped — dropping would make winning all bands
    impossible), so it competes only on discriminative bands. A doc
    sharing a non-hot band stays suppressed."""
    from kafkastreams_example_spark.streaming.pipelines import band_dedup_any_pipeline

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    T0 = 1_704_067_200_000
    hot = spark.createDataFrame([(0, "a0")], "band INT, bh STRING")

    def run_round():
        stream = (
            spark.readStream.schema(
                "doc_id BIGINT, ts_ms BIGINT, b0 STRING, b1 STRING, b2 STRING, b3 STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select(
                "doc_id",
                F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
                "b0", "b1", "b2", "b3",
            )
        )
        out = band_dedup_any_pipeline(
            stream, ["b0", "b1", "b2", "b3"], hot_bands=hot
        )
        q = (
            out.select("doc_id", "n_won")
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def doc(did, ts, *bands):
        return {"doc_id": did, "ts_ms": ts, **{f"b{i}": b for i, b in enumerate(bands)}}

    _write_batch(src, "b1.json", [doc(0, T0, "a0", "a1", "a2", "a3")])
    run_round()
    _write_batch(
        src,
        "b2.json",
        [
            # shares only the HOT band a0 -> survives under the cap
            doc(1, T0 + MIN, "a0", "x1", "x2", "x3"),
            # shares the non-hot band a1 -> still suppressed
            doc(2, T0 + MIN, "y0", "a1", "y2", "y3"),
        ],
    )
    run_round()
    _write_batch(src, "b3.json", [doc(90, T0 + 40 * MIN, "k0", "k1", "k2", "k3")])
    run_round()
    _write_batch(src, "b4.json", [doc(91, T0 + 41 * MIN, "m0", "m1", "m2", "m3")])
    run_round()

    got = {
        r["doc_id"]
        for r in spark.read.schema("doc_id BIGINT, n_won BIGINT")
        .json(str(out_dir))
        .collect()
    }
    assert got == {0, 1}


def test_minhash_band_dedup_any_matches_batch_candidates(spark, tmp_path):
    """Composed smoke: the any-band streaming pipeline suppresses a
    token-identical duplicate arriving in a later batch and keeps a
    disjoint-vocabulary doc, with verdicts emitted after watermark
    closure."""
    from kafkastreams_example_spark.streaming.pipelines import (
        minhash_band_dedup_any_pipeline,
    )

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    T0 = 1_704_067_200_000
    base = "the quick brown fox jumps over the lazy dog near a river bank today"

    def run_round():
        stream = (
            spark.readStream.schema("doc_id BIGINT, ts_ms BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select(
                "doc_id", "text",
                F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            )
        )
        out = minhash_band_dedup_any_pipeline(stream)
        q = (
            out.select("doc_id", "n_won")
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src, "b1.json", [{"doc_id": 0, "ts_ms": T0, "text": base}])
    run_round()
    _write_batch(
        src,
        "b2.json",
        [
            {"doc_id": 1, "ts_ms": T0 + MIN, "text": base},  # exact dup
            {"doc_id": 2, "ts_ms": T0 + MIN,
             "text": "completely different words entirely unrelated corpus"},
        ],
    )
    run_round()
    _write_batch(src, "b3.json", [{"doc_id": 90, "ts_ms": T0 + 40 * MIN, "text": "clock advance one"}])
    run_round()
    _write_batch(src, "b4.json", [{"doc_id": 91, "ts_ms": T0 + 41 * MIN, "text": "clock advance two"}])
    run_round()

    got = {
        r["doc_id"]
        for r in spark.read.schema("doc_id BIGINT, n_won BIGINT").json(str(out_dir)).collect()
    }
    assert got == {0, 2}


def test_attribution_join_left_outer_emits_unmatched(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: the unattributed
    impression emits with a null click — but only after the watermark
    passes its join interval (batch 2's far-future row advances it)."""
    from kafkastreams_example_spark.streaming.pipelines import attribution_join_pipeline

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    T0 = 1_704_067_200_000

    def run_round():
        imps = (
            spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT").json(str(imp_dir))
            .select("ad_id", F.timestamp_millis(F.col("ts_ms")).alias("imp_time"))
        )
        clicks = (
            spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT").json(str(clk_dir))
            .select("ad_id", F.timestamp_millis(F.col("ts_ms")).alias("click_time"))
        )
        joined = attribution_join_pipeline(imps, clicks, how="left_outer")
        q = (
            joined.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (imp_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [{"ad_id": 1, "ts_ms": T0}, {"ad_id": 2, "ts_ms": T0}]
        )
    )
    (clk_dir / "b1.json").write_text(json.dumps({"ad_id": 1, "ts_ms": T0 + 5 * MIN}))
    run_round()
    # far-future rows push both watermarks well past T0's join interval
    far = T0 + 120 * MIN
    (imp_dir / "b2.json").write_text(json.dumps({"ad_id": 9, "ts_ms": far}))
    (clk_dir / "b2.json").write_text(json.dumps({"ad_id": 9, "ts_ms": far}))
    run_round()
    df = spark.read.schema("ad_id BIGINT, imp_time STRING, click_time STRING").json(
        str(out_dir)
    )
    got = {(r["ad_id"], r["click_time"] is not None) for r in df.collect()}
    assert (1, True) in got, f"attributed impression missing: {got}"
    assert (2, False) in got, f"unmatched impression never emitted: {got}"


def _decoded_fixture_df(spark, streaming_dir: Path | None = None):
    """LogEvent rows shaped like sources.kafka.decode_log_events output."""
    rows = [
        ("k1", "2024-02-05 15:00:00", {"level": "INFO", "message": "ok", "exception": None}),
        ("k2", "2024-02-05 15:00:01", {"level": "ERROR", "message": "boom",
                                        "exception": {"exception_class": "NPE"}}),
        ("k3", "2024-02-05 15:02:00", {"level": "ERROR", "message": "boom2",
                                        "exception": {"exception_class": "NPE"}}),
        ("k4", "2024-02-05 15:00:02", {"level": None, "message": "null level", "exception": None}),
    ]
    data = [
        {"key": k, "event_time": t, "event": e} for k, t, e in rows
    ]
    import json as _json

    jdf = spark.createDataFrame([(   _json.dumps(d),) for d in data], "value STRING")
    return jdf.select(
        F.get_json_object("value", "$.key").alias("key"),
        F.to_timestamp(F.get_json_object("value", "$.event_time")).alias("event_time"),
        F.from_json(F.get_json_object("value", "$.event"), LOG_SCHEMA).alias("event"),
    )


def test_filter_pipeline_batch_semantics(spark):
    """Filter topology (KafkaStreamsApplication.java:108-111) on a
    batch DF — same transform the streaming pipeline uses. Null level
    drops (documented divergence from the reference NPE)."""
    decoded = _decoded_fixture_df(spark)
    out = filter_pipeline(decoded).select("key").collect()
    assert {r["key"] for r in out} == {"k1"}


def test_dedup_within_watermark_streaming(spark, tmp_path):
    """Built-in dedup tier on a real stream: second NPE within the
    window suppressed, null-id records pass."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"key": "k1", "ts_ms": 0, "level": "ERROR", "exc": "NPE"},
        {"key": "k2", "ts_ms": 2 * MIN, "level": "ERROR", "exc": "NPE"},
        {"key": "k3", "ts_ms": 1 * MIN, "level": "INFO", "exc": None},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("key STRING, ts_ms BIGINT, level STRING, exc STRING")
        .json(str(src))
        .select(
            "key",
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
            F.struct(
                F.col("level").alias("level"),
                F.struct(F.col("exc").alias("exception_class")).alias("exception"),
            ).alias("event"),
        )
    )
    # exception struct with null class should behave as null id
    stream = stream.withColumn(
        "event",
        F.when(F.col("event.exception.exception_class").isNull(),
               F.col("event").withField("exception", F.lit(None).cast(
                   "struct<exception_class:string>")))
        .otherwise(F.col("event")),
    )
    out = dedup_pipeline_within_watermark(stream)
    table = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["key"] for r in spark.table(table).collect()}
    # within one micro-batch dropDuplicatesWithinWatermark keeps an
    # arbitrary record per key (not necessarily the earliest): exactly
    # one NPE survivor, and the null-id record always passes
    assert len(got & {"k1", "k2"}) == 1 and "k3" in got and len(got) == 2


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a micro-batched event stream enriched by a
    broadcast batch dimension — the standard production enrichment
    shape (stream side never shuffles; the dim is broadcast each
    micro-batch, so dim updates between batches are picked up). Rows
    with no dim match must survive (left join), since enrichment must
    never drop events."""
    ev_dir = tmp_path / "ev"
    ev_dir.mkdir()
    (ev_dir / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"event_id": 1, "user_id": 10},
                {"event_id": 2, "user_id": 20},
                {"event_id": 3, "user_id": 99},  # no dim row -> null tier
            ]
        )
    )
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "basic")], "user_id BIGINT, tier STRING"
    )
    stream = spark.readStream.schema("event_id BIGINT, user_id BIGINT").json(str(ev_dir))
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    table = f"ssb_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.event_id, r.tier) for r in spark.table(table).collect()}
    assert got == {(1, "gold"), (2, "basic"), (3, None)}


# ---------------------------------------------------------------------------
# probe_and_remember core + transformWithState tier
# ---------------------------------------------------------------------------


def test_probe_core_refresh_on_duplicate():
    """Continuous duplicates extend suppression indefinitely: each hit
    re-remembers the duplicate's own timestamp
    (KStreamDistinct.java:97-99)."""
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    w = 600_000  # 10 min, centered +-5
    # events every 4 min on one key: every one is within 5 min of the
    # previous REMEMBERED time because each duplicate refreshes state
    ts = [0, 240_000, 480_000, 720_000, 960_000]
    keep, seen = probe_and_remember([], ts, w)
    assert keep == [True, False, False, False, False]
    # without refresh (first-seen only) 720k would be >5min from 0 and
    # would re-emit — the refresh semantic is what keeps it suppressed


def test_probe_core_out_of_order_older_duplicate():
    """Centered probe: an out-of-order record slightly OLDER than a
    remembered event is also a duplicate (KStreamDistinct.java:56-59)."""
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    w = 600_000
    keep, _ = probe_and_remember([], [540_000, 300_000], w)
    # 300k probes [0, 600k]; remembered 540k is inside -> suppressed
    assert keep == [True, False]


def test_probe_core_multi_entry_state():
    """The state is a SET of remembered timestamps, not a last-seen
    scalar: key@0 (emit), key@9min (emit, gap > half-window), then
    out-of-order key@3.5min must STILL be suppressed by the 0min
    entry."""
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    w = 600_000
    keep, _ = probe_and_remember([], [0, 540_000, 210_000], w)
    assert keep == [True, True, False]


def test_probe_core_stream_clock_monotone():
    """D1' stream clock: out-of-order records probe at the high-water
    mark, so a late record after any emit always collides."""
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    w = 600_000
    keep, _ = probe_and_remember([], [700_000, 100_000], w, clock="stream")
    assert keep == [True, False]  # 100k probes AT 700k -> duplicate


def test_probe_core_retention_prune():
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    w = 600_000
    _, seen = probe_and_remember([], [0, 2_000_000], w)
    assert seen == [2_000_000]  # entry 0 fell out of retention


def test_probe_core_empty_inputs():
    from kafkastreams_example_spark.streaming.dedup_refresh import probe_and_remember

    assert probe_and_remember([], [], 600_000) == ([], [])


def test_probe_core_vectorized_matches_sequential_reference():
    """The numpy fast path (ascending batches — what the streaming
    wrappers always feed) must be decision-for-decision identical to
    the sequential reference loop, across both clocks, window sizes
    down to 0, prior state, and intra-batch duplicate timestamps."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        _probe_and_remember_seq,
        probe_and_remember,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        seen=st.lists(st.integers(0, 5_000), max_size=16, unique=True).map(sorted),
        ts=st.lists(st.integers(0, 5_000), max_size=24),
        window=st.sampled_from([0, 1, 2, 100, 601, 600_000]),
        clock=st.sampled_from(["event", "stream"]),
    )
    def check(seen, ts, window, clock):
        ts_sorted = sorted(ts)
        got = probe_and_remember(list(seen), ts_sorted, window, clock)
        want = _probe_and_remember_seq(list(seen), list(ts_sorted), window, clock)
        assert got == want

    check()


def test_tws_guard_reports_reason(spark):
    """transformWithStateInPandas tier: on runtimes that can't execute
    it (no protobuf) the STREAM WIRING must raise a clear RuntimeError
    naming the blocker, never fail deep inside a streaming query. The
    processor factory itself needs only the StatefulProcessor API, so
    its batch/timer protocol stays unit-testable here."""
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
        make_refresh_dedup_processor,
        tws_available,
    )

    proc = make_refresh_dedup_processor()  # API present in PySpark >= 4
    assert hasattr(proc, "handleInputRows")
    ok, reason = tws_available()
    if not ok:
        decoded = spark.createDataFrame(
            [], "dedup_id STRING, event_time TIMESTAMP, row_id BIGINT"
        )
        with pytest.raises(RuntimeError, match="transformWithStateInPandas unavailable"):
            dedup_refresh_stream_tws(decoded)


class _MockValueState:
    def __init__(self):
        self.value = None

    def get(self):
        return self.value

    def update(self, v):
        self.value = v

    def clear(self):
        self.value = None


class _MockHandle:
    def __init__(self):
        self.states: dict[str, _MockValueState] = {}
        self.timers: set[int] = set()

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _MockValueState())

    def registerTimer(self, expiry):
        self.timers.add(int(expiry))

    def deleteTimer(self, expiry):
        self.timers.discard(int(expiry))


class _MockTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


def test_tws_processor_timer_protocol():
    """The evict-timer fix, unit-tested with mock handles (the TWS
    worker can't execute here — no protobuf — but the processor logic
    is plain Python): each batch must delete the PREVIOUS timer before
    arming a new one so exactly one live timer exists per key (TWS
    timers are one-shot and additive); expiry clears all state and
    yields nothing. Without delete-then-register, the first batch's
    timer fires one window after FIRST activity even while the key
    stays hot, wrongly re-emitting suppressed duplicates."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        make_refresh_dedup_processor,
    )

    w = 600_000
    proc = make_refresh_dedup_processor(window_ms=w, evict=True)
    handle = _MockHandle()
    proc.init(handle)

    def batch(rows, now_ms):
        out = list(
            proc.handleInputRows(
                ("k",),
                [pd.DataFrame(rows, columns=["row_id", "ts_ms"])],
                _MockTimerValues(now_ms),
            )
        )
        assert len(out) == 1
        return set(out[0]["row_id"])

    # batch 1 at wall-clock 1_000: emits the first, suppresses the dup
    assert batch([(0, 0), (1, 240_000)], 1_000) == {0}
    assert handle.timers == {1_000 + w}
    # batch 2 while the key is HOT: the old timer must be deleted —
    # exactly one live timer, re-based on the new processing time
    assert batch([(2, 480_000)], 400_000) == set()
    assert handle.timers == {400_000 + w}
    # expiry after a full idle window (TWS consumes a fired timer
    # automatically — simulate by removing it first): state forgotten,
    # nothing yielded
    handle.timers.discard(400_000 + w)
    expired = list(proc.handleExpiredTimer(("k",), _MockTimerValues(10**9), None))
    assert expired == []
    assert handle.states["seen"].get() is None
    assert handle.states["tmr"].get() is None
    # post-eviction: the same timestamps emit again (key forgotten)
    assert batch([(3, 240_000)], 10**9) == {3}
    assert handle.timers == {10**9 + w}


def test_tws_stream_end_to_end(spark, tmp_path):
    """Full TWS streaming run — executes where protobuf exists (since
    round 17 that includes this sandbox, via the vendored runtime);
    semantics must match the applyInPandasWithState tier on the same
    input.

    Fixture note (round 17, first real execution): the original
    blind-authored fixture put the third event at 720 000 ms with a
    'dup only under refresh' comment — wrong under the reference's
    CENTERED ±w/2 probe (720 000 is 480 000 past the refreshed
    240 000, outside ±300 000), and the first actual run correctly
    emitted it. The timeline now mirrors the Arrow tier's canonical
    0/4/8/20-minute shape: 480 000 is a dup ONLY because 240 000
    refreshed the remembered timestamp (vs the original 0 it is
    outside the probe), and 1 200 000 is past every refresh — the
    refresh semantics are what the third and fourth events pin."""
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import tws_available

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"TWS not executable here: {reason}")
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
    )

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b0",
        [
            _event(1, 0, "A"),
            _event(2, 240_000, "A"),    # dup (refresh: |240k-0| <= 300k)
            _event(3, 480_000, "A"),    # dup ONLY via refresh (vs 0: 480k > 300k)
            _event(4, 1_200_000, "A"),  # past every refresh — emits
            _event(5, 0, None),         # null id passes
        ],
    )
    stream = (
        spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = dedup_refresh_stream_tws(stream)
    q = (
        out.writeStream.format("json")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _read_sink(spark, tmp_path / "out") == {1, 4, 5}


def test_dedup_refresh_null_string_payload(spark, tmp_path):
    """Review regression (r7): object-dtype payload columns with NULLs
    must survive the per-group sort (np.lexsort would raise on
    None-vs-str comparison; those groups take the pandas sort path)."""
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    rows = [
        {"row_id": 0, "ts_ms": 0, "dedup_id": "NPE", "msg": "boom"},
        {"row_id": 1, "ts_ms": 60_000, "dedup_id": "NPE", "msg": None},
        {"row_id": 2, "ts_ms": 60_000, "dedup_id": "NPE", "msg": "alt"},
        {"row_id": 3, "ts_ms": 0, "dedup_id": "OOM", "msg": None},
    ]
    _write_batch(src, "b1.json", rows)
    stream = (
        spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING, msg STRING")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = dedup_refresh_stream(stream, payload_cols=("row_id", "msg"))
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["row_id"]
        for r in spark.read.schema("row_id BIGINT, msg STRING, ts_ms BIGINT")
        .json(str(out_dir))
        .collect()
    }
    assert got == {0, 3}  # rows 1-2 are in-window duplicates of 0


def test_stream_dedup_recall_gate(spark):
    """CI pin of the r7 recall probe (previously tool-run evidence
    only): on the sf0.01 documents fixture, the ANY-BAND streaming
    tier must catch EVERY document the batch LSH generator flags as a
    duplicate (recall 1.0 — any-band is a superset condition of
    shared-band pairing by construction), the hot-band denylist must
    keep that recall while cutting suppression (precision restore:
    measured 498 -> 332 suppressed), and the all-band tier's
    by-design partial recall stays above its documented 0.60 level."""
    from kafkastreams_example_spark.sources.tables import load_table
    from kafkastreams_example_spark.streaming.pipelines import (
        stream_dedup_recall_metrics,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    m = stream_dedup_recall_metrics(docs)
    assert m["batch_duplicate_docs"] > 0
    assert m["any_band"]["recall_vs_batch"] == 1.0, m
    assert m["any_band_hot_capped"]["recall_vs_batch"] == 1.0, m
    # the denylist must genuinely cut suppression, bounded by the
    # measured 332 + slack (deterministic fixture — drift means the
    # band scheme or the cap changed, which should be a conscious edit)
    assert m["any_band_hot_capped"]["suppressed"] < m["any_band"]["suppressed"]
    assert m["any_band_hot_capped"]["suppressed"] <= 350, m
    assert m["all_band"]["recall_vs_batch"] >= 0.60, m


def test_embedding_dedup_pipeline_gates_near_dups(spark, tmp_path):
    """Streaming embedding near-dup ingest gate (round 9): a stream
    vector identical to a corpus vector is suppressed (its top-1 A cell
    is among its n_probe probes, so it deterministically lands in the
    corpus vector's home bucket and fails the ≥threshold anti-join); a
    novel vector passes. The pipeline is pure DataFrame transforms, so
    the SAME code runs in batch — the streaming output must equal the
    batch run on the concatenated input (the TopologyTestDriver
    pattern), pinning stream/batch parity, not just the two hand-picked
    verdicts."""
    import numpy as np

    from kafkastreams_example_spark.streaming.pipelines import (
        embedding_corpus_index,
        embedding_dedup_pipeline,
    )

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(30, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    index, acents, bcents, grid = embedding_corpus_index(corpus)
    assert len(acents) == grid[0] and len(bcents) == grid[1]
    index = index.cache()

    T0 = 1_704_067_200_000
    novel = rng.normal(size=8)
    novel /= np.linalg.norm(novel)
    rows = [
        {"vec_id": 100, "ts_ms": T0, "embedding": vecs[15].tolist()},  # exact corpus dup
        {"vec_id": 101, "ts_ms": T0, "embedding": novel.tolist()},
        {"vec_id": 102, "ts_ms": T0 + MIN, "embedding": vecs[20].tolist()},  # dup, later batch
    ]
    closers = [
        {"vec_id": 900, "ts_ms": T0 + 40 * MIN, "embedding": novel.tolist()},
        {"vec_id": 901, "ts_ms": T0 + 41 * MIN, "embedding": novel.tolist()},
    ]

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()

    def run_round():
        stream = (
            spark.readStream.schema("vec_id BIGINT, ts_ms BIGINT, embedding ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select("vec_id", "embedding", F.timestamp_millis(F.col("ts_ms")).alias("event_time"))
        )
        out = embedding_dedup_pipeline(stream, index, acents, bcents, grid, threshold=0.9)
        q = (
            out.select("vec_id", "n_won")
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src, "b1.json", rows[:2])
    run_round()
    _write_batch(src, "b2.json", rows[2:3])
    run_round()
    _write_batch(src, "b3.json", closers[:1])
    run_round()
    _write_batch(src, "b4.json", closers[1:])
    run_round()

    got = {
        r["vec_id"]
        for r in spark.read.schema("vec_id BIGINT, n_won BIGINT").json(str(out_dir)).collect()
    }
    assert 100 not in got and 102 not in got  # corpus dups gated
    assert 101 in got  # novel vector passes

    # batch parity: same transforms over the full input (watermark node
    # is eliminated in batch, every windowed count closes trivially).
    # The streaming side can only have emitted windows the watermark
    # passed — the closers' own windows stay open — so compare on the
    # closed-window ids and require the stream emitted nothing extra.
    batch = spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["ts_ms"]) for r in rows + closers],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, ts_ms BIGINT",
    ).select("vec_id", "embedding", F.timestamp_millis(F.col("ts_ms")).alias("event_time"))
    expected = {
        r["vec_id"]
        for r in embedding_dedup_pipeline(
            batch, index, acents, bcents, grid, threshold=0.9
        ).collect()
    }
    closed = {r["vec_id"] for r in rows}
    assert got == expected & closed
    assert got <= expected

    # the at-scale tier (broadcast_index=False: flat-column probes LEFT
    # ANTI joined to the widened index) must gate identically to the
    # default in-kernel BLAS screening
    via_join = {
        r["vec_id"]
        for r in embedding_dedup_pipeline(
            batch, index, acents, bcents, grid, threshold=0.9, broadcast_index=False
        ).collect()
    }
    assert via_join == expected
    index.unpersist()


def test_static_enrich_pipeline(spark, tmp_path):
    """Stream-static broadcast enrichment: events pick up their dim
    columns per micro-batch, unmatched events survive with NULLs
    (how='left' — ingest never drops telemetry over a stale dim), and
    the streaming output equals the batch join over the same input
    (the TopologyTestDriver pattern). The micro-batch plan must probe
    a broadcast of the dim, never shuffle the stream on the key."""
    from kafkastreams_example_spark.streaming.pipelines import (
        static_enrich_pipeline,
    )

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id BIGINT, tier STRING"
    )
    rows = [
        {"event_id": 10, "ts_ms": 0, "user_id": 1},
        {"event_id": 11, "ts_ms": MIN, "user_id": 2},
        {"event_id": 12, "ts_ms": 2 * MIN, "user_id": 99},  # no dim row
    ]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    _write_batch(src, "b1.json", rows)
    stream = (
        spark.readStream.schema("event_id BIGINT, ts_ms BIGINT, user_id BIGINT")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = static_enrich_pipeline(stream, dim)
    q = (
        out.select("event_id", "user_id", "tier")
        .writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["tier"])
        for r in spark.read.schema("event_id BIGINT, user_id BIGINT, tier STRING")
        .json(str(out_dir))
        .collect()
    }
    assert got == {(10, "gold"), (11, "silver"), (12, None)}

    # batch parity: identical transforms over the same rows
    batch = spark.createDataFrame(
        [(r["event_id"], r["ts_ms"], r["user_id"]) for r in rows],
        "event_id BIGINT, ts_ms BIGINT, user_id BIGINT",
    ).withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    expected = {
        (r["event_id"], r["tier"])
        for r in static_enrich_pipeline(batch, dim)
        .select("event_id", "tier")
        .collect()
    }
    assert got == expected

    # the batch-equivalent plan is a broadcast probe, not a shuffle of
    # the stream side on user_id
    plan = static_enrich_pipeline(batch, dim)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(user_id" not in plan


def test_embedding_dedup_quarantines_nonfinite(spark):
    """Round-11 review fix: a NaN/inf embedding makes the cosine NaN,
    and the two screening tiers DISAGREE on NaN (numpy `NaN >= t` is
    False → probe survives; Spark orders NaN above every double →
    probe killed). The quarantine rule must drop non-finite vectors in
    _assign so BOTH tiers emit the same verdicts: the poisoned rows
    appear in neither output, and the finite rows gate identically."""
    import numpy as np

    from kafkastreams_example_spark.streaming.pipelines import (
        embedding_corpus_index,
        embedding_dedup_pipeline,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(20)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    index, acents, bcents, grid = embedding_corpus_index(corpus)
    index = index.cache()

    T0 = 1_704_067_200_000
    novel = rng.normal(size=8)
    novel /= np.linalg.norm(novel)
    nan_vec = novel.tolist()
    nan_vec[3] = float("nan")
    inf_vec = vecs[5].tolist()
    inf_vec[0] = float("inf")
    batch = spark.createDataFrame(
        [
            (200, vecs[10].tolist(), T0),  # corpus dup → gated
            (201, novel.tolist(), T0),  # novel → survives
            (202, nan_vec, T0),  # non-finite → quarantined
            (203, inf_vec, T0),  # non-finite → quarantined
        ],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, ts_ms BIGINT",
    ).select(
        "vec_id",
        "embedding",
        F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
    )
    verdicts = {}
    for bcast in (True, False):
        verdicts[bcast] = {
            r["vec_id"]
            for r in embedding_dedup_pipeline(
                batch, index, acents, bcents, grid,
                threshold=0.9, broadcast_index=bcast,
            ).collect()
        }
    assert verdicts[True] == verdicts[False] == {201}
    index.unpersist()


def test_materialized_counts_upsert_table(spark, tmp_path):
    """Streaming materialized aggregate (round 11): per-user count/sum
    maintained by a foreachBatch upsert with manifest-based bucket
    pruning. Checks, across three availableNow rounds (separate query
    restarts sharing one checkpoint):
      1. final state == the batch groupBy over ALL input (parity),
      2. replaying a committed batch id is a no-op (idempotence — the
         at-least-once redelivery contract foreachBatch must absorb),
      3. a batch touching ONE key rewrites only that key's bucket; the
         other buckets carry forward by reference in the manifest (the
         O(hot-buckets) merge that makes the pattern viable at scale).
    """
    import json as _json

    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    table = MaterializedCounts(
        str(tmp_path / "table"), keys=("user_id",), n_buckets=8
    )
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()

    batches = [
        [{"user_id": 1, "value": 2.0}, {"user_id": 2, "value": 3.0},
         {"user_id": 1, "value": 1.0}],
        [{"user_id": 2, "value": 5.0}, {"user_id": 3, "value": 7.0}],
        [{"user_id": 1, "value": 0.5}],
    ]

    def run_round():
        stream = spark.readStream.schema("user_id BIGINT, value DOUBLE").json(
            str(src)
        )
        q = (
            stream.writeStream.foreachBatch(table.sink())
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    all_rows = []
    for i, rows in enumerate(batches):
        _write_batch(src, f"b{i}.json", rows)
        all_rows += rows
        run_round()

    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in table.read(spark).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["value"]) for r in all_rows],
        "user_id BIGINT, value DOUBLE",
    )
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("total"),
        )
        .collect()
    }
    assert got == want

    # idempotence: replay the last committed batch id — state unchanged
    last = table.committed_batch()
    replay = spark.createDataFrame(
        [(9, 99.0)], "user_id BIGINT, value DOUBLE"
    )
    table.apply_batch(replay, last)
    assert {
        r["user_id"] for r in table.read(spark).collect()
    } == set(want), "replayed batch must be a no-op"

    # bucket pruning: the last real batch touched only user 1 —
    # its manifest may update at most one bucket vs its predecessor
    mdir = tmp_path / "table" / "manifests"
    manifests = sorted(
        mdir.glob("manifest-*.json"),
        key=lambda p: int(p.stem.rsplit("-", 1)[1]),
    )
    prev, cur = (
        _json.loads(manifests[-2].read_text()),
        _json.loads(manifests[-1].read_text()),
    )
    changed = {b for b in cur if cur[b] != prev.get(b)}
    assert len(changed) <= 1, (changed, prev, cur)


def test_streaming_topk_tracker(spark, tmp_path):
    """Continuous heavy-hitters (functions/sketches.StreamingTopK):
    micro-batches fold into a k-bounded Misra-Gries driver state via
    per-partition summaries. With ample k across three availableNow
    rounds the tracker must be exact (zero error budget); with
    adversarially small k the count bounds must still bracket the
    truth — the mergeable-summaries contract."""
    from collections import Counter

    from kafkastreams_example_spark.functions.sketches import StreamingTopK

    batches = [
        ["a"] * 5 + ["b"] * 3 + ["c"],
        ["a"] * 4 + ["d"] * 2,
        ["b"] * 6 + ["e"],
    ]
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    tracker = StreamingTopK(k=64)

    def run_round():
        stream = spark.readStream.schema("term STRING").json(str(src))
        q = (
            stream.writeStream.foreachBatch(tracker.foreach_batch())
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for i, terms in enumerate(batches):
        _write_batch(src, f"t{i}.json", [{"term": t} for t in terms])
        run_round()

    true = Counter(t for b in batches for t in b)
    assert tracker.d_total == 0  # vocab << k: summaries stayed exact
    got = tracker.topk(3)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(t, lo) for t, lo, hi in got] == want

    # adversarial k: bounds must bracket the truth even under heavy
    # decrement churn across merges
    small = StreamingTopK(k=2)
    data = [x for i in range(1, 8) for x in [f"w{i}"] * (20 // i)]
    for chunk in (data[:25], data[25:]):
        small.apply_batch(
            spark.createDataFrame([(t,) for t in chunk], "term STRING")
            .repartition(3)
        )
    truth = Counter(data)
    for t, lo, hi in small.topk(2):
        assert lo <= truth[t] <= hi
    for t, c in truth.items():
        if t not in small.counters:
            assert c <= small.d_total


def test_streaming_topk_skips_replayed_batch(spark):
    """Round-12 advice fix: foreachBatch at-least-once redelivery (same
    batch_id seen twice after a failure between completion and
    checkpoint commit) must NOT double-count — that would break the
    stored <= true upper-bound invariant the exactness certificate
    relies on. Mirrors the MaterializedCounts/CdcTable guard."""
    from kafkastreams_example_spark.functions.sketches import StreamingTopK

    tracker = StreamingTopK(k=16)
    b0 = spark.createDataFrame([("a",)] * 3 + [("b",)], "term STRING")
    b1 = spark.createDataFrame([("a",)] * 2 + [("c",)], "term STRING")
    fn = tracker.foreach_batch()
    fn(b0, 0)
    fn(b0, 0)  # redelivery of batch 0 — must be a no-op
    fn(b1, 1)
    fn(b1, 1)  # redelivery of batch 1 — must be a no-op
    assert tracker.d_total == 0
    assert tracker.topk(3) == [("a", 5, 5), ("b", 1, 1), ("c", 1, 1)]
    # un-id'd direct calls keep the legacy always-apply behavior
    tracker.apply_batch(b1)
    assert tracker.topk(1) == [("a", 7, 7)]

    # round-13 advice fix: a batch whose FOLD fails must stay
    # retryable — batch_id commits only after the summaries fold
    # (commit-after-write, like the manifest sinks). Recording the id
    # up front would make the redelivery a no-op and lose the counts.
    import kafkastreams_example_spark.functions.sketches as sk

    t2 = StreamingTopK(k=16)
    t2.apply_batch(b0, 0)
    real = sk.mg_partition_summaries

    def boom(*a, **kw):
        raise RuntimeError("executor lost")

    sk.mg_partition_summaries = boom
    try:
        import pytest

        with pytest.raises(RuntimeError):
            t2.apply_batch(b1, 1)  # fold fails mid-batch
    finally:
        sk.mg_partition_summaries = real
    assert t2.last_batch_id == 0  # batch 1 was NOT committed
    t2.apply_batch(b1, 1)  # redelivery after recovery must fold
    assert t2.topk(3) == [("a", 5, 5), ("b", 1, 1), ("c", 1, 1)]


def test_empty_table_read_schema_matches_committed(spark, tmp_path):
    """Round-12 advice fix: a pre-first-commit read must carry the same
    column TYPES as a post-commit read. Two mechanisms: explicit
    key/col types at construction, and the _SCHEMA.json persisted on
    the first apply_batch (even an all-empty one — a delta frame has a
    schema at zero rows), which then wins."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    # explicit types, before any batch
    mv = MaterializedCounts(
        str(tmp_path / "mv"),
        keys=("user_id",),
        key_types={"user_id": "BIGINT"},
        n_buckets=4,
    )
    empty = mv.read(spark)
    assert dict(empty.dtypes)["user_id"] == "bigint"

    # persisted schema: an EMPTY first batch commits no data but saves
    # the shape, so the empty read matches the committed schema exactly
    batch = spark.createDataFrame([], "user_id BIGINT, value DOUBLE")
    mv.apply_batch(batch, 0)
    assert mv.committed_batch() == 0
    empty = mv.read(spark)
    assert dict(empty.dtypes)["user_id"] == "bigint"
    # and the empty frame unions cleanly against a committed-shape read
    mv.apply_batch(
        spark.createDataFrame([(7, 1.5)], "user_id BIGINT, value DOUBLE"), 1
    )
    live = mv.read(spark)
    assert empty.unionByName(live).count() == 1

    # CdcTable: STRING key declared up front, then schema persistence
    cdc = CdcTable(
        str(tmp_path / "cdc"),
        key="doc",
        n_buckets=4,
        col_types={"doc": "STRING"},
    )
    assert dict(cdc.read(spark).dtypes)["doc"] == "string"
    cdc.apply_batch(
        spark.createDataFrame(
            [], "doc STRING, seq BIGINT, op STRING, payload STRING"
        ),
        0,
    )
    assert dict(cdc.read(spark).dtypes)["doc"] == "string"


def test_materialized_counts_time_travel(spark, tmp_path):
    """Snapshot reads: because version=<id> data dirs are immutable and
    manifests are never deleted, read(at_batch=N) reconstructs the
    table exactly as of any committed batch at the cost of a current
    read — the Iceberg/Delta time-travel contract from the same
    manifest machinery."""
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    table = MaterializedCounts(
        str(tmp_path / "tt"), keys=("user_id",), n_buckets=4
    )
    batches = [
        [(1, 2.0), (2, 3.0)],
        [(1, 1.0)],
        [(3, 7.0), (2, 0.5)],
    ]
    for i, rows in enumerate(batches):
        table.apply_batch(
            spark.createDataFrame(rows, "user_id BIGINT, value DOUBLE"), i
        )
    assert table.versions() == [0, 1, 2]

    def snap(at):
        return {
            r["user_id"]: (r["n"], float(r["total"]))
            for r in table.read(spark, at_batch=at).collect()
        }

    assert snap(0) == {1: (1, 2.0), 2: (1, 3.0)}
    assert snap(1) == {1: (2, 3.0), 2: (1, 3.0)}
    assert snap(2) == {1: (2, 3.0), 2: (2, 3.5), 3: (1, 7.0)}
    # current read == latest snapshot; pre-history read is empty
    assert snap(2) == {
        r["user_id"]: (r["n"], float(r["total"]))
        for r in table.read(spark).collect()
    }
    assert table.read(spark, at_batch=-1).count() == 0


def test_materialized_counts_compact_and_vacuum(spark, tmp_path):
    """Table maintenance: compact() rewrites the committed state into
    one version dir through the same atomic commit protocol (read
    parity before/after), and vacuum() expires old manifests while
    NEVER deleting a version dir a kept manifest still references —
    the carried-forward-bucket hazard: after incremental merges the
    newest manifest routinely points into OLD version dirs for cold
    buckets, so a naive 'delete expired versions' would corrupt the
    current table."""
    import os

    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    table = MaterializedCounts(
        str(tmp_path / "m"), keys=("user_id",), n_buckets=4
    )
    # user 1 only in batch 0: its bucket is carried forward by
    # reference through batches 1-2 and stays physically in version=0
    batches = [[(1, 2.0), (2, 3.0)], [(2, 1.0)], [(2, 0.5), (3, 7.0)]]
    for i, rows in enumerate(batches):
        table.apply_batch(
            spark.createDataFrame(rows, "user_id BIGINT, value DOUBLE"), i
        )

    def state():
        return {
            r["user_id"]: (r["n"], float(r["total"]))
            for r in table.read(spark).collect()
        }

    want = {1: (1, 2.0), 2: (3, 4.5), 3: (1, 7.0)}
    assert state() == want

    # vacuum WITHOUT compaction: manifest-2 references version=0 (user
    # 1's cold bucket) — that dir must survive expiry of manifest-0/1
    expired = table.vacuum(keep_last=1)
    assert expired == [0, 1]
    assert table.versions() == [2]
    assert state() == want  # carried-forward buckets intact
    assert os.path.isdir(os.path.join(table.path, "data", "version=0"))

    # compact, then vacuum: everything folds into the new version and
    # the old dirs become genuinely unreferenced -> deleted
    table.compact(spark, batch_id=3)
    assert state() == want
    manifest = table._current_manifest()
    assert all("version=3" in p for p in manifest.values())
    assert table.vacuum(keep_last=1) == [2]
    assert state() == want
    assert not os.path.isdir(os.path.join(table.path, "data", "version=0"))
    # replaying a committed compaction id is a no-op (idempotence)
    table.compact(spark, batch_id=3)
    assert state() == want


def test_cdc_table_apply_semantics(spark, tmp_path):
    """CDC snapshot table (streaming/cdc_table.py): last-writer-wins by
    seq, deletes erase, newer-seq re-insert resurrects, replaying a
    committed batch id is a no-op, and a bucket whose merged content is
    entirely deletions leaves the manifest instead of dangling a path
    (the bug sf0.001 caught: n_buckets > surviving keys)."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    table = CdcTable(str(tmp_path / "cdc"), key="k", n_buckets=8)

    def df(rows):
        return spark.createDataFrame(
            rows, "k BIGINT, seq BIGINT, op STRING, payload STRING"
        )

    def state():
        return {
            r["k"]: (r["seq"], r["payload"])
            for r in table.read(spark).collect()
        }

    # batch 0: inserts; in-batch the max-seq change per key must win
    table.apply_batch(
        df([(1, 10, "u", "a"), (1, 12, "u", "b"), (2, 11, "u", "x")]), 0
    )
    assert state() == {1: (12, "b"), 2: (11, "x")}

    # batch 1: delete key 1, update key 2
    table.apply_batch(df([(1, 20, "d", None), (2, 21, "u", "y")]), 1)
    assert state() == {2: (21, "y")}

    # replay of committed batch 1 (at-least-once redelivery): no-op
    table.apply_batch(df([(1, 99, "u", "ghost")]), 1)
    assert state() == {2: (21, "y")}

    # batch 2: newer-seq re-insert resurrects the deleted key; delete
    # the ONLY key of its bucket so the erased bucket must drop out of
    # the manifest cleanly (read() must not hit a dangling path)
    table.apply_batch(df([(1, 30, "u", "c"), (2, 31, "d", None)]), 2)
    assert state() == {1: (30, "c")}

    # delete EVERYTHING: snapshot empties, reads still work
    table.apply_batch(df([(1, 40, "d", None)]), 3)
    assert state() == {}


def test_cdc_table_streaming_batching_invariance(spark, tmp_path):
    """Driving the table through writeStream.foreachBatch with
    availableNow rounds: the final snapshot equals the one-shot
    latest-per-key query over all changes regardless of how the
    seq-ordered log was cut into micro-batches."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    table = CdcTable(str(tmp_path / "cdc2"), key="k", n_buckets=4)
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    batches = [
        [{"k": 1, "seq": 1, "op": "u", "payload": "a"},
         {"k": 2, "seq": 2, "op": "u", "payload": "b"}],
        [{"k": 1, "seq": 3, "op": "d", "payload": None},
         {"k": 3, "seq": 4, "op": "u", "payload": "c"}],
        [{"k": 2, "seq": 5, "op": "u", "payload": "b2"}],
    ]

    def run_round():
        stream = spark.readStream.schema(
            "k BIGINT, seq BIGINT, op STRING, payload STRING"
        ).json(str(src))
        q = (
            stream.writeStream.foreachBatch(table.sink())
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for i, rows in enumerate(batches):
        _write_batch(src, f"c{i}.json", rows)
        run_round()

    got = {
        r["k"]: (r["seq"], r["payload"]) for r in table.read(spark).collect()
    }
    assert got == {2: (5, "b2"), 3: (4, "c")}


def test_cdc_table_compact_time_travel_vacuum(spark, tmp_path):
    """The shared ManifestTable protocol surfaces on the CDC table:
    snapshot time travel across delete/resurrect history, compaction
    folding into one version, vacuum reclaiming unreferenced dirs."""
    import os

    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    table = CdcTable(str(tmp_path / "cdc3"), key="k", n_buckets=4)

    def df(rows):
        return spark.createDataFrame(
            rows, "k BIGINT, seq BIGINT, op STRING, payload STRING"
        )

    def snap(at=None):
        return {
            r["k"]: r["payload"]
            for r in table.read(spark, at_batch=at).collect()
        }

    table.apply_batch(df([(1, 1, "u", "a"), (2, 2, "u", "b")]), 0)
    table.apply_batch(df([(1, 3, "d", None)]), 1)
    table.apply_batch(df([(1, 4, "u", "a2")]), 2)
    assert snap(0) == {1: "a", 2: "b"}
    assert snap(1) == {2: "b"}  # mid-history: key 1 deleted
    assert snap(2) == snap() == {1: "a2", 2: "b"}

    table.compact(spark, batch_id=3)
    assert snap() == {1: "a2", 2: "b"}
    assert all("version=3" in p for p in table._current_manifest().values())
    expired = table.vacuum(keep_last=1)
    assert expired == [0, 1, 2]
    assert snap() == {1: "a2", 2: "b"}
    assert not os.path.isdir(os.path.join(table.path, "data", "version=0"))


def test_attribution_join_full_outer_emits_orphan_clicks(spark, tmp_path):
    """Stream-stream FULL OUTER interval join: beyond the left-outer
    contract, an orphan click (no impression could have preceded it —
    the click-fraud / lost-impression signal) emits with a null
    impression time once the watermark closes its match interval, and
    carries ITS key through the coalesced output key."""
    from kafkastreams_example_spark.streaming.pipelines import (
        attribution_join_pipeline,
    )

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    T0 = 1_704_067_200_000

    def run_round():
        imps = (
            spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT")
            .json(str(imp_dir))
            .select("ad_id", F.timestamp_millis(F.col("ts_ms")).alias("imp_time"))
        )
        clicks = (
            spark.readStream.schema("ad_id BIGINT, ts_ms BIGINT")
            .json(str(clk_dir))
            .select(
                "ad_id", F.timestamp_millis(F.col("ts_ms")).alias("click_time")
            )
        )
        joined = attribution_join_pipeline(imps, clicks, how="full_outer")
        q = (
            joined.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (imp_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [{"ad_id": 1, "ts_ms": T0}, {"ad_id": 2, "ts_ms": T0}]
        )
    )
    (clk_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ad_id": 1, "ts_ms": T0 + 5 * MIN},  # attributed
                {"ad_id": 7, "ts_ms": T0 + 5 * MIN},  # orphan click
            ]
        )
    )
    run_round()
    far = T0 + 120 * MIN
    (imp_dir / "b2.json").write_text(json.dumps({"ad_id": 9, "ts_ms": far}))
    (clk_dir / "b2.json").write_text(json.dumps({"ad_id": 9, "ts_ms": far}))
    run_round()
    df = spark.read.schema(
        "ad_id BIGINT, imp_time STRING, click_time STRING"
    ).json(str(out_dir))
    got = {
        (r["ad_id"], r["imp_time"] is not None, r["click_time"] is not None)
        for r in df.collect()
    }
    assert (1, True, True) in got, got     # attributed pair
    assert (2, True, False) in got, got    # unmatched impression
    assert (7, False, True) in got, got    # orphan click, key preserved


def test_term_index_feed_materializes_df_and_corpus_stats(spark, tmp_path):
    """The term-index feed contract behind q_bm25_incremental and the
    term_index bench pipeline: batching documents through
    MaterializedCounts(keys=term) must materialize (a) n = document
    frequency per term (one distinct row per (doc, term), summed
    across batches — the append-only corpus invariant) and (b) the
    reserved '#corpus' key with n = N docs and total = Σ doc length,
    exact in decimal, regardless of how the docs were batched."""
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )
    from kafkastreams_example_spark.streaming.pipelines import (
        term_index_feed,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),   # dl 4, terms {alpha,beta,gamma}
            (2, "beta gamma gamma"),        # dl 3, terms {beta,gamma}
            (3, "alpha"),                   # dl 1
            (4, ""),                        # dl 0 — stats row only
        ],
        "doc_id BIGINT, text STRING",
    )
    table = MaterializedCounts(
        str(tmp_path / "idx"), keys=("term",), value_col="value", n_buckets=4
    )
    feed = term_index_feed(docs)
    for i in range(2):  # batch by doc parity
        table.apply_batch(feed.filter(F.col("doc_id") % 2 == i), i)
    got = {
        r["term"]: (r["n"], float(r["total"]))
        for r in table.read(spark).collect()
    }
    assert got["alpha"] == (2, 0.0)
    assert got["beta"] == (2, 0.0)
    assert got["gamma"] == (2, 0.0)
    assert got["#corpus"] == (4, 8.0)  # N=4 docs, sum dl = 4+3+1+0


def test_cdc_table_additive_schema_evolution(spark, tmp_path):
    """Round-13 schema evolution: a payload column added MID-STREAM is
    a schema version, not a rewrite — post-evolution reads NULL-fill
    old bucket files, time travel to a pre-evolution snapshot reads
    its own narrower column set, merges across the boundary work,
    compaction and vacuum are unaffected, and a NON-additive change
    (retyping a committed column) raises."""
    import pytest

    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_evo")
    t1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    df1 = spark.createDataFrame(
        [(1, 10, "u", "a"), (2, 11, "u", "b")],
        "k BIGINT, seq BIGINT, op STRING, payload STRING",
    )
    t1.apply_batch(df1, 0)

    # evolve: add a 'score' column; key 2 untouched this batch (its
    # bucket file stays pre-evolution on disk — NULL-fill territory)
    t2 = CdcTable(path, key="k", n_buckets=4,
                  payload_cols=("payload", "score"))
    df2 = spark.createDataFrame(
        [(1, 20, "u", "a2", 0.5), (3, 21, "u", "c", 0.9)],
        "k BIGINT, seq BIGINT, op STRING, payload STRING, score DOUBLE",
    )
    t2.apply_batch(df2, 1)

    now = {r["k"]: (r["payload"], r["score"])
           for r in t2.read(spark).collect()}
    assert now == {1: ("a2", 0.5), 2: ("b", None), 3: ("c", 0.9)}
    assert t2.read(spark).columns == ["k", "seq", "payload", "score"]

    # time travel ACROSS the boundary: the batch-0 snapshot reads with
    # its own (pre-evolution) column set
    old = t2.read(spark, at_batch=0)
    assert old.columns == ["k", "seq", "payload"]
    assert {r["k"]: r["payload"] for r in old.collect()} == {1: "a", 2: "b"}

    # merge across the boundary AGAIN (old state + new-schema delta),
    # then compact + vacuum; history before the vacuum horizon is gone,
    # current state intact
    df3 = spark.createDataFrame(
        [(2, 30, "u", "b3", 0.1)],
        "k BIGINT, seq BIGINT, op STRING, payload STRING, score DOUBLE",
    )
    t2.apply_batch(df3, 2)
    t2.compact(spark, 3)
    t2.vacuum(keep_last=1)
    final = {r["k"]: (r["payload"], r["score"])
             for r in t2.read(spark).collect()}
    assert final == {1: ("a2", 0.5), 2: ("b3", 0.1), 3: ("c", 0.9)}

    # non-additive evolution (retype payload) must raise, not merge
    t_bad = CdcTable(path, key="k", n_buckets=4,
                     payload_cols=("payload", "score"))
    df_bad = spark.createDataFrame(
        [(9, 40, "u", 7, 0.2)],
        "k BIGINT, seq BIGINT, op STRING, payload BIGINT, score DOUBLE",
    )
    with pytest.raises(ValueError, match="non-additive"):
        t_bad.apply_batch(df_bad, 4)


def test_orphaned_schema_version_invisible_until_commit(spark, tmp_path):
    """Round-13 ADVICE (low): _save_schema runs before the data write,
    so a crash between the schema write and _commit leaves a
    _SCHEMA-<batch>.json for a batch that never committed. Reads at or
    after that batch id must keep using the COMMITTED schema (else the
    pre-evolution snapshot pairs with the evolved wider column set);
    the single-writer retry then makes the orphan real."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_orphan")
    t1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    df1 = spark.createDataFrame(
        [(1, 10, "u", "a")], "k BIGINT, seq BIGINT, op STRING, payload STRING"
    )
    t1.apply_batch(df1, 0)

    # simulate the crash: evolved schema version 1 persisted, batch 1
    # never committed (no data write, no manifest)
    t2 = CdcTable(path, key="k", n_buckets=4,
                  payload_cols=("payload", "score"))
    df2 = spark.createDataFrame(
        [(2, 20, "u", "b", 0.5)],
        "k BIGINT, seq BIGINT, op STRING, payload STRING, score DOUBLE",
    )
    t2._save_schema(
        df2.select("k", "seq", "payload", "score").schema, 1
    )
    # current read AND time travel at/after the orphan id resolve to
    # the batch-0 manifest — both must read batch-0's column set
    assert t2.read(spark).columns == ["k", "seq", "payload"]
    assert t2.read(spark, at_batch=5).columns == ["k", "seq", "payload"]
    assert t2._schema_at(None).fieldNames() == ["k", "seq", "payload"]

    # retry commits batch 1: the orphan becomes the live schema
    t2.apply_batch(df2, 1)
    assert t2.read(spark).columns == ["k", "seq", "payload", "score"]
    assert t2.read(spark, at_batch=0).columns == ["k", "seq", "payload"]


def test_vacuum_twice_keeps_below_floor_schema_versions(spark, tmp_path):
    """Round-15 ADVICE (high): after a prior vacuum expires manifests,
    committed schema versions below the history floor have no manifest
    left, yet _schema_at explicitly trusts them (v < hist_floor).
    vacuum's orphan purge must NOT treat them as orphans — a second
    vacuum deleting them would drop the evolved columns from every
    subsequent read. A true orphan ABOVE the floor is still purged."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_vac2")
    t1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    t1.apply_batch(
        spark.createDataFrame(
            [(1, 10, "u", "a")],
            "k BIGINT, seq BIGINT, op STRING, payload STRING",
        ),
        0,
    )
    # evolve at batch 1, then one more commit under the evolved schema
    t2 = CdcTable(path, key="k", n_buckets=4,
                  payload_cols=("payload", "score"))
    wide = "k BIGINT, seq BIGINT, op STRING, payload STRING, score DOUBLE"
    t2.apply_batch(
        spark.createDataFrame([(2, 20, "u", "b", 0.5)], wide), 1
    )
    t2.apply_batch(
        spark.createDataFrame([(3, 30, "u", "c", 0.9)], wide), 2
    )

    # first vacuum raises the history floor to batch 2
    t2.vacuum(keep_last=1)
    assert t2.versions() == [2]
    # a crash leaves a true orphan above the floor; the SECOND vacuum
    # must purge it while keeping the below-floor committed versions
    import pyspark.sql.types as T

    t2._save_schema(
        T.StructType.fromJson(t2._schema_at(None).jsonValue()).add(
            "extra", T.StringType()
        ),
        5,
    )
    t2.vacuum(keep_last=1)
    have = t2._schema_versions()
    assert 5 not in have, "above-floor orphan must be purged"
    assert 1 in have, "below-floor committed evolution must survive"
    assert t2._schema_at(None).fieldNames() == [
        "k", "seq", "payload", "score"
    ]
    got = {r["k"]: (r["payload"], r["score"])
           for r in t2.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", 0.5), 3: ("c", 0.9)}


def test_dedup_refresh_coalesced_parity(spark, tmp_path):
    """Round-13 key coalescing: dedup_refresh_stream_coalesced (many
    logical ids packed per state key, CSR state, same
    probe_and_remember per id) must emit EXACTLY the per-key tier's
    survivors on a multi-batch out-of-order fixture spanning several
    ids — including cross-batch suppression, refresh-on-duplicate
    window extension, and null-id bypass."""
    from kafkastreams_example_spark.streaming.dedup_refresh import (
        dedup_refresh_stream,
        dedup_refresh_stream_coalesced,
    )

    batches = [
        # batch 1: ids A/B/C seed entries; a null id bypasses
        [_event(0, 0, "A"), _event(1, 10_000, "B"),
         _event(2, 20_000, "C"), _event(3, 5_000, None)],
        # batch 2: duplicates inside the window (suppressed + refresh),
        # and a far-future A (emitted, new entry)
        [_event(4, 60_000, "A"), _event(5, 11_000, "B"),
         _event(6, 11 * MIN, "A")],
        # batch 3: out-of-order probes against remembered entries
        [_event(7, 30_000, "C"), _event(8, 10 * MIN + 30_000, "A"),
         _event(9, 25 * MIN, "B")],
    ]

    def run(fn, base):
        src, ckpt, out_dir = base / "src", base / "ckpt", base / "out"
        src.mkdir(parents=True)
        stream = (
            spark.readStream.schema(
                "row_id BIGINT, ts_ms BIGINT, dedup_id STRING"
            )
            .json(str(src))
            .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
        )
        out = fn(stream)
        for i, rows in enumerate(batches):
            _write_batch(src, f"b{i}.json", rows)
            q = (
                out.writeStream.format("json")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(ckpt))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        return _read_sink(spark, out_dir)

    base = run(lambda s: dedup_refresh_stream(s), tmp_path / "pk")
    for packs in (1, 4, 256):
        coal = run(
            lambda s: dedup_refresh_stream_coalesced(s, n_state_keys=packs),
            tmp_path / f"c{packs}",
        )
        assert coal == base, (packs, sorted(coal), sorted(base))
    assert 3 in base  # the null-id bypass row came through


def test_dedup_refresh_coalesced_tws_parity(spark, tmp_path):
    """Round-17 (first round TWS executes here): the coalesced TWS
    tier must emit exactly the per-key applyInPandasWithState tier's
    survivors on the same multi-batch out-of-order fixture as
    test_dedup_refresh_coalesced_parity — REAL cross-batch TWS state
    (value-state CSR packs restored between availableNow runs), not
    the mock-handle protocol test."""
    from kafkastreams_example_spark.streaming.dedup_refresh import (
        dedup_refresh_stream,
    )
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_coalesced_tws,
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"TWS not executable here: {reason}")

    batches = [
        [_event(0, 0, "A"), _event(1, 10_000, "B"),
         _event(2, 20_000, "C"), _event(3, 5_000, None)],
        [_event(4, 60_000, "A"), _event(5, 11_000, "B"),
         _event(6, 11 * MIN, "A")],
        [_event(7, 30_000, "C"), _event(8, 10 * MIN + 30_000, "A"),
         _event(9, 25 * MIN, "B")],
    ]

    def run(fn, base):
        src, ckpt, out_dir = base / "src", base / "ckpt", base / "out"
        src.mkdir(parents=True)
        stream = (
            spark.readStream.schema(
                "row_id BIGINT, ts_ms BIGINT, dedup_id STRING"
            )
            .json(str(src))
            .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
        )
        out = fn(stream)
        for i, rows in enumerate(batches):
            _write_batch(src, f"b{i}.json", rows)
            q = (
                out.writeStream.format("json")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(ckpt))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        return _read_sink(spark, out_dir)

    base = run(lambda s: dedup_refresh_stream(s), tmp_path / "pk")
    for packs in (1, 4):
        got = run(
            lambda s: dedup_refresh_stream_coalesced_tws(
                s, n_state_keys=packs
            ),
            tmp_path / f"tws{packs}",
        )
        assert got == base, (packs, sorted(got), sorted(base))
    assert 3 in base  # the null-id bypass row came through


def test_tws_eviction_timer_fires_end_to_end(spark, tmp_path):
    """First REAL firing of a TWS processing-time timer (round 17 —
    every prior timer test ran against mock handles; the first
    attempt at this e2e caught a real bug: the runtime invokes
    handleExpiredTimer with camelCase KEYWORD arguments, which the
    snake_case processor signatures rejected with TypeError). With
    ``evict_state=True`` an idle key's state is forgotten one window
    after its last activity, so an exact duplicate arriving after the
    TTL emits AGAIN.

    One CONTINUOUS query (a 1 s processing-time trigger; separate
    availableNow runs would each pay ~10 s of query startup, longer
    than any test-sized TTL, so the in-TTL suppression check would be
    impossible): seed key A and confirm emission, send the exact
    duplicate well inside the 15 s TTL (suppressed), idle past the
    TTL — Spark's no-data micro-batches keep running, so the expired
    timer fires and forgets A — then the same duplicate again, now
    emitted."""
    import time as _t

    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"TWS not executable here: {reason}")

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    window_ms = 15_000
    out = dedup_refresh_stream_tws(
        stream, window_ms=window_ms, evict_state=True
    )
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )

    def sink() -> set[int]:
        try:
            return _read_sink(spark, out_dir)
        except Exception:  # noqa: BLE001 — sink dir not created yet
            return set()

    def wait_for(expect: set[int], timeout_s: float = 60.0) -> set[int]:
        deadline = _t.monotonic() + timeout_s
        got = sink()
        while got != expect and _t.monotonic() < deadline:
            _t.sleep(0.5)
            got = sink()
        return got

    try:
        _write_batch(src, "b0.json", [_event(1, 1_000, "A")])
        assert wait_for({1}) == {1}
        t_seed = _t.monotonic()
        # exact duplicate well inside the TTL: must stay suppressed
        _write_batch(src, "b1.json", [_event(2, 1_000, "A")])
        _t.sleep(5.0)
        if _t.monotonic() - t_seed >= window_ms / 1000.0:
            # a loaded box can stretch the write+poll past the TTL —
            # the timing premise is void, not the product behavior
            # (post-close review: skip, don't fail)
            pytest.skip("in-TTL check outlasted the TTL on this box")
        assert sink() == {1}, "in-TTL duplicate leaked"
        # idle past the TTL: the timer fires in a no-data micro-batch
        # and forgets key A entirely
        _t.sleep(window_ms / 1000.0 + 5.0)
        # the SAME duplicate again: emitted only if A was forgotten
        _write_batch(src, "b2.json", [_event(4, 1_000, "A")])
        assert wait_for({1, 4}) == {1, 4}
    finally:
        q.stop()


def test_probe_and_remember_many_matches_per_id_reference():
    """The band-offset multi-id kernel must decide exactly like the
    per-id reference on randomized state/batch/clock fixtures —
    keep flags AND post-retention state, both clocks, empty slices,
    duplicate timestamps, ids present only in state or only in the
    batch. (Pure numpy; no Spark session.)"""
    import random

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        probe_and_remember,
        probe_and_remember_many,
    )

    rng = random.Random(13)
    w = 10_000
    base = 1_700_000_000_000
    for _ in range(300):
        n_ids = rng.randint(1, 8)
        clock = rng.choice(["event", "stream"])
        state, offsets = [], [0]
        for _i in range(n_ids):
            k = rng.randint(0, 5)
            state.extend(sorted(rng.sample(range(base, base + 100_000), k)))
            offsets.append(len(state))
        codes, bts = [], []
        for i in range(n_ids):
            k = rng.randint(0, 6)
            ts = sorted(rng.choices(range(base, base + 100_000), k=k))
            codes.extend([i] * k)
            bts.extend(ts)
        if not bts:
            continue
        keep, new_off, new_flat = probe_and_remember_many(
            offsets, state, codes, bts, n_ids, w, clock
        )
        for i in range(n_ids):
            sl = state[offsets[i] : offsets[i + 1]]
            idx = [p for p, c in enumerate(codes) if c == i]
            want_keep, want_seen = probe_and_remember(
                list(sl), [bts[p] for p in idx], w, clock
            )
            assert [bool(keep[p]) for p in idx] == list(want_keep)
            assert [int(x) for x in new_flat[new_off[i] : new_off[i + 1]]] == [
                int(x) for x in want_seen
            ]


class _FakeGroupState:
    """Minimal stand-in for pyspark GroupState: exists/get/update plus
    the processing-time-timeout surface (hasTimedOut / remove /
    setTimeoutDuration) the evict tiers touch."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.now_ms = 0  # batch-fixed processing-time clock

    def getCurrentProcessingTimeMs(self):
        return self.now_ms

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_coalesced_fn_new_id_sorting_before_state_id():
    """Round-13 ADVICE (high): ids get codes in state-INSERTION order,
    so an id first seen in a LATER batch can carry a higher code than a
    state id its value sorts before — the value-sorted batch then
    violates probe_and_remember_many's (code, ts)-sorted precondition
    and the predecessor check fires across band boundaries. Advisory
    repro: state = {"b": [0]}, batch = [a@500000 (new), b@500000],
    window = 600000 — BOTH rows must be kept (a is new; b's remembered
    entry at 0 is outside the ±300000 probe), where the unfixed code
    dropped b."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        make_coalesced_refresh_fn,
    )

    for clock in ("event", "stream"):
        fn = make_coalesced_refresh_fn(
            600_000, ("dedup_id", "row_id", "ts_ms"), clock
        )
        state = _FakeGroupState()
        b1 = pd.DataFrame(
            [("b", 1, 0)], columns=["dedup_id", "row_id", "ts_ms"]
        )
        out1 = pd.concat(list(fn(("k",), iter([b1]), state)))
        assert set(out1["row_id"]) == {1}
        b2 = pd.DataFrame(
            [("a", 2, 500_000), ("b", 3, 500_000)],
            columns=["dedup_id", "row_id", "ts_ms"],
        )
        out2 = pd.concat(list(fn(("k",), iter([b2]), state)))
        assert set(out2["row_id"]) == {2, 3}, clock
        # state must remember each id's OWN timestamps, not clamp rows
        # into the wrong id's band
        ids, offs, flat, _seen = state.get
        remembered = {
            i: list(flat[offs[j] : offs[j + 1]]) for j, i in enumerate(ids)
        }
        # b's 0 entry survives retention (only 500000 < window behind
        # its new max); the bug would have clamped rows into a's band
        assert remembered == {"a": [500_000], "b": [0, 500_000]}, clock


def test_coalesced_state_is_storable_for_integer_ids():
    """Round-16: the coalesced kernel's state id table must hold pure
    Python scalars for EVERY id dtype. pd.unique over an integral id
    column yields np.int64 — storing those fails the JVM-side state
    unpickle (net.razorvine PickleException on numpy.dtype) the moment
    the operator runs under applyInPandasWithState; string ids masked
    this until the integer-id churn bench tier hit it live."""
    import numpy as np
    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        make_coalesced_refresh_fn,
    )

    fn = make_coalesced_refresh_fn(
        600_000, ("dedup_id", "row_id", "ts_ms"), "event"
    )
    state = _FakeGroupState()
    b1 = pd.DataFrame(
        {"dedup_id": np.array([7, 8, 7], dtype=np.int64),
         "row_id": [1, 2, 3],
         "ts_ms": np.array([0, 10, 700_000], dtype=np.int64)},
    )
    list(fn(("k",), iter([b1]), state))
    # second batch exercises the state round-trip (ids re-enter the
    # kernel from state, new id appends) — every component must stay
    # JVM-storable after BOTH writes
    b2 = pd.DataFrame(
        {"dedup_id": np.array([9, 7], dtype=np.int64),
         "row_id": [4, 5],
         "ts_ms": np.array([700_010, 1_400_000], dtype=np.int64)},
    )
    list(fn(("k",), iter([b2]), state))
    ids, offs, flat, seen = state.get
    for name, seq, want in (("ids", ids, int), ("offsets", offs, int),
                            ("ts", flat, int), ("last_seen", seen, int)):
        bad = [x for x in seq if type(x) is not want]
        assert not bad, f"{name} holds non-{want.__name__}: {bad!r}"


def test_coalesced_lazy_ttl_sweep_forgets_dead_ids():
    """Round-16: the per-id lazy TTL sweep. Under a churning keyspace
    the hash spread keeps every pack touched, so the pack timer never
    fires — and the per-id retention prune keeps a dead id's last
    entry forever (entries age only against the id's OWN max). The
    kernel therefore forgets ids whose last_seen lags now by more than
    the TTL, BEFORE deciding the batch — the per-key tier's
    forget-after-idle contract evaluated lazily at pack-touch time.
    Driven through coalesced_kernel directly (explicit clock)."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        coalesced_kernel,
    )

    cols = ("dedup_id", "row_id", "ts_ms")
    W = 1_000

    def b(rows):
        return pd.DataFrame(rows, columns=cols)

    # batch 1 @now=10_000: id a remembered, stamped
    _, st = coalesced_kernel(
        None, b([("a", 1, 100)]), cols, W, "event",
        now_ms=10_000, ttl_ms=W,
    )
    assert st[0] == ["a"] and st[3] == [10_000]
    # batch 2 @now=20_000: a idle 10s > TTL 1s -> swept before the
    # decision; b enters stamped
    _, st = coalesced_kernel(
        st, b([("b", 2, 5_000)]), cols, W, "event",
        now_ms=20_000, ttl_ms=W,
    )
    assert st[0] == ["b"] and st[3] == [20_000]
    # batch 3 @now=20_500: a recurs with its OLD timestamp — the pack
    # has no memory of it (same as a per-key id whose timer fired), so
    # the row emits fresh; b is under the TTL and keeps its old stamp
    out, st = coalesced_kernel(
        st, b([("a", 3, 100)]), cols, W, "event",
        now_ms=20_500, ttl_ms=W,
    )
    assert set(out["row_id"]) == {3}
    assert sorted(st[0]) == ["a", "b"]
    assert dict(zip(st[0], st[3])) == {"a": 20_500, "b": 20_000}
    # ttl_ms=None (evict_state=False faces): no sweep, remember-forever
    _, st2 = coalesced_kernel(
        None, b([("a", 1, 100)]), cols, W, "event",
        now_ms=10_000, ttl_ms=None,
    )
    out2, st2 = coalesced_kernel(
        st2, b([("a", 4, 100)]), cols, W, "event",
        now_ms=99_000_000, ttl_ms=None,
    )
    assert set(out2["row_id"]) == set()  # still remembered -> suppressed
    assert st2[0] == ["a"]


def test_coalesced_fn_multi_batch_matches_per_id_reference():
    """Drive make_coalesced_refresh_fn across multiple batches where
    new ids (with values sorting BEFORE existing state ids) keep
    arriving, and check every batch's keep set and the carried state
    against the sequential per-id probe_and_remember reference — the
    coverage gap the round-13 advisory called out (the kernel property
    test only generated monotone codes; the parity test seeded all ids
    in batch 1)."""
    import random

    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        make_coalesced_refresh_fn,
        probe_and_remember,
    )

    rng = random.Random(14)
    w = 600_000
    for _trial in range(40):
        clock = rng.choice(["event", "stream"])
        fn = make_coalesced_refresh_fn(
            w, ("dedup_id", "row_id", "ts_ms"), clock
        )
        state = _FakeGroupState()
        seen: dict[str, list[int]] = {}
        # reversed-alphabet universe: later-arriving ids tend to sort
        # BEFORE earlier ones, the exact order the bug needed
        universe = [f"id{9 - j}" for j in range(6)]
        rid = 0
        for _b in range(4):
            rows = []
            for did in rng.sample(universe, rng.randint(1, 4)):
                for _ in range(rng.randint(1, 3)):
                    rid += 1
                    rows.append((did, rid, rng.randrange(0, 2_000_000)))
            pdf = pd.DataFrame(
                rows, columns=["dedup_id", "row_id", "ts_ms"]
            )
            out = pd.concat(
                list(fn(("k",), iter([pdf]), state)), ignore_index=True
            )
            want: set[int] = set()
            for did in sorted(set(pdf["dedup_id"])):
                sub = pdf[pdf["dedup_id"] == did].sort_values(
                    ["ts_ms", "row_id"], kind="mergesort"
                )
                keep, seen[did] = probe_and_remember(
                    seen.get(did, []), list(sub["ts_ms"]), w, clock
                )
                want |= {
                    int(r) for r, k in zip(sub["row_id"], keep) if k
                }
            assert set(out["row_id"].astype(int)) == want, clock
            ids, offs, flat, _seen = state.get
            got_state = {
                i: [int(x) for x in flat[offs[j] : offs[j + 1]]]
                for j, i in enumerate(ids)
            }
            assert got_state == {
                k: v for k, v in seen.items() if v
            }, clock


def test_rolling_stats_stream_equals_batch_kernel(spark, tmp_path):
    """Streaming face of the RANGE kernel (streaming/rolling_stats.py):
    driven in event-time order across THREE micro-batches, the per-
    event trailing-window stats must equal the BATCH kernel's output
    row-for-row (frames spanning batch boundaries come from state),
    and null-value rows are dead-lettered (dropped) while still never
    polluting any frame."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    w = 1_000  # µs
    rows = [  # (ent, rid, t_us, value) — event-time ordered, no ties
        (1, 1, 100, 5.0),
        (1, 2, 150, 2.0),
        (2, 3, 180, 4.0),
        (1, 4, 600, None),    # dead-lettered on the stream
        (1, 5, 900, 9.0),     # frame spans back into batch 1 (state)
        (2, 6, 950, 6.0),
        (1, 7, 1100, 1.0),    # drops rid=1 (t < 100)
        (1, 8, 5000, 3.0),    # fresh frame after a gap
    ]
    batches = [rows[:3], rows[3:6], rows[6:]]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
    )
    for i, chunk in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in chunk],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["row_id"]: r
        for r in spark.read.json(str(out_dir)).collect()
    }
    df = spark.createDataFrame(
        rows, "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
    )
    want = {
        r["row_id"]: r
        for r in rolling_range_stats(
            df, ["ent"], "t_us", "value", w, ["row_id"]
        ).collect()
        # the stream dead-letters null-value rows; the batch kernel
        # reports them — compare on the stream's surviving set
        if r["row_id"] != 4
    }
    assert set(got) == set(want)
    for rid, g in got.items():
        b = want[rid]
        assert g["n_frame"] == b["n_frame"], rid
        assert math.isclose(g["sum_v"], b["sum_v"], abs_tol=1e-9)
        assert math.isclose(g["mean_v"], b["mean_v"], abs_tol=1e-9)
        assert g["min_v"] == b["min_v"] and g["max_v"] == b["max_v"]
    # cross-boundary evidence: rid=5 (t=900, w=1000) reaches back into
    # batch-1 state for rids 1 and 2 — frame {5.0, 2.0, 9.0}
    assert got[5]["n_frame"] == 3 and got[5]["min_v"] == 2.0


def test_rolling_corr_stream_equals_batch_kernel(spark, tmp_path):
    """Round-14 verdict item 4: the corr face of the RANGE kernel
    (streaming/rolling_corr.py) driven in event-time order across
    THREE micro-batches must equal the BATCH kernel
    (functions/sliding.py::rolling_corr_range) row-for-row — same
    defined-corr emission set (n >= 2, both regressors non-degenerate),
    frames spanning batch boundaries served from state, null-value
    rows dead-lettered."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_corr_range,
    )
    from kafkastreams_example_spark.streaming.rolling_corr import (
        rolling_corr_stream,
    )

    w = 1_000  # µs
    rows = [  # (ent, rid, t_us, value) — event-time ordered
        (1, 1, 100, 5.0),
        (1, 2, 150, 2.0),
        (2, 3, 180, 4.0),
        (1, 4, 600, None),    # dead-lettered on the stream
        (1, 5, 900, 9.0),     # frame reaches into batch-1 state
        (2, 6, 950, 6.0),
        (1, 7, 1100, 1.0),
        (1, 8, 5000, 3.0),    # fresh frame after a gap: n=1, dropped
    ]
    batches = [rows[:3], rows[3:6], rows[6:]]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_corr_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
    )
    for i, chunk in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in chunk],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["row_id"]: r for r in spark.read.json(str(out_dir)).collect()
    }
    df = spark.createDataFrame(
        rows, "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
    )
    want = {
        r["row_id"]: r
        for r in rolling_corr_range(
            df, ["ent"], "t_us", "value", w, ["row_id"]
        ).collect()
        # the stream dead-letters the null-value rid=4; the batch
        # kernel pair-deletes it but still reports its frame
        if r["row_id"] != 4
    }
    assert set(got) == set(want) and len(got) >= 3
    for rid, g in got.items():
        assert math.isclose(g["corr"], want[rid]["corr"], abs_tol=1e-9), rid
    # cross-boundary evidence: rid=5 (t=900, w=1000) correlates over
    # batch-1 state rows 1,2 plus itself — a 3-pair frame
    assert got[5]["n_frame"] == 3
    # perfect positive 2-pair frame: ent 2's (180,4),(950,6)
    assert math.isclose(got[6]["corr"], 1.0, abs_tol=1e-9)


def test_rolling_stats_stream_out_of_order_semantics(spark, tmp_path):
    """Round-14 verdict item 2: pin the emit-on-arrival semantics for
    LATE events. A late row inside the retention window emits over the
    rows that have ARRIVED with event time at or before its own
    (state + batch peers); rows already emitted are NEVER retracted or
    corrected (append mode); subsequent in-order rows DO include the
    late row in their frames (merged timeline), re-converging with the
    batch kernel; a row older than the retention horizon still emits
    over whatever in-window rows remain. Divergence from the batch
    kernel is therefore bounded to frames whose window-mates arrive
    later — the documented delta (BASELINE.md round-14)."""
    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    w = 1_000  # µs
    batches = [
        [(1, 1, 1000, 5.0), (1, 2, 2000, 7.0)],
        [(1, 3, 1500, 4.0)],   # LATE: between rid1 and rid2
        [(1, 4, 2400, 2.0)],   # in-order again
        [(1, 5, 100, 1.0)],    # far below the retention horizon
    ]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
    )
    for i, chunk in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in chunk],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["row_id"]: r for r in spark.read.json(str(out_dir)).collect()
    }
    # rid2 emitted BEFORE the late rid3 existed: frame {5.0, 7.0} —
    # NOT corrected afterwards (the batch kernel would say n=3)
    assert got[2]["n_frame"] == 2 and got[2]["sum_v"] == 12.0
    # the late rid3 (t=1500) sees arrived rows with t in [500, 1500]:
    # rid1 (1000) + itself — never the future rid2
    assert got[3]["n_frame"] == 2 and got[3]["sum_v"] == 9.0
    assert got[3]["min_v"] == 4.0 and got[3]["max_v"] == 5.0
    # the next in-order rid4 (t=2400) INCLUDES the late row: frame
    # [1400, 2400] = {4.0, 7.0, 2.0} — identical to the batch kernel
    b4 = {
        r["row_id"]: r
        for r in rolling_range_stats(
            spark.createDataFrame(
                [r for c in batches for r in c],
                "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE",
            ),
            ["ent"], "t_us", "value", w, ["row_id"],
        ).collect()
    }
    assert got[4]["n_frame"] == 3 == b4[4]["n_frame"]
    assert got[4]["sum_v"] == 13.0 == b4[4]["sum_v"]
    # rid5 (t=100) is older than the horizon (2400 - 1000): its
    # window-mates were pruned, so it emits over itself alone
    assert got[5]["n_frame"] == 1 and got[5]["sum_v"] == 1.0


def test_rolling_corr_stream_out_of_order_semantics(spark, tmp_path):
    """Same pinned emit-on-arrival contract for the corr face: a late
    event emits over arrived rows at or before its event time; a
    subsequent in-order row's frame INCLUDES the late row and equals
    the batch kernel exactly."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_corr_range,
    )
    from kafkastreams_example_spark.streaming.rolling_corr import (
        rolling_corr_stream,
    )

    w = 1_000  # µs
    batches = [
        [(1, 1, 1000, 5.0), (1, 2, 2000, 7.0)],
        [(1, 3, 1500, 4.0)],   # LATE: between rid1 and rid2
        [(1, 4, 2400, 2.0)],   # in-order again
    ]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_corr_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
    )
    for i, chunk in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in chunk],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["row_id"]: r for r in spark.read.json(str(out_dir)).collect()
    }
    # rid2 was emitted before the late rid3 existed: 2-pair frame
    # (1000,5),(2000,7) -> corr = +1 exactly; never corrected
    assert got[2]["n_frame"] == 2
    assert math.isclose(got[2]["corr"], 1.0, abs_tol=1e-9)
    # the late rid3 (t=1500) sees only rid1 + itself: (1000,5),(1500,4)
    # -> corr = -1; the future rid2 is invisible to it
    assert got[3]["n_frame"] == 2
    assert math.isclose(got[3]["corr"], -1.0, abs_tol=1e-9)
    # the next in-order rid4 includes the late row — frame [1400,2400]
    # = (1500,4),(2000,7),(2400,2): equals the batch kernel exactly
    full = spark.createDataFrame(
        [r for c in batches for r in c],
        "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE",
    )
    b = {
        r["row_id"]: r
        for r in rolling_corr_range(
            full, ["ent"], "t_us", "value", w, ["row_id"]
        ).collect()
    }
    assert got[4]["n_frame"] == 3
    # (the batch kernel emits id_cols + corr only — no n_frame)
    assert math.isclose(got[4]["corr"], b[4]["corr"], abs_tol=1e-9)


def test_rolling_stats_corrected_emissions_converge_to_batch(spark, tmp_path):
    """Round-14 corrected-emission tier: late events RE-EMIT the rows
    they retro-affect with an incrementing per-key rev, and taking
    max(rev) per row_id converges EXACTLY to the batch kernel once
    every window-mate has arrived within the retention horizon. Also
    pins the correction mechanics batch by batch: an in-order batch
    corrects nothing; a late event corrects exactly the state rows
    whose trailing frame it falls into."""
    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    w = 1_500  # µs
    rows = {  # rid -> (t_us, value)
        1: (1000, 5.0), 2: (2000, 7.0), 3: (1500, 4.0),
        4: (2400, 2.0), 5: (1800, 6.0),
    }
    batches = [[1, 2], [3], [4], [5]]  # rids 3 and 5 arrive LATE
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
        emit_corrections=True,
    )
    for i, rids in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [{"ent": 1, "row_id": r, "t_us": rows[r][0],
              "value": rows[r][1]} for r in rids],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    emitted = spark.read.json(str(out_dir)).collect()
    # correction mechanics: rid2 must have been emitted THREE times
    # (original, corrected by late rid3, corrected by late rid5); the
    # in-order rid4 batch corrects nothing beyond its own row
    per_rid = {}
    for r in emitted:
        per_rid.setdefault(r["row_id"], []).append(r)
    assert len(per_rid[2]) == 3
    assert len(per_rid[1]) == 1  # never retro-affected
    assert len(per_rid[4]) == 2  # original + corrected by rid5
    # convergence: max(rev) per rid equals the batch kernel exactly
    latest = {
        rid: max(es, key=lambda r: r["rev"]) for rid, es in per_rid.items()
    }
    df = spark.createDataFrame(
        [(1, rid, t, v) for rid, (t, v) in rows.items()],
        "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE",
    )
    want = {
        r["row_id"]: r
        for r in rolling_range_stats(
            df, ["ent"], "t_us", "value", w, ["row_id"]
        ).collect()
    }
    assert set(latest) == set(want)
    import math

    for rid, g in latest.items():
        b = want[rid]
        assert g["n_frame"] == b["n_frame"], rid
        assert math.isclose(g["sum_v"], b["sum_v"], abs_tol=1e-9), rid
        assert g["min_v"] == b["min_v"] and g["max_v"] == b["max_v"], rid
    # and the rev sequence is strictly increasing per key batch
    assert max(r["rev"] for r in emitted) == 3


def test_rolling_stats_corrected_tier_in_order_matches_default(spark, tmp_path):
    """On an event-time-ordered stream the corrected tier must emit
    every row exactly once with the same values as the default tier
    (the correction set is empty in-order); a non-integral id raises."""
    import pytest

    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    rows = [(1, 1, 100, 5.0), (1, 2, 150, 2.0), (1, 3, 900, 9.0)]
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    _write_batch(
        src, "b0.json",
        [dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in rows],
    )
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=1000,
        emit_corrections=True,
    )
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["row_id"], r["n_frame"], r["sum_v"], r["rev"])
        for r in spark.read.json(str(out_dir)).collect()
    )
    assert got == [(1, 1, 5.0, 0), (2, 2, 7.0, 0), (3, 3, 16.0, 0)]

    with pytest.raises(ValueError, match="integral id"):
        rolling_stats_stream(
            stream.withColumn("row_id", F.col("row_id").cast("string")),
            entity_cols=("ent",), ts_col="event_time",
            value_col="value", id_col="row_id", window_us=1000,
            emit_corrections=True,
        )


def test_ivf_index_feed_matches_batch_assign_and_maintains_index(spark, tmp_path):
    """Round-14 streaming IVF ingest: ivf_index_feed's pure-projection
    argmax must equal functions/similarity.ivf_assign row-for-row on
    the same frozen codebook (same tie-break), and driving it through
    a MaterializedCounts sink across THREE micro-batches must commit
    the same posting set as one-shot assignment over the union —
    the invariant q_ivf_incremental's oracle proves at the query
    level, here pinned for the streaming face."""
    from kafkastreams_example_spark.functions.similarity import (
        ivf_assign,
        kmeans_centroids,
    )
    from kafkastreams_example_spark.sources.tables import load_table
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )
    from kafkastreams_example_spark.streaming.pipelines import (
        ivf_index_feed,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=1)
    crows = [
        (r["cent_id"], list(r["cv"])) for r in cents.collect()
    ]

    # 1) batch parity: projection argmax == groupBy/max_by assign
    got = sorted(
        (r["vec_id"], r["ivf_bucket"])
        for r in ivf_index_feed(emb, crows).collect()
    )
    want = sorted(
        (r["vec_id"], r["bucket"])
        for r in ivf_assign(emb, cents).collect()
    )
    assert got == want and len(got) > 0

    # 2) streaming maintenance: three micro-batches through the
    # MaterializedCounts sink == one-shot postings
    import json as _json

    rows = emb.select("vec_id", "embedding").collect()
    batches = [rows[0::3], rows[1::3], rows[2::3]]
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()
    idx = MaterializedCounts(
        str(tmp_path / "ivf_idx"),
        keys=("ivf_bucket", "vec_id"),
        value_col=None,
        n_buckets=4,
    )
    stream = spark.readStream.schema(
        "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).json(str(src))
    feed = ivf_index_feed(stream, crows)
    for i, chunk in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [{"vec_id": r["vec_id"],
              "embedding": [float(x) for x in r["embedding"]]}
             for r in chunk],
        )
        q = (
            feed.writeStream.foreachBatch(idx.sink())
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    committed = sorted(
        (r["vec_id"], r["ivf_bucket"])
        for r in idx.read(spark).select("vec_id", "ivf_bucket").collect()
    )
    assert committed == want


def test_rolling_corr_corrected_emissions_converge_to_batch(spark, tmp_path):
    """Corrected-emission tier for the CORR face: max(rev) per row_id
    converges to the batch kernel, including a row that FIRST emitted
    nothing (frame degenerate/too small) and only appears once its
    late window-mate arrives — exactly the batch kernel's row set."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_corr_range,
    )
    from kafkastreams_example_spark.streaming.rolling_corr import (
        rolling_corr_stream,
    )

    w = 1_500  # µs
    rows = {  # rid -> (t_us, value)
        1: (1000, 5.0), 2: (2000, 7.0), 3: (1500, 4.0), 4: (2400, 2.0),
    }
    batches = [[1], [2], [3], [4]]  # rid3 arrives LATE (after rid2)
    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_corr_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=w,
        emit_corrections=True,
    )
    for i, rids in enumerate(batches):
        _write_batch(
            src, f"b{i}.json",
            [{"ent": 1, "row_id": r, "t_us": rows[r][0],
              "value": rows[r][1]} for r in rids],
        )
        q = (
            out.writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    per_rid = {}
    for r in spark.read.json(str(out_dir)).collect():
        per_rid.setdefault(r["row_id"], []).append(r)
    latest = {
        rid: max(es, key=lambda r: r["rev"]) for rid, es in per_rid.items()
    }
    df = spark.createDataFrame(
        [(1, rid, t, v) for rid, (t, v) in rows.items()],
        "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE",
    )
    want = {
        r["row_id"]: r
        for r in rolling_corr_range(
            df, ["ent"], "t_us", "value", w, ["row_id"]
        ).collect()
    }
    # batch kernel emits rids 2,3,4 (rid1's frame is a single point)
    assert set(latest) == set(want) == {2, 3, 4}
    for rid, g in latest.items():
        assert math.isclose(g["corr"], want[rid]["corr"], abs_tol=1e-9), rid
    # the late rid3 retro-affected rid2 (2000 in [1500, 3000]): its
    # original emission was the 2-pair (1000, 2000) corr=+1; latest is
    # the corrected 3-pair value
    assert len(per_rid[2]) >= 2
    assert math.isclose(per_rid[2][0]["corr"], 1.0, abs_tol=1e-9) or any(
        math.isclose(e["corr"], 1.0, abs_tol=1e-9) for e in per_rid[2]
    )


def test_corrected_tier_prune_floor_never_truncates_corrections(spark, tmp_path):
    """Round-14 review finding: with W retention, a late event could
    trigger a correction for a row whose frame extends below the prune
    floor — recomputed over a TRUNCATED frame yet carrying the highest
    rev, overwriting a better earlier emission. Fixed two ways, both
    pinned here: (a) the corrected tier retains 2W, so the reviewer's
    exact repro now converges to the batch kernel; (b) corrections
    whose frame reaches below the floor are SUPPRESSED (the earlier
    emission stands) instead of emitting a truncated overwrite."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    w = 10  # µs

    def drive(batches, out_name):
        src = tmp_path / f"src_{out_name}"
        ckpt = tmp_path / f"ckpt_{out_name}"
        out_dir = tmp_path / f"out_{out_name}"
        src.mkdir()
        stream = (
            spark.readStream.schema(
                "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
            )
            .json(str(src))
            .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
        )
        out = rolling_stats_stream(
            stream, entity_cols=("ent",), ts_col="event_time",
            value_col="value", id_col="row_id", window_us=w,
            emit_corrections=True,
        )
        for i, chunk in enumerate(batches):
            _write_batch(
                src, f"b{i}.json",
                [dict(zip(("ent", "row_id", "t_us", "value"), r))
                 for r in chunk],
            )
            q = (
                out.writeStream.format("json")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(ckpt))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        per = {}
        for r in spark.read.json(str(out_dir)).collect():
            per.setdefault(r["row_id"], []).append(r)
        return per

    # (a) reviewer's repro: t=0,5 | t=14 | late t=4 — under 2W
    # retention t=0 is still in state, so rid2's correction covers
    # {0,4,5} and EVERY row converges to the batch kernel
    rows_a = [(1, 1, 0, 1.0), (1, 2, 5, 2.0), (1, 3, 14, 3.0),
              (1, 4, 4, 4.0)]
    per = drive([rows_a[:2], [rows_a[2]], [rows_a[3]]], "a")
    latest = {rid: max(es, key=lambda r: r["rev"]) for rid, es in per.items()}
    want = {
        r["row_id"]: r
        for r in rolling_range_stats(
            spark.createDataFrame(
                rows_a, "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
            ),
            ["ent"], "t_us", "value", w, ["row_id"],
        ).collect()
    }
    for rid, g in latest.items():
        assert g["n_frame"] == want[rid]["n_frame"], rid
        assert math.isclose(g["sum_v"], want[rid]["sum_v"], abs_tol=1e-9), rid
    assert latest[2]["n_frame"] == 3  # the corrected {0,4,5} frame

    # (b) suppression: events 0,5,9 then 24 (2W floor prunes t=0),
    # then late t=8 — rid3 (t=9) would be "affected" but its frame
    # reaches below the floor: the correction must be SUPPRESSED, so
    # rid3 keeps its single original (exact-at-the-time) emission
    rows_b = [(1, 1, 0, 1.0), (1, 2, 5, 2.0), (1, 3, 9, 4.0),
              (1, 4, 24, 8.0), (1, 5, 8, 16.0)]
    per = drive([rows_b[:3], [rows_b[3]], [rows_b[4]]], "b")
    assert len(per[3]) == 1  # no truncated overwrite
    assert per[3][0]["n_frame"] == 3 and per[3][0]["sum_v"] == 7.0
    # the late row itself still emits (emit-on-arrival allows its own
    # truncation): frame [-2, 8] over retained rows = {5, 8}
    assert per[5][-1]["n_frame"] == 2 and per[5][-1]["sum_v"] == 18.0


def test_orphaned_schema_not_resurrected_by_later_commit(spark, tmp_path):
    """Round-14 review finding: an orphaned _SCHEMA-<id>.json must stay
    invisible even after a LATER batch commits under the old schema —
    the bare at-or-below-the-committed-cap rule would resurrect it and
    the next _save_schema would judge the true (narrower) schema
    'non-additive' against the orphan and wedge the writer. Schema
    versions are honored only when a manifest with THEIR id exists."""
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_orphan2")
    t1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    df0 = spark.createDataFrame(
        [(1, 10, "u", "a")], "k BIGINT, seq BIGINT, op STRING, payload STRING"
    )
    t1.apply_batch(df0, 0)

    # crash leaves an orphaned WIDER schema at id 1 (no commit)
    t_wide = CdcTable(path, key="k", n_buckets=4,
                      payload_cols=("payload", "score"))
    df_wide = spark.createDataFrame(
        [(2, 20, "u", "b", 0.5)],
        "k BIGINT, seq BIGINT, op STRING, payload STRING, score DOUBLE",
    )
    t_wide._save_schema(
        df_wide.select("k", "seq", "payload", "score").schema, 1
    )

    # the writer RESUMES under the ORIGINAL schema: batch 2 commits
    # (schema unchanged -> no new version file) — this must NOT
    # resurrect orphan 1, and further original-schema batches must
    # not raise 'non-additive'. Since round-15 fencing, a resumed
    # writer is a FRESH instance (the crashed process is gone); it
    # claims its own fence epoch — the old t1/t_wide instances are
    # now zombies by construction.
    t1b = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    df2 = spark.createDataFrame(
        [(3, 30, "u", "c")], "k BIGINT, seq BIGINT, op STRING, payload STRING"
    )
    t1b.apply_batch(df2, 2)
    assert t1b.read(spark).columns == ["k", "seq", "payload"]
    df3 = spark.createDataFrame(
        [(4, 40, "u", "d")], "k BIGINT, seq BIGINT, op STRING, payload STRING"
    )
    t1b.apply_batch(df3, 3)  # would raise ValueError before the fix
    assert t1b.read(spark).columns == ["k", "seq", "payload"]
    assert {r["k"] for r in t1b.read(spark).collect()} == {1, 3, 4}

    # a REAL evolution still works afterwards (the orphan is simply
    # overwritten by the honest wider write at its own committing id)
    t2 = CdcTable(path, key="k", n_buckets=4,
                  payload_cols=("payload", "score"))
    t2.apply_batch(df_wide, 4)
    assert t2.read(spark).columns == ["k", "seq", "payload", "score"]
    # and time travel before the evolution keeps the narrow shape
    assert t2.read(spark, at_batch=3).columns == ["k", "seq", "payload"]


def test_corrected_tier_fuzz_converges_on_eligible_rows():
    """Randomized out-of-order fuzzer for the corrected-emission
    contract, at the kernel level (FakeGroupState, no Spark overhead):
    shuffle a random event set into random batches; afterwards, every
    row ALL of whose window-mates (frame members, itself included)
    arrived no later than W behind the key's running max at their
    arrival must have its max(rev) emission equal the exact reference
    computed over the full data — and NO row may ever end on an
    emission claiming a LARGER frame than the truth (truncated
    overwrites are the failure mode the 2W+floor design removed)."""
    import math
    import random

    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_stats import (
        make_rolling_stats_corrected_fn,
    )

    rng = random.Random(14)
    W = 100
    for _trial in range(25):
        n = rng.randint(5, 30)
        rows = [
            (i + 1, rng.randrange(0, 500),
             round(rng.uniform(-5.0, 5.0), 3))
            for i in range(n)
        ]
        shuffled = rows[:]
        rng.shuffle(shuffled)
        batches, i = [], 0
        while i < len(shuffled):
            k = rng.randint(1, 4)
            batches.append(shuffled[i:i + k])
            i += k
        fn = make_rolling_stats_corrected_fn(W, "row_id")
        state = _FakeGroupState()
        latest: dict[int, tuple] = {}
        max_seen = None
        arrival_ok: dict[int, bool] = {}
        for chunk in batches:
            pdf = pd.DataFrame(
                chunk, columns=["row_id", "t_us", "value"]
            )
            out = pd.concat(
                list(fn(("k",), iter([pdf]), state)), ignore_index=True
            )
            for rec in out.itertuples():
                prev = latest.get(rec.row_id)
                if prev is None or rec.rev >= prev[0]:
                    latest[rec.row_id] = (
                        rec.rev, rec.n_frame, rec.sum_v, rec.min_v,
                        rec.max_v,
                    )
            batch_max = max(t for _, t, _ in chunk)
            max_seen = batch_max if max_seen is None else max(
                max_seen, batch_max
            )
            for rid, t, _ in chunk:
                arrival_ok[rid] = t >= max_seen - W
        by_rid = {rid: (t, v) for rid, t, v in rows}
        for rid, (t_r, _v) in by_rid.items():
            mates = [
                (m_rid, t_m, v_m)
                for m_rid, t_m, v_m in rows
                if t_r - W <= t_m <= t_r
            ]
            vals = [v for _, _, v in mates]
            rev, n_frame, sum_v, mn, mx = latest[rid]
            # safety invariant on EVERY row: never a frame larger than
            # the truth (a truncated overwrite would also break this
            # from the other side — check both on eligible rows below)
            assert n_frame <= len(mates), (rid, rows)
            eligible = arrival_ok[rid] and all(
                arrival_ok[m_rid] for m_rid, _, _ in mates
            )
            if eligible:
                assert n_frame == len(mates), (rid, rows)
                assert math.isclose(sum_v, sum(vals), abs_tol=1e-9)
                assert mn == min(vals) and mx == max(vals), (rid, rows)


def test_corrected_tier_retention_windows_knob():
    """``retention_windows`` trades state for straggler tolerance: the
    suppression case from the prune-floor test (events 0,5,9 | 24 |
    late 8 at W=10) stays suppressed at the default 2W but CONVERGES
    at 3W — the extra window keeps t=0 in state, so t=9's correction
    frame {0,5,8,9} is provably complete and is emitted."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_stats import (
        make_rolling_stats_corrected_fn,
    )

    W = 10
    batches = (
        [(1, 0, 1.0), (2, 5, 2.0), (3, 9, 4.0)],
        [(4, 24, 8.0)],
        [(5, 8, 16.0)],
    )
    for rw, expect_corrected in ((2, False), (3, True)):
        fn = make_rolling_stats_corrected_fn(W, "row_id", rw)
        state = _FakeGroupState()
        per: dict[int, list] = {}
        for chunk in batches:
            pdf = pd.DataFrame(
                chunk, columns=["row_id", "t_us", "value"]
            )
            out = pd.concat(
                list(fn(("k",), iter([pdf]), state)), ignore_index=True
            )
            for r in out.itertuples():
                per.setdefault(r.row_id, []).append(
                    (r.rev, r.n_frame, r.sum_v)
                )
        latest = max(per[3])
        if expect_corrected:
            assert latest[1] == 4 and latest[2] == 23.0  # {0,5,8,9}
        else:
            assert len(per[3]) == 1 and latest[1] == 3  # suppressed


def test_corrected_corr_fuzz_converges_on_eligible_rows():
    """Corr-face twin of the corrected-emission fuzzer: on eligible
    rows (all window-mates arrived no later than W behind the running
    key max) the max(rev) emission must equal the exact Pearson corr
    of (t, v) over the TRUE frame — computed here independently in
    numpy — and rows whose true frame is defined must have emitted;
    undefined frames (n < 2 or a degenerate regressor) never emit a
    defined-corr row claiming otherwise."""
    import math
    import random

    import numpy as np
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_corr import (
        make_rolling_corr_corrected_fn,
    )

    rng = random.Random(15)
    W = 100
    for _trial in range(25):
        n = rng.randint(5, 25)
        rows = [
            (i + 1, rng.randrange(0, 400),
             float(rng.randrange(-5, 6)))
            for i in range(n)
        ]
        shuffled = rows[:]
        rng.shuffle(shuffled)
        batches, i = [], 0
        while i < len(shuffled):
            k = rng.randint(1, 4)
            batches.append(shuffled[i:i + k])
            i += k
        fn = make_rolling_corr_corrected_fn(W, "row_id")
        state = _FakeGroupState()
        latest: dict[int, tuple] = {}
        max_seen = None
        arrival_ok: dict[int, bool] = {}
        for chunk in batches:
            pdf = pd.DataFrame(
                chunk, columns=["row_id", "t_us", "value"]
            )
            out = pd.concat(
                list(fn(("k",), iter([pdf]), state)), ignore_index=True
            )
            for rec in out.itertuples():
                prev = latest.get(rec.row_id)
                if prev is None or rec.rev >= prev[0]:
                    latest[rec.row_id] = (rec.rev, rec.n_frame, rec.corr)
            batch_max = max(t for _, t, _ in chunk)
            max_seen = batch_max if max_seen is None else max(
                max_seen, batch_max
            )
            for rid, t, _ in chunk:
                arrival_ok[rid] = t >= max_seen - W
        for rid, t_r, _v in rows:
            mates = [
                (t_m, v_m) for _, t_m, v_m in rows if t_r - W <= t_m <= t_r
            ]
            ts = np.array([t for t, _ in mates], dtype=np.float64)
            vs = np.array([v for _, v in mates], dtype=np.float64)
            defined = (
                len(mates) >= 2
                and len(set(ts.tolist())) > 1
                and len(set(vs.tolist())) > 1
            )
            want = (
                float(np.corrcoef(ts, vs)[0, 1]) if defined else None
            )
            if want is not None and not math.isfinite(want):
                defined, want = False, None
            eligible = arrival_ok[rid] and all(
                arrival_ok[m_rid]
                for m_rid, t_m, _ in rows
                if t_r - W <= t_m <= t_r
            )
            if eligible and defined:
                assert rid in latest, (rid, rows)
                rev, n_frame, corr = latest[rid]
                assert n_frame == len(mates), (rid, rows)
                assert math.isclose(corr, want, abs_tol=1e-9), (rid, rows)
            if eligible and not defined:
                # the latest emission (if any) must not claim the full
                # frame with a defined corr — an undefined true frame
                # has no defined-corr row at its final frame size
                if rid in latest:
                    assert latest[rid][1] < len(mates), (rid, rows)


def test_rolling_faces_idle_key_eviction_unit():
    """Round-15 verdict item 1, kernel level: all four rolling tiers
    armed with ``evict_after_ms`` must (a) set the idle timeout after
    every touched batch, (b) drop the key's state and emit nothing on
    expiry, and (c) serve a revived entity from an EMPTY timeline —
    its output equal to a fresh kernel on the new rows alone (the
    documented emit-on-arrival revival contract). The corrected tiers
    additionally restart the rev sequence at 0."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_corr import (
        make_rolling_corr_corrected_fn,
        make_rolling_corr_fn,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        make_rolling_stats_corrected_fn,
        make_rolling_stats_fn,
    )

    W, EVICT = 1_000_000, 777
    b1 = pd.DataFrame(
        [(1, 100, 5.0), (2, 200, 2.0)], columns=["row_id", "t_us", "value"]
    )
    # within W of b1's rows: frames WOULD span the gap if state survived
    b2 = pd.DataFrame(
        [(3, 300, 7.0), (4, 400, 1.0)], columns=["row_id", "t_us", "value"]
    )
    factories = [
        lambda e: make_rolling_stats_fn(W, "row_id", e),
        lambda e: make_rolling_stats_corrected_fn(W, "row_id", 2, e),
        lambda e: make_rolling_corr_fn(W, "row_id", e),
        lambda e: make_rolling_corr_corrected_fn(W, "row_id", 2, e),
    ]
    for make in factories:
        fn = make(EVICT)
        state = _FakeGroupState()
        list(fn(("k",), iter([b1]), state))
        assert state.exists and state.timeout_ms == EVICT
        # expiry: empty input, hasTimedOut — state dropped, no output
        state.hasTimedOut = True
        out = list(fn(("k",), iter([]), state))
        assert out == [] and not state.exists
        # revival == fresh kernel on b2 alone (no frame spans the gap)
        state.hasTimedOut = False
        revived = pd.concat(list(fn(("k",), iter([b2]), state)),
                            ignore_index=True)
        fresh = pd.concat(
            list(make(None)(("k",), iter([b2]), _FakeGroupState())),
            ignore_index=True,
        )
        rev_cols = [c for c in revived.columns if c != "rev"]
        pd.testing.assert_frame_equal(
            revived[rev_cols].reset_index(drop=True),
            fresh[rev_cols].reset_index(drop=True),
        )
        if "rev" in revived.columns:
            assert (revived["rev"] == 0).all()  # seq restarted
        if "n_frame" in revived.columns and len(revived):
            assert revived["n_frame"].max() <= len(b2)
    # un-evicted control: without expiry the same b2 frames DO span back
    fn = make_rolling_stats_fn(W, "row_id", None)
    state = _FakeGroupState()
    list(fn(("k",), iter([b1]), state))
    assert state.timeout_ms is None  # NoTimeout tier never arms one
    spanned = pd.concat(list(fn(("k",), iter([b2]), state)),
                        ignore_index=True)
    assert spanned["n_frame"].tolist() == [3, 4]


def test_coalesced_dedup_pack_eviction_unit():
    """Round-15 verdict item 3: the coalesced tier's pack-granularity
    idle eviction — timeout armed per touched batch, an expired pack's
    CSR state dropped wholesale, and post-revival decisions equal to a
    FRESH pack fed the same batch (property-checked over randomized
    batches against the per-id probe_and_remember reference)."""
    import random

    import numpy as np
    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        make_coalesced_refresh_fn,
        probe_and_remember,
    )

    W = 600_000
    cols = ("dedup_id", "row_id", "ts_ms")
    fn = make_coalesced_refresh_fn(W, cols, "event", evict=True)
    state = _FakeGroupState()
    b1 = pd.DataFrame([("a", 1, 0), ("a", 2, 100)], columns=cols)
    out1 = pd.concat(list(fn(("k",), iter([b1]), state)))
    assert set(out1["row_id"]) == {1}  # dup suppressed
    assert state.exists and state.timeout_ms == W
    # all ids quiet a full window: pack forgotten, nothing emitted
    state.hasTimedOut = True
    assert list(fn(("k",), iter([]), state)) == [] and not state.exists
    state.hasTimedOut = False
    # the same timestamp emits again — the pack has no memory of id 'a'
    b2 = pd.DataFrame([("a", 3, 100)], columns=cols)
    out2 = pd.concat(list(fn(("k",), iter([b2]), state)))
    assert set(out2["row_id"]) == {3}

    # property: post-eviction replay == fresh pack == per-id reference
    rng = random.Random(15)
    for _ in range(20):
        ids = [f"i{j}" for j in range(rng.randint(1, 4))]
        batch = pd.DataFrame(
            [
                (rng.choice(ids), r, rng.randrange(0, 2 * W))
                for r in range(rng.randint(1, 12))
            ],
            columns=cols,
        ).sort_values(["dedup_id", "ts_ms", "row_id"], kind="mergesort")
        st_evicted = _FakeGroupState()
        warm = pd.DataFrame(
            [(rng.choice(ids), 99, rng.randrange(0, W))], columns=cols
        )
        list(fn(("k",), iter([warm]), st_evicted))
        st_evicted.hasTimedOut = True
        list(fn(("k",), iter([]), st_evicted))
        st_evicted.hasTimedOut = False
        got = pd.concat(list(fn(("k",), iter([batch]), st_evicted)))
        fresh = pd.concat(
            list(
                make_coalesced_refresh_fn(W, cols, "event")(
                    ("k",), iter([batch]), _FakeGroupState()
                )
            )
        )
        assert got["row_id"].tolist() == fresh["row_id"].tolist()
        # per-id reference on the same (id-grouped, time-ordered) rows
        want = []
        for did, grp in batch.groupby("dedup_id", sort=False):
            keep, _ = probe_and_remember(
                [], grp["ts_ms"].to_numpy(np.int64), W, "event"
            )
            want.extend(grp["row_id"].to_numpy()[np.asarray(keep, bool)])
        assert sorted(got["row_id"]) == sorted(want)


def test_rolling_stats_stream_eviction_end_to_end(spark, tmp_path):
    """Round-15 verdict item 1, wired for real: rolling_stats_stream
    with ``evict_after_ms`` under a continuous (processing-time)
    trigger — the engine must keep running empty batches to service
    the timers (FlatMapGroupsWithStateExec's shouldRunAnotherBatch),
    evict the idle entity, and serve the revived entity from an empty
    timeline: its post-revival frame must NOT span back into the
    pre-eviction rows even though they are inside the event-time
    window."""
    import time

    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt, out_dir = tmp_path / "ckpt", tmp_path / "out"
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    # window huge vs the event times: absent eviction, EVERY later row's
    # frame would include the earlier rows
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id",
        window_us=1_000_000_000, evict_after_ms=1_500,
    )
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )

    def rows_seen():
        try:
            return {
                r["row_id"]: r for r in spark.read.json(str(out_dir)).collect()
            }
        except Exception:
            return {}

    def wait_for(rids, deadline_s=60):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            got = rows_seen()
            if rids <= set(got):
                return got
            time.sleep(0.3)
        raise AssertionError(f"timed out waiting for {rids}; saw {rows_seen()}")

    try:
        _write_batch(src, "b0.json", [
            {"ent": 1, "row_id": 1, "t_us": 100, "value": 5.0},
            {"ent": 1, "row_id": 2, "t_us": 200, "value": 2.0},
        ])
        got = wait_for({1, 2})
        assert got[2]["n_frame"] == 2  # same-batch frame spans
        # idle past the eviction timeout (timers serviced by empty
        # batches) — the eviction has committed once rid 3 below is
        # served from an empty timeline
        time.sleep(4.0)
    finally:
        q.stop()
    # Revive the entity under a SECOND query on the same checkpoint
    # with a 10-minute eviction timeout. Same ProcessingTimeTimeout
    # state schema (evict_after_ms=None would flip the query to
    # NoTimeout and fail restore with stateStoreValueSchemaNotCompatible
    # — the timeout timestamp is part of the state value schema), but
    # the timer cannot fire between the revival commit and q2.stop(),
    # so the final statestore assertion is deterministic on any
    # machine (no race against the 1.5 s timer during polling/stop
    # latency; round-15 ADVICE).
    out2 = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id",
        window_us=1_000_000_000, evict_after_ms=600_000,
    )
    q2 = (
        out2.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        _write_batch(src, "b1.json", [
            {"ent": 1, "row_id": 3, "t_us": 300, "value": 9.0},
        ])
        got = wait_for({1, 2, 3})
    finally:
        q2.stop()
    # state was dropped: rid 3's frame covers only itself, though rids
    # 1-2 are well inside its event-time window
    assert got[3]["n_frame"] == 1 and got[3]["sum_v"] == 9.0
    # offline state audit (state data source): after eviction +
    # revival the store holds EXACTLY the revived key's single-row
    # timeline — the evicted timeline is gone from the store itself,
    # not merely invisible to the query
    st = spark.read.format("statestore").load(str(ckpt)).collect()
    assert [
        (r["key"]["ent"], list(r["value"]["groupState"]["ts"])) for r in st
    ] == [(1, [300])]


def test_rolling_faces_share_checkpoint(spark, tmp_path):
    """Pin the module-docstring claim (rolling_corr.py): the two plain
    rolling faces keep IDENTICAL state layout (ts ARRAY<BIGINT>,
    vs ARRAY<DOUBLE>) keyed the same way, so a checkpoint written by
    the stats face restores under the corr face. Batch 1 runs through
    rolling_stats_stream; batch 2 through rolling_corr_stream on the
    SAME checkpoint — its frames must span back into the state the
    stats face persisted (n_frame counts batch-1 rows)."""
    from kafkastreams_example_spark.streaming.rolling_corr import (
        rolling_corr_stream,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    kw = dict(entity_cols=("ent",), ts_col="event_time",
              value_col="value", id_col="row_id", window_us=1_000_000)
    _write_batch(src, "b0.json", [
        {"ent": 1, "row_id": 1, "t_us": 100, "value": 1.0},
        {"ent": 1, "row_id": 2, "t_us": 200, "value": 5.0},
        {"ent": 1, "row_id": 3, "t_us": 300, "value": 3.0},
    ])
    q = (
        rolling_stats_stream(stream, **kw)
        .writeStream.format("json")
        .option("path", str(tmp_path / "out_stats"))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    _write_batch(src, "b1.json", [
        {"ent": 1, "row_id": 4, "t_us": 400, "value": 2.0},
    ])
    q = (
        rolling_corr_stream(stream, **kw)
        .writeStream.format("json")
        .option("path", str(tmp_path / "out_corr"))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # read the part files directly: the resumed query's file-sink
    # metadata starts at batch 1 in the fresh out dir, which trips the
    # directory-level _spark_metadata reader (sink bookkeeping, not
    # state restore — the thing under test here)
    import glob
    import json as _json

    got = {}
    for p in glob.glob(str(tmp_path / "out_corr" / "part-*.json")):
        with open(p) as fh:
            for line in fh:
                if line.strip():
                    r = _json.loads(line)
                    got[r["row_id"]] = r
    # rid 4's frame spans rids 1-3 FROM THE STATS FACE'S STATE — and
    # the corr value is the batch kernel's over all four points
    import numpy as np

    assert set(got) == {4} and got[4]["n_frame"] == 4
    want = float(np.corrcoef([100, 200, 300, 400], [1.0, 5.0, 3.0, 2.0])[0, 1])
    assert abs(got[4]["corr"] - want) < 1e-9


def test_rolling_corrected_restart_from_checkpoint(spark, tmp_path):
    """Round-16 verdict item 2: the CORRECTED tier's 5-field rev state
    (ts, vs, ids, seq, floor) across a query RESTART — the plain faces'
    checkpoint restore is pinned elsewhere, but rev continuity is what
    a production incident exercises. Three availableNow rounds, each a
    NEW query on the SAME checkpoint (W = 1,000 us, retention 2W):

      round 1: in-order rows at t=1000 (rid 1), 2000 (rid 2) — rev 0.
      round 2 (restart): late row t=1600 (rid 6) + rows t=3500 (rid 3),
        t=5000 (rid 4). The late row retro-affects rid 2's frame — the
        correction must emit with rev 1, CONTINUING the restored seq
        (a lost-state restart would restamp rev 0), and recompute over
        the RESTORED round-1 timeline (n_frame 3). The round also
        advances the prune floor to 5000 - 2W = 3000.
      round 3 (restart): late row t=3200 (rid 5). rid 3 (t=3500) is
        inside its affected window, but its frame reaches 2500 < floor
        3000 — the restored floor must SUPPRESS the truncated-frame
        correction: round 3 emits ONLY rid 5, stamped rev 2.

    Finally the statestore reader confirms the persisted seq/floor."""
    import glob
    import json as _json

    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )

    def run_round(name):
        out_dir = tmp_path / name
        q = (
            rolling_stats_stream(
                stream, entity_cols=("ent",), ts_col="event_time",
                value_col="value", id_col="row_id",
                window_us=1_000, emit_corrections=True,
            )
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = []
        # part files directly — the resumed file sink's metadata log
        # confuses the directory-level reader (see
        # test_rolling_faces_share_checkpoint)
        for p in glob.glob(str(out_dir / "part-*.json")):
            with open(p) as fh:
                got += [_json.loads(ln) for ln in fh if ln.strip()]
        return {(r["row_id"], r["rev"]): r for r in got}

    _write_batch(src, "b0.json", [
        {"ent": 1, "row_id": 1, "t_us": 1000, "value": 1.0},
        {"ent": 1, "row_id": 2, "t_us": 2000, "value": 5.0},
    ])
    r1 = run_round("out1")
    assert set(r1) == {(1, 0), (2, 0)}  # fresh key: rev 0
    assert r1[(2, 0)]["n_frame"] == 2  # frame [1000, 2000]

    _write_batch(src, "b1.json", [
        {"ent": 1, "row_id": 6, "t_us": 1600, "value": 2.0},
        {"ent": 1, "row_id": 3, "t_us": 3500, "value": 4.0},
        {"ent": 1, "row_id": 4, "t_us": 5000, "value": 8.0},
    ])
    r2 = run_round("out2")
    # rev CONTINUED from the restored seq (1, not a reset 0), and the
    # rid-2 correction recomputed over the restored timeline:
    # frame [1000, 2000] now holds 1000, 1600, 2000
    assert set(r2) == {(6, 1), (3, 1), (4, 1), (2, 1)}
    corr = r2[(2, 1)]
    assert corr["n_frame"] == 3 and corr["sum_v"] == 8.0
    assert r2[(6, 1)]["n_frame"] == 2  # [600, 1600]: rows 1000, 1600

    _write_batch(src, "b2.json", [
        {"ent": 1, "row_id": 5, "t_us": 3200, "value": 7.0},
    ])
    r3 = run_round("out3")
    # prune-floor suppression survived the restart: rid 3 is affected
    # (3200 in [2500, 3500]) but its frame reaches below the restored
    # floor 3000 — only the batch row emits, at the continued rev 2
    assert set(r3) == {(5, 2)}
    assert r3[(5, 2)]["n_frame"] == 1 and r3[(5, 2)]["sum_v"] == 7.0

    # the persisted 5-field state: seq 2, floor 3000, timeline pruned
    # to >= 3000 plus the round-3 row
    st = spark.read.format("statestore").load(str(ckpt)).collect()
    gs = [r["value"]["groupState"] for r in st if r["key"]["ent"] == 1]
    assert len(gs) == 1
    assert gs[0]["seq"] == 2 and gs[0]["floor"] == 3000
    assert sorted(gs[0]["ts"]) == [3200, 3500, 5000]


def test_rolling_corrected_tws_restart_from_persisted_state():
    """Round-16, TWS symmetry for the cross-restart pin: the corrected
    tier's rev continuity and prune-floor suppression must survive a
    processor RESTART through the transformWithState protocol too — a
    NEW processor instance re-init'ed over the persisted value state
    (mock-level analog of a query restart; the e2e run stays
    protobuf-gated). Same timeline as
    test_rolling_corrected_restart_from_checkpoint: W=1,000 us,
    revs must continue 0 -> 1 -> 2 across two restarts, the round-2
    late row re-emits rid 2's correction over the restored timeline,
    and the restored floor suppresses rid 3's truncated-frame
    correction in round 3."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        make_rolling_stats_corrected_processor,
    )

    # mock-handle test: needs only the StatefulProcessor API, not an
    # executable TWS runtime (the old `if not tws_available()` guard
    # was always-truthy — tws_available returns a tuple)
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        import pytest

        pytest.skip("StatefulProcessor API unavailable")

    handle = _MockHandle()

    def run_round(batch_rows, now_ms):
        # a restart = a fresh processor instance re-init'ed over the
        # SAME persisted state (the store outlives the query)
        proc = make_rolling_stats_corrected_processor(1_000)
        h2 = _MockHandle()
        h2.states = handle.states  # the persisted store
        proc.init(h2)
        out = pd.concat(
            list(
                proc.handleInputRows(
                    (1,),
                    [pd.DataFrame(batch_rows,
                                  columns=["t_us", "value", "row_id"])],
                    _MockTimerValues(now_ms),
                )
            ),
            ignore_index=True,
        )
        return {(int(r.row_id), int(r.rev)): r for r in out.itertuples()}

    r1 = run_round([(1_000, 1.0, 1), (2_000, 5.0, 2)], 0)
    assert set(r1) == {(1, 0), (2, 0)}
    assert r1[(2, 0)].n_frame == 2

    r2 = run_round(
        [(1_600, 2.0, 6), (3_500, 4.0, 3), (5_000, 8.0, 4)], 1_000
    )
    assert set(r2) == {(6, 1), (3, 1), (4, 1), (2, 1)}
    assert r2[(2, 1)].n_frame == 3 and r2[(2, 1)].sum_v == 8.0

    r3 = run_round([(3_200, 7.0, 5)], 2_000)
    assert set(r3) == {(5, 2)}
    assert r3[(5, 2)].n_frame == 1 and r3[(5, 2)].sum_v == 7.0
    # the persisted 5-field state agrees with the APWS restart test's
    # statestore assertion: seq 2, floor 3000, timeline pruned to 2W
    ts, _vs, _ids, seq, floor = handle.states["tl"].get()
    assert seq == 2 and floor == 3_000
    assert sorted(ts) == [3_200, 3_500, 5_000]


def test_manifest_table_writer_fencing(spark, tmp_path):
    """Round-15 verdict item 5: the single-writer model is now
    ENFORCED, not just documented. A second writer claiming the table
    (the crash-replacement) bumps the fence epoch; the superseded
    writer's next schema write or commit must fail loudly instead of
    interleaving with the replacement's — and the replacement keeps
    working."""
    import pytest

    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_fence")
    ddl = "k BIGINT, seq BIGINT, op STRING, payload STRING"
    w1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    w1.apply_batch(spark.createDataFrame([(1, 10, "u", "a")], ddl), 0)

    # the replacement takes over (its first write claims a new epoch)
    w2 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    w2.apply_batch(spark.createDataFrame([(2, 20, "u", "b")], ddl), 1)

    # the zombie must not publish — loud failure, nothing committed
    with pytest.raises(RuntimeError, match="fenced out"):
        w1.apply_batch(spark.createDataFrame([(3, 30, "u", "z")], ddl), 2)
    assert w2.versions() == [0, 1]
    got = {r["k"]: r["payload"] for r in w2.read(spark).collect()}
    assert got == {1: "a", 2: "b"}  # no zombie row

    # the live writer continues unharmed
    w2.apply_batch(spark.createDataFrame([(4, 40, "u", "c")], ddl), 2)
    assert w2.versions() == [0, 1, 2]


def test_manifest_table_fencing_mid_merge_supersede(spark, tmp_path):
    """Round-16 verdict item 6: the fence is re-verified at each
    PUBLISH point, not just at method entry. Simulate a supersede
    landing INSIDE a merge — after the zombie's entry check passed but
    before its rename — by no-op'ing the zombie's entry check and
    claiming the fence from a second writer first: the zombie's
    apply_batch must fail at the rename-point ``_verify_fence`` and
    leave NOTHING published (no manifest, no _CURRENT move), even
    though its merge work (data files) already ran."""
    import pytest

    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_mid_merge")
    ddl = "k BIGINT, seq BIGINT, op STRING, payload STRING"
    w1 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    w1.apply_batch(spark.createDataFrame([(1, 10, "u", "a")], ddl), 0)

    # the replacement claims the fence while w1's next merge is
    # "in flight": disabling w1's entry check reproduces the exact
    # interleaving (entry check passed -> supersede -> publish)
    w2 = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    w2.apply_batch(spark.createDataFrame([(2, 20, "u", "b")], ddl), 1)
    w1._ensure_fence = lambda: None
    with pytest.raises(RuntimeError, match="fenced out"):
        w1.apply_batch(spark.createDataFrame([(3, 30, "u", "z")], ddl), 2)

    # nothing of the zombie's merge became durable: manifest history,
    # the _CURRENT pointer, and the read are all the replacement's
    assert w2.versions() == [0, 1]
    assert w2.committed_batch() == 1
    got = {r["k"]: r["payload"] for r in w2.read(spark).collect()}
    assert got == {1: "a", 2: "b"}

    # supersede landing BETWEEN _commit's two renames (manifest
    # already durable, _CURRENT not yet swapped): the zombie raises
    # and deliberately LEAVES the half-published manifest in place —
    # any remove here can race the replacement's own replay of the id
    # and delete a manifest the pointer is about to name (post-close
    # review: two guarded-rollback variants each had a live wedge
    # interleaving). The orphan is inert: the pointer never moved, the
    # read is unchanged, and vacuum resolves any manifest above the
    # pointer instead of letting it steer the keep set (the
    # round-16 hazard the rollback originally targeted).
    calls = {"n": 0}

    def verify_passes_once_then_fenced():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("fenced out (simulated mid-publish)")

    w1._verify_fence = verify_passes_once_then_fenced
    with pytest.raises(RuntimeError, match="fenced out"):
        w1.apply_batch(spark.createDataFrame([(5, 50, "u", "z2")], ddl), 3)
    assert w2.versions() == [0, 1, 3], "orphan above the pointer is left in place"
    assert w2.committed_batch() == 1
    got = {r["k"]: r["payload"] for r in w2.read(spark).collect()}
    assert got == {1: "a", 2: "b"}, "pointer-resolved read unaffected by the orphan"
    del w1._verify_fence  # restore the real method
    # vacuum (as the replacement, which holds the fence) resolves the
    # zombie's orphan against the pointer rather than keeping it
    w2.vacuum(keep_last=2)
    assert w2.versions() == [0, 1]
    assert w2.committed_batch() == 1

    # and vacuum's destructive phase re-verifies BEFORE the schema-
    # orphan purge: a zombie vacuum must not delete the replacement's
    # just-written (not-yet-committed) schema version
    import os as _os

    orphan = _os.path.join(path, "_SCHEMA-99.json")
    with open(orphan, "w") as fh:
        fh.write(w2._schema_at(None).json())
    w1._fence_epoch = 1  # stale claim (w2 holds epoch 2)
    with pytest.raises(RuntimeError, match="fenced out"):
        w1.vacuum(keep_last=1)
    assert _os.path.exists(orphan), (
        "zombie vacuum purged the replacement's in-flight schema version"
    )
    _os.remove(orphan)
    assert w2.versions() == [0, 1]


def test_rolling_stats_tws_processor_matches_apws_tier():
    """Round-15: the TWS face of the rolling-stats kernel
    (streaming/rolling_stats_tws.py), unit-tested with mock handles
    (no protobuf here — the processor logic is plain Python over the
    SHARED stats_kernel): driven over the same three micro-batches,
    its outputs must equal the applyInPandasWithState tier's
    row-for-row, including frames that span batch boundaries through
    state; and the evict timer must follow the delete-then-register
    discipline (exactly one live timer per hot key), with expiry
    clearing the timeline and a revived key served as fresh."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_stats import (
        make_rolling_stats_fn,
    )
    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        make_rolling_stats_processor,
    )

    W, EVICT = 1_000, 5_000
    batches = [
        pd.DataFrame([(1, 100, 5.0), (2, 150, 2.0)],
                     columns=["row_id", "t_us", "value"]),
        pd.DataFrame([(5, 900, 9.0)],
                     columns=["row_id", "t_us", "value"]),
        pd.DataFrame([(7, 1100, 1.0), (8, 5000, 3.0)],
                     columns=["row_id", "t_us", "value"]),
    ]
    proc = make_rolling_stats_processor(W, "row_id", EVICT)
    handle = _MockHandle()
    proc.init(handle)
    ref_fn = make_rolling_stats_fn(W, "row_id")
    ref_state = _FakeGroupState()
    for i, b in enumerate(batches):
        got = pd.concat(
            list(proc.handleInputRows(("k",), [b], _MockTimerValues(i * 1000))),
            ignore_index=True,
        )
        want = pd.concat(
            list(ref_fn(("k",), iter([b.copy()]), ref_state)),
            ignore_index=True,
        )
        pd.testing.assert_frame_equal(got, want)
        # delete-then-register: exactly ONE live timer, re-based
        assert handle.timers == {i * 1000 + EVICT}, i
    # state carries the same retained timeline as the APWS tier
    tl = handle.states["tl"].get()
    assert list(tl[0]) == list(ref_state.get[0])
    assert list(tl[1]) == list(ref_state.get[1])

    # expiry: timeline forgotten, nothing yielded; revival == fresh
    handle.timers.clear()
    assert list(proc.handleExpiredTimer(("k",), _MockTimerValues(10**9), None)) == []
    assert handle.states["tl"].get() is None
    assert handle.states["tmr"].get() is None
    revive = pd.DataFrame([(9, 5100, 4.0)], columns=["row_id", "t_us", "value"])
    got = pd.concat(
        list(proc.handleInputRows(("k",), [revive], _MockTimerValues(10**9))),
        ignore_index=True,
    )
    # rid 8 (t=5000) would be in rid 9's frame had state survived
    assert got["n_frame"].tolist() == [1] and got["sum_v"].tolist() == [4.0]
    assert handle.timers == {10**9 + EVICT}


def test_rolling_stats_tws_stream_end_to_end(spark, tmp_path):
    """Full TWS streaming run of the rolling-stats face — executes
    only where protobuf exists (skipped in this sandbox); semantics
    must match the applyInPandasWithState tier on the same input."""
    import pytest

    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"transformWithState unavailable: {reason}")

    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )
    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        rolling_stats_stream_tws,
    )

    rows = [
        (1, 1, 100, 5.0), (1, 2, 150, 2.0), (2, 3, 180, 4.0),
        (1, 5, 900, 9.0), (2, 6, 950, 6.0), (1, 7, 1100, 1.0),
    ]
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b0.json", [
        dict(zip(("ent", "row_id", "t_us", "value"), r)) for r in rows
    ])
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream_tws(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=1_000,
    )
    q = (
        out.writeStream.format("json")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["row_id"]: r
           for r in spark.read.json(str(tmp_path / "out")).collect()}
    df = spark.createDataFrame(
        rows, "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
    )
    want = {r["row_id"]: r for r in rolling_range_stats(
        df, ["ent"], "t_us", "value", 1_000, ["row_id"]
    ).collect()}
    assert set(got) == set(want)
    for rid, g in got.items():
        assert g["n_frame"] == want[rid]["n_frame"], rid
        assert math.isclose(g["sum_v"], want[rid]["sum_v"], abs_tol=1e-9)


def test_state_source_inspects_rolling_state(spark, tmp_path):
    """Ops story pin (round 15): Spark's state data source
    (format 'statestore') reads the rolling face's checkpoint offline
    — the tool an operator uses to AUDIT state size and retention
    without touching the running query. The retained timeline it
    shows must be exactly the retention contract's: the merged
    timeline behind the key's max event time minus one window."""
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b0.json", [
        {"ent": 1, "row_id": 1, "t_us": 100, "value": 5.0},
        {"ent": 1, "row_id": 2, "t_us": 200, "value": 2.0},
        {"ent": 1, "row_id": 3, "t_us": 1150, "value": 9.0},  # prunes 100
    ])
    stream = (
        spark.readStream.schema(
            "ent BIGINT, row_id BIGINT, t_us BIGINT, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("t_us")))
    )
    out = rolling_stats_stream(
        stream, entity_cols=("ent",), ts_col="event_time",
        value_col="value", id_col="row_id", window_us=1_000,
    )
    ckpt = tmp_path / "ckpt"
    q = (
        out.writeStream.format("json")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    st = spark.read.format("statestore").load(str(ckpt)).collect()
    assert len(st) == 1
    row = st[0]
    assert row["key"]["ent"] == 1
    # retention horizon = max t (1150) − W (1000) = 150: t=100 pruned
    assert list(row["value"]["groupState"]["ts"]) == [200, 1150]
    assert list(row["value"]["groupState"]["vs"]) == [2.0, 9.0]


def test_rolling_corr_tws_processor_matches_apws_tier():
    """TWS symmetry for the corr face (rolling_corr_tws.py): same
    mock-handle protocol test as the stats face — batch-for-batch
    output equality against the applyInPandasWithState tier over the
    shared corr_kernel, one live timer per hot key, expiry clears the
    timeline, revival served fresh. Covers the defined-corr contract
    too (batch 1 emits nothing until a second in-window point
    exists... here rid 2's frame reaches rid 1, so it emits)."""
    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_corr import (
        make_rolling_corr_fn,
    )
    from kafkastreams_example_spark.streaming.rolling_corr_tws import (
        make_rolling_corr_processor,
    )

    W, EVICT = 1_000, 5_000
    batches = [
        pd.DataFrame([(1, 100, 5.0), (2, 150, 2.0)],
                     columns=["row_id", "t_us", "value"]),
        pd.DataFrame([(5, 900, 9.0)],
                     columns=["row_id", "t_us", "value"]),
        pd.DataFrame([(7, 1100, 1.0), (8, 5000, 3.0)],
                     columns=["row_id", "t_us", "value"]),
    ]
    proc = make_rolling_corr_processor(W, "row_id", EVICT)
    handle = _MockHandle()
    proc.init(handle)
    ref_fn = make_rolling_corr_fn(W, "row_id")
    ref_state = _FakeGroupState()
    for i, b in enumerate(batches):
        got = pd.concat(
            list(proc.handleInputRows(("k",), [b], _MockTimerValues(i * 1000))),
            ignore_index=True,
        )
        want = pd.concat(
            list(ref_fn(("k",), iter([b.copy()]), ref_state)),
            ignore_index=True,
        )
        pd.testing.assert_frame_equal(got, want)
        assert handle.timers == {i * 1000 + EVICT}, i
    tl = handle.states["tl"].get()
    assert list(tl[0]) == list(ref_state.get[0])
    assert list(tl[1]) == list(ref_state.get[1])
    # expiry + revival: fresh key, single point → undefined corr, no rows
    handle.timers.clear()
    assert list(proc.handleExpiredTimer(("k",), _MockTimerValues(10**9), None)) == []
    assert handle.states["tl"].get() is None
    revive = pd.DataFrame([(9, 5100, 4.0)], columns=["row_id", "t_us", "value"])
    got = pd.concat(
        list(proc.handleInputRows(("k",), [revive], _MockTimerValues(10**9))),
        ignore_index=True,
    )
    assert len(got) == 0  # n=1 frame: corr undefined — not emitted
    # but the revived timeline IS retained for the next batch
    assert list(handle.states["tl"].get()[0]) == [5100]


def test_rolling_stats_tws_eviction_timer_end_to_end(spark, tmp_path):
    """Real TWS timer on the ROLLING face (round 17; the dedup face
    has its own timer e2e — this pins the shared _evict machinery on
    the second processor class): with ``evict_after_ms`` an idle
    entity's timeline is dropped wholesale, so a post-TTL row serves
    from an EMPTY timeline (n_frame restarts at 1) instead of
    counting the pre-idle rows its 1 h window would otherwise
    retain."""
    import time as _t

    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        rolling_stats_stream_tws,
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"TWS not executable here: {reason}")

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            "row_id BIGINT, ts_ms BIGINT, ent STRING, value DOUBLE"
        )
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = rolling_stats_stream_tws(
        stream,
        entity_cols=("ent",),
        ts_col="event_time",
        value_col="value",
        id_col="row_id",
        window_us=3_600_000_000,  # 1 h — nothing ages out by event time
        evict_after_ms=15_000,
    )
    q = (
        out.writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )

    def frames() -> dict[int, int]:
        try:
            df = spark.read.schema("row_id BIGINT, n_frame BIGINT").json(
                str(out_dir)
            )
            return {
                r["row_id"]: r["n_frame"]
                for r in df.collect()
                if r["row_id"] is not None
            }
        except Exception:  # noqa: BLE001 — sink dir not created yet
            return {}

    def wait_rows(n: int, timeout_s: float = 60.0) -> dict[int, int]:
        deadline = _t.monotonic() + timeout_s
        got = frames()
        while len(got) < n and _t.monotonic() < deadline:
            _t.sleep(0.5)
            got = frames()
        return got

    def rows(*triples):
        return [
            {"row_id": rid, "ts_ms": ts, "ent": "E", "value": v}
            for rid, ts, v in triples
        ]

    try:
        _write_batch(src, "b0.json", rows((1, 1_000, 5.0), (2, 2_000, 7.0)))
        got = wait_rows(2)
        assert got == {1: 1, 2: 2}, got  # growing frame, pre-idle
        # idle past the TTL: the timer fires in a no-data micro-batch
        _t.sleep(20.0)
        _write_batch(src, "b1.json", rows((3, 3_000, 9.0)))
        got = wait_rows(3)
        # the revived entity serves from an EMPTY timeline: n_frame 1,
        # NOT 3 (its 1 h window would otherwise still hold rows 1-2)
        assert got == {1: 1, 2: 2, 3: 1}, got
    finally:
        q.stop()


def test_statestore_reader_on_tws_state(spark, tmp_path):
    """Offline state audit for the v2 state API (round 17 — first
    round TWS executes here): Spark's state data source reads a
    transformWithState checkpoint PER STATE VARIABLE (option
    stateVarName, matching the handle.getValueState name), so the
    dedup TWS tier's remembered timelines are inspectable offline
    exactly like the APWS tier's GroupState — the operational story
    (audit a live table's state without the query) carries over to
    the new API."""
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        pytest.skip(f"TWS not executable here: {reason}")

    src, ckpt, out_dir = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()
    _write_batch(
        src,
        "b0.json",
        [
            _event(1, 1_000, "A"),
            _event(2, 2_000, "A"),   # in-window dup: suppressed, REMEMBERED
            _event(3, 5_000, "B"),
        ],
    )
    stream = (
        spark.readStream.schema("row_id BIGINT, ts_ms BIGINT, dedup_id STRING")
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        dedup_refresh_stream_tws(stream)
        .writeStream.format("json")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _read_sink(spark, out_dir) == {1, 3}

    st = (
        spark.read.format("statestore")
        .option("stateVarName", "seen")
        .load(str(ckpt))
        .collect()
    )
    seen = {r["key"][0]: sorted(r["value"][0]) for r in st}
    # the reference remembers EVERY processed timestamp — the
    # suppressed dup's 2000 included (refresh semantics)
    assert seen == {"A": [1_000, 2_000], "B": [5_000]}


def test_vacuum_takes_writership_under_fencing(spark, tmp_path):
    """vacuum() is a write and claims the fence (round-15): an ops
    instance vacuuming a live table TAKES writership — the vacuum
    itself succeeds, and the old writer's next publish fails loudly
    instead of interleaving with post-maintenance state."""
    import pytest

    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    path = str(tmp_path / "cdc_vac_fence")
    ddl = "k BIGINT, seq BIGINT, op STRING, payload STRING"
    writer = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    writer.apply_batch(spark.createDataFrame([(1, 10, "u", "a")], ddl), 0)
    writer.apply_batch(spark.createDataFrame([(2, 20, "u", "b")], ddl), 1)

    ops = CdcTable(path, key="k", n_buckets=4, payload_cols=("payload",))
    assert ops.vacuum(keep_last=1) == [0]  # claims the fence, expires 0

    with pytest.raises(RuntimeError, match="fenced out"):
        writer.apply_batch(
            spark.createDataFrame([(3, 30, "u", "z")], ddl), 2
        )
    # the table is intact under the new writership
    got = {r["k"]: r["payload"] for r in ops.read(spark).collect()}
    assert got == {1: "a", 2: "b"}


def test_rolling_corrected_tws_processors_match_apws_tiers():
    """TWS faces of the CORRECTED emission tiers (both kernels):
    driven with mock handles over RANDOMIZED out-of-order batch splits,
    each processor's per-batch output must equal the
    applyInPandasWithState corrected tier's row-for-row — corrections,
    rev stamps, prune-floor suppression and all (both delegate to the
    same corrected_*_kernel, so this pins the protocol glue: state
    tuple round-trip through the value-state handle, fresh-key None
    handling, timer lifecycle)."""
    import random

    import pandas as pd

    from kafkastreams_example_spark.streaming.rolling_corr import (
        make_rolling_corr_corrected_fn,
    )
    from kafkastreams_example_spark.streaming.rolling_corr_tws import (
        make_rolling_corr_corrected_processor,
    )
    from kafkastreams_example_spark.streaming.rolling_stats import (
        make_rolling_stats_corrected_fn,
    )
    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        make_rolling_stats_corrected_processor,
    )

    rng = random.Random(151)
    W, EVICT = 100, 7_000
    pairs = [
        (make_rolling_stats_corrected_fn, make_rolling_stats_corrected_processor),
        (make_rolling_corr_corrected_fn, make_rolling_corr_corrected_processor),
    ]
    for make_fn, make_proc in pairs:
        for _trial in range(8):
            n = rng.randint(5, 25)
            rows = [
                (i + 1, rng.randrange(0, 400),
                 round(rng.uniform(-5.0, 5.0), 3))
                for i in range(n)
            ]
            rng.shuffle(rows)
            batches, i = [], 0
            while i < len(rows):
                k = rng.randint(1, 4)
                batches.append(pd.DataFrame(
                    rows[i:i + k], columns=["row_id", "t_us", "value"]
                ))
                i += k
            fn = make_fn(W, "row_id", 2, EVICT)
            ref_state = _FakeGroupState()
            proc = make_proc(W, "row_id", 2, EVICT)
            handle = _MockHandle()
            proc.init(handle)
            for j, b in enumerate(batches):
                want = pd.concat(
                    list(fn(("k",), iter([b.copy()]), ref_state)),
                    ignore_index=True,
                )
                got = pd.concat(
                    list(proc.handleInputRows(
                        ("k",), [b.copy()], _MockTimerValues(j * 1000)
                    )),
                    ignore_index=True,
                )
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True),
                    want.reset_index(drop=True),
                )
                assert handle.timers == {j * 1000 + EVICT}
            # the state tuples agree field-for-field
            tws_state = handle.states["tl"].get()
            for a, b_ in zip(tws_state, ref_state.get):
                assert (list(a) if isinstance(a, list) else a) == (
                    list(b_) if isinstance(b_, list) else b_
                ), (make_fn.__name__,)


def test_coalesced_tws_processor_matches_apws_tier():
    """TWS face of the key-coalesced dedup tier (the last stateful op
    to gain both-APIs symmetry): mock-handle parity against
    make_coalesced_refresh_fn over randomized multi-batch feeds with
    late-arriving new ids (the round-13 advisory's hard case), plus
    the pack-eviction timer lifecycle."""
    import random

    import pandas as pd

    from kafkastreams_example_spark.streaming.dedup_refresh import (
        make_coalesced_refresh_fn,
    )
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        make_coalesced_refresh_processor,
    )

    rng = random.Random(152)
    W = 600_000
    cols = ("dedup_id", "row_id", "ts_ms")
    for _trial in range(8):
        ids = [f"i{j}" for j in range(rng.randint(1, 5))]
        batches = []
        rid = 0
        for _ in range(rng.randint(2, 5)):
            rows = []
            for _ in range(rng.randint(1, 8)):
                rid += 1
                rows.append(
                    (rng.choice(ids), rid, rng.randrange(0, 3 * W))
                )
            batches.append(pd.DataFrame(rows, columns=cols))
        fn = make_coalesced_refresh_fn(W, cols, "event", evict=True)
        ref_state = _FakeGroupState()
        proc = make_coalesced_refresh_processor(
            W, cols, "event", evict=True
        )
        handle = _MockHandle()
        proc.init(handle)
        for j, b in enumerate(batches):
            want = pd.concat(
                list(fn(("k",), iter([b.copy()]), ref_state)),
                ignore_index=True,
            )
            got = pd.concat(
                list(proc.handleInputRows(
                    ("k",), [b.copy()], _MockTimerValues(j * 1000)
                )),
                ignore_index=True,
            )
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want.reset_index(drop=True)
            )
            assert handle.timers == {j * 1000 + W}
        # CSR state agrees field-for-field on the semantic fields
        # (ids/offsets/ts); last_seen is a processing-time stamp and
        # the two faces run on different clocks here (wall clock vs
        # the mock timer), so only its SHAPE is comparable
        tws_st, ref_st = handle.states["csr"].get(), ref_state.get
        for a, b_ in zip(tws_st[:3], ref_st[:3]):
            assert list(a) == list(b_)
        assert len(tws_st[3]) == len(ref_st[3]) == len(ref_st[0])
        # pack expiry: forgotten wholesale; revival decides fresh
        handle.timers.clear()
        assert list(
            proc.handleExpiredTimer(("k",), _MockTimerValues(10**9), None)
        ) == []
        assert handle.states["csr"].get() is None


def test_proto_vendor_rollback_purges_partial_imports(tmp_path):
    """_proto_vendor failure path (round-18 advice): a vendor dir whose
    google.protobuf import FAILS must roll back env/sys.path AND purge
    the partially-imported vendored google* modules from sys.modules —
    otherwise a later real protobuf install in the same process keeps
    resolving against the broken vendored halves. The test snapshots
    and restores the real activation state (the session may already
    run on the vendored runtime)."""
    import os
    import sys

    from kafkastreams_example_spark import _proto_vendor as pv

    # broken vendor: `google` package resolves, `google.protobuf` raises
    vendor = tmp_path / "vendor"
    (vendor / "google" / "protobuf").mkdir(parents=True)
    (vendor / "google" / "__init__.py").write_text("")
    (vendor / "google" / "protobuf" / "__init__.py").write_text(
        "raise ImportError('broken vendored protobuf')\n"
    )

    saved_mods = {
        m: sys.modules[m]
        for m in list(sys.modules)
        if m == "google" or m.startswith("google.")
    }
    saved_result = pv._result
    saved_dir = pv.VENDOR_DIR
    saved_check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
    saved_pypath = os.environ.get("PYTHONPATH")
    saved_sys_path = list(sys.path)
    try:
        for m in saved_mods:
            del sys.modules[m]
        pv._result = None
        # strip the REAL vendor dir too: if an earlier test activated
        # the session's vendored runtime, the "system protobuf" probe
        # would succeed off sys.path and never reach the failure path
        sys.path[:] = [p for p in sys.path if p != saved_dir]
        pv.VENDOR_DIR = str(vendor)
        os.environ.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)

        # sibling-prefix probe (round-19 advice): a module loaded from
        # a directory that merely SHARES the vendor dir's string prefix
        # (vendor + "_extras") must survive the purge — the purge
        # matches VENDOR_DIR + os.sep, not a bare startswith
        import types

        sibling = types.ModuleType("google.sibling_probe")
        sibling.__file__ = str(vendor) + "_extras" + os.sep + "google" + os.sep + "x.py"
        sys.modules["google.sibling_probe"] = sibling

        ok, reason = pv.activate_vendored_protobuf()

        assert not ok and "unusable" in reason
        assert "google.sibling_probe" in sys.modules
        # env + sys.path rolled back
        assert "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" not in os.environ
        assert str(vendor) not in sys.path
        assert str(vendor) not in (os.environ.get("PYTHONPATH") or "")
        # the partially-imported vendored modules are purged: nothing
        # under the vendor dir (by __file__ or namespace __path__)
        # remains cached
        vendor_prefix = str(vendor) + os.sep
        for m in [x for x in sys.modules if x == "google" or x.startswith("google.")]:
            obj = sys.modules[m]
            f = getattr(obj, "__file__", None) or ""
            paths = list(getattr(obj, "__path__", []) or [])
            assert not f.startswith(vendor_prefix), m
            assert not any(p.startswith(vendor_prefix) for p in paths), m
    finally:
        for m in [x for x in sys.modules if x == "google" or x.startswith("google.")]:
            del sys.modules[m]
        sys.modules.update(saved_mods)
        sys.path[:] = saved_sys_path
        pv._result = saved_result
        pv.VENDOR_DIR = saved_dir
        if saved_check is not None:
            os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = saved_check
        if saved_pypath is not None:
            os.environ["PYTHONPATH"] = saved_pypath
        elif "PYTHONPATH" in os.environ:
            del os.environ["PYTHONPATH"]
