"""SparkSession factory with scale-aware defaults.

The defaults here are chosen for correctness parity with the DuckDB
oracle (UTC session time zone, nanos-as-long parquet reads — the driver
testdata stores TIMESTAMP(NANOS) which Spark cannot read natively) and
for 100 TB-readiness (AQE with coalesce + skew-join handling enabled, so
the same logical plans re-plan at runtime on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Rough analog of the reference's 1000 ms commit interval
# (KafkaStreamsApplication.java:63): our streaming pipelines default to a
# 1 s processing-time trigger (see streaming/pipelines.py).
DEFAULT_TRIGGER = "1 second"


def get_spark(
    app_name: str = "kafkastreams-example-spark",
    cpus: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster these configs are deploy-time; in local mode we set
    master=local[$SPARK_GRAFT_CPUS]. shuffle_partitions defaults to the
    core count — at 100 TB you would instead size it so post-shuffle
    partitions land near spark.sql.adaptive.advisoryPartitionSizeInBytes
    and let AQE coalesce (enabled below).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    # vendored-protobuf activation must precede JVM launch: local-mode
    # Python workers inherit the driver env (PYTHONPATH + the protobuf
    # version-check override) at JVM start — see _proto_vendor.py.
    # No-op where a real protobuf is installed or none is available.
    from ._proto_vendor import activate_vendored_protobuf

    activate_vendored_protobuf()
    _ensure_driver_jvm_opts()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # In local mode the driver JVM hosts every executor thread, all
        # cached blocks, AND broadcast builds; the JVM default (~1 GiB)
        # silently starves all of them (observed: "Not enough memory to
        # build and broadcast" at 30x sf0.1 with a persisted shingle
        # cache). On a real cluster this is a deploy-time setting;
        # locally, size it to the machine. Only effective before JVM
        # start — getOrCreate() on a live session ignores it.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # Deterministic timestamp semantics, matching the (tz-naive) oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata is TIMESTAMP(NANOS) parquet; Spark has no ns type,
        # so read as long and convert in sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # µs/ms parquet with isAdjustedToUTC=false must surface as LTZ,
        # not TIMESTAMP_NTZ — the engine's epoch arithmetic (casts to
        # double, unix_millis) rejects NTZ. load_table also normalizes
        # per-column as a second line of defense.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # runtime join-strategy switches. Essential at scale, free locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE apply inside CACHED plans too (off by default): the
        # engine stages several reused intermediates via persist()
        # (shingle frames, merge deltas, normalized corpora), and
        # without this every cached frame materializes at the raw
        # shuffle-partition width — its consumers then each pay one
        # task per un-coalesced partition. Scale-independent: at any
        # size AQE picks the partition count from actual bytes
        # (advisoryPartitionSizeInBytes), which is exactly what a
        # cached intermediate should use (guide §2.2).
        # Both planner toggles are env-overridable (round-20 ADVICE):
        # they are session-global, so a large-scale deployment that
        # wants to restore sort-merge preference (or raw cached-plan
        # partitioning) can flip them without a code change.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_GRAFT_CACHED_PLAN_AQE", "true"),
        )
        # Let the planner pick shuffled-hash over sort-merge when its
        # build-side size conditions hold (guide §3.1/§9): same results,
        # no per-partition sort. Sort-merge remains the fallback
        # whenever the size checks fail, so the OOM-safety story at
        # scale is unchanged.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # Arrow for any pandas-UDF path (similarity / multimodal / stateful).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # RocksDB-backed state for streaming stateful ops (dedup): the Spark
        # analog of the reference's persistent window store
        # (KStreamDistinct.java:135-144).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_shuffle_partitions()))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _ensure_driver_jvm_opts() -> None:
    """Size the JIT code cache before the driver JVM launches.

    A long-lived session that plans and runs hundreds of distinct
    queries generates thousands of whole-stage-codegen classes; the
    JVM default ReservedCodeCacheSize (240 MB, segmented into ~118 MB
    code heaps) saturates partway through, after which the sweeper
    discards hot nmethods and later queries run partially interpreted.
    Measured on this repo's 129-query bench: the 'profiled nmethods'
    heap passed 87/118 MB within ONE pass, and entries late in the run
    read 1.6-3x their isolated wall (e.g. sql_q20 2.68 s in-bench vs
    1.47 s isolated) — a pure JVM artifact, not a plan property.

    Must run before the py4j gateway starts (JVM flags are
    launch-time); no-op when the JVM is already up or the caller has
    provided its own --driver-java-options. Override the size (or
    disable with an empty value) via $SPARK_GRAFT_DRIVER_JAVA_OPTS.
    On a real cluster the same flag belongs in
    spark.executor.extraJavaOptions for codegen-heavy executors."""
    from pyspark import SparkContext

    if (
        getattr(SparkContext, "_gateway", None) is not None
        or SparkContext._active_spark_context is not None
    ):
        return
    opts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
    )
    if not opts:
        return
    existing = os.environ.get("PYSPARK_SUBMIT_ARGS")
    if existing:
        if "--driver-java-options" in existing:
            return
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f'--driver-java-options "{opts}" ' + existing
        )
    else:
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f'--driver-java-options "{opts}" pyspark-shell'
        )


def _default_shuffle_partitions() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return max(int(cpus), 4)
    return os.cpu_count() or 8
