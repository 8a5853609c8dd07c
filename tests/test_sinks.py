"""Sink-layout tests: partition pruning and shuffle-free bucketed joins
— asserted on physical plans, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_example_spark.plans.explain import plan_string
from kafkastreams_example_spark.sources.sinks import (
    read_partition_pruned,
    write_bucketed,
    write_partitioned,
)
from kafkastreams_example_spark.sources.tables import load_table

from conftest import SF_DIR


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    back = read_partition_pruned(spark, path).filter(F.col("event_type") == "error")
    plan = plan_string(back)
    assert "PartitionFilters" in plan and "event_type" in plan
    # pruned read returns exactly the error slice
    expected = ev.filter(F.col("event_type") == "error").count()
    assert back.count() == expected


def test_compaction_reduces_file_count(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)  # 64 tiny files
    from kafkastreams_example_spark.sources.sinks import compact

    n = compact(spark, frag, target_file_bytes=8 * 1024 * 1024)
    assert n < 64
    back = spark.read.parquet(frag + "__compact")
    assert back.count() == ev.count()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey",
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        li, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey",
        path=str(tmp_path / "lineitem_b"),
    )
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        # disable broadcast so the join strategy decision is about
        # bucketing, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the same thing as the unbucketed join
        assert joined.count() == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_orc_roundtrip_prunes_and_pushes(spark, tmp_path):
    """ORC sink tier: partition pruning and predicate pushdown work
    through the same declarative layout as parquet (Spark bundles the
    ORC datasource natively — no extra artifact), and the roundtrip is
    value-exact. Pins fmt='orc' as a supported estate choice."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = str(tmp_path / "events_orc")
    write_partitioned(ev, path, ["event_type"], fmt="orc")

    back = spark.read.orc(path).filter(
        (F.col("event_type") == "error") & (F.col("user_id") > 5)
    )
    plan = plan_string(back)
    assert "PartitionFilters" in plan and "event_type" in plan
    assert "PushedFilters" in plan and "user_id" in plan
    want = sorted(
        (r["event_id"], r["value"])
        for r in ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") > 5)
        ).collect()
    )
    got = sorted((r["event_id"], r["value"]) for r in back.collect())
    assert got == want and len(got) > 0
    # the read_partition_pruned front door reads ORC too
    via_helper = read_partition_pruned(spark, path, fmt="orc").filter(
        F.col("event_type") == "error"
    )
    assert "PartitionFilters" in plan_string(via_helper)


def test_bucketed_orc_join_skips_shuffle(spark, tmp_path):
    """Round-12 parity item: the ORC tier must carry the same
    shuffle-free bucketed-join property as parquet — bucketing metadata
    lives in the catalog, not the file format, so a same-key/same-count
    ORC⋈ORC join compiles to SortMergeJoin with NO Exchange."""
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_ob", "o_orderkey", 8, sort_col="o_orderkey",
        path=str(tmp_path / "orders_ob"), fmt="orc",
    )
    write_bucketed(
        li, "lineitem_ob", "l_orderkey", 8, sort_col="l_orderkey",
        path=str(tmp_path / "lineitem_ob"), fmt="orc",
    )
    try:
        ob = spark.table("orders_ob")
        lb = spark.table("lineitem_ob")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed ORC join shuffles:\n{plan}"
        assert (
            joined.count()
            == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_ob")
        spark.sql("DROP TABLE IF EXISTS lineitem_ob")


def test_zone_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    """Round-13 verdict item 8: the zone map must be a real file-skip
    at the read path, not just a report. write_zoned lays orders out in
    z-order buckets with a _ZONEMAP.json sidecar; read_zone_pruned on a
    selective 2-D box must (a) read a strict subset of the files, all
    from surviving zbucket dirs, (b) return EXACTLY the rows of the
    full scan under the same predicates, (c) prune on a single
    constrained dimension too, and (d) raise on a column without zone
    stats. An impossible box returns empty without scanning."""
    import pytest

    from kafkastreams_example_spark.sources.sinks import (
        read_zone_pruned,
        write_zoned,
    )

    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("y"),
    )
    path = str(tmp_path / "zoned")
    write_zoned(orders, path, ("x", "y"), n_buckets=64)

    full = spark.read.option("basePath", path).parquet(path)
    n_files_full = len(full.inputFiles())
    ext = orders.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    x_lo = ext[0] + (ext[1] - ext[0]) * 10 // 100
    x_hi = ext[0] + (ext[1] - ext[0]) * 25 // 100
    y_lo = ext[2] + (ext[3] - ext[2]) * 30 // 100
    y_hi = ext[2] + (ext[3] - ext[2]) * 55 // 100

    pruned = read_zone_pruned(
        spark, path, {"x": (x_lo, x_hi), "y": (y_lo, y_hi)}
    )
    files = pruned.inputFiles()
    assert 0 < len(files) < n_files_full  # real skip
    assert all("/zbucket=" in f for f in files)
    want = sorted(
        r["o_orderkey"]
        for r in full.filter(
            F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
        ).collect()
    )
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == want and len(got) > 0  # parity, non-degenerate

    # single-dimension constraint prunes too
    one = read_zone_pruned(spark, path, {"x": (x_lo, x_hi)})
    assert 0 < len(one.inputFiles()) < n_files_full
    assert one.count() == full.filter(F.col("x").between(x_lo, x_hi)).count()

    # impossible box: no surviving buckets, empty result, same schema
    empty = read_zone_pruned(spark, path, {"x": (ext[1] + 10, ext[1] + 20)})
    assert empty.count() == 0
    assert set(full.columns) == set(empty.columns)

    with pytest.raises(ValueError, match="no zone stats"):
        read_zone_pruned(spark, path, {"o_orderkey": (0, 1)})


def test_zone_pruned_read_three_dims_with_double_column(spark, tmp_path):
    """Round-14: write_zoned generalized to d dims, and the round-13
    ADVICE fix — a DOUBLE zone column used to fail analysis under the
    integral SQL ``div`` quantizer. Zone orders on (x BIGINT, y BIGINT,
    price DOUBLE); a 3-D box must skip files while EQUALing the full
    scan under the same predicates, and a box on the DOUBLE dim alone
    must prune too."""
    import pytest

    from kafkastreams_example_spark.sources.sinks import (
        read_zone_pruned,
        write_zoned,
    )

    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("y"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    path = str(tmp_path / "zoned3")
    write_zoned(orders, path, ("x", "y", "price"), n_buckets=64)

    full = spark.read.option("basePath", path).parquet(path)
    n_files_full = len(full.inputFiles())
    ext = orders.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y"),
        F.min("price"), F.max("price"),
    ).collect()[0]
    box = {
        "x": (ext[0] + (ext[1] - ext[0]) * 0.10, ext[0] + (ext[1] - ext[0]) * 0.35),
        "y": (ext[2] + (ext[3] - ext[2]) * 0.20, ext[2] + (ext[3] - ext[2]) * 0.60),
        "price": (ext[4] + (ext[5] - ext[4]) * 0.15, ext[4] + (ext[5] - ext[4]) * 0.50),
    }
    pruned = read_zone_pruned(spark, path, box)
    files = pruned.inputFiles()
    assert 0 < len(files) < n_files_full  # real skip at d=3
    assert all("/zbucket=" in f for f in files)
    pred = None
    for c, (lo, hi) in box.items():
        p = F.col(c).between(F.lit(lo), F.lit(hi))
        pred = p if pred is None else pred & p
    want = sorted(r["o_orderkey"] for r in full.filter(pred).collect())
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == want and len(got) > 0

    # the DOUBLE dimension alone prunes and matches the full scan
    dbl = read_zone_pruned(spark, path, {"price": box["price"]})
    assert 0 < len(dbl.inputFiles()) < n_files_full
    lo, hi = box["price"]
    assert dbl.count() == full.filter(F.col("price").between(lo, hi)).count()

    # guard rails: <2 dims and over-wide bucket counts raise
    with pytest.raises(ValueError, match="at least two"):
        write_zoned(orders, path, ("x",), n_buckets=4)
    with pytest.raises(ValueError, match="power of two"):
        write_zoned(orders, path, ("x", "y"), n_buckets=48)


def test_resolve_staging_prefers_checkpoint_dir(spark, tmp_path):
    """Round-13 ADVICE (medium): staged intermediates must land on an
    EXECUTOR-visible path — explicit staging_dir first, then the
    cluster-shared SparkContext checkpoint dir, tempdir only as the
    local-mode fallback. ssjoin_prefix_pairs must stage under the
    caller's dir and still return exact pairs."""
    from kafkastreams_example_spark.functions.dedup_approx import (
        ssjoin_prefix_pairs,
    )
    from kafkastreams_example_spark.functions.staging import resolve_staging

    explicit = str(tmp_path / "scratch")
    p = resolve_staging(spark, "unit_", explicit)
    assert p.startswith(explicit + "/unit_")
    p2 = resolve_staging(spark, "unit_", explicit)
    assert p2 != p  # fresh dir per staged table

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        auto = resolve_staging(spark, "unit_")
        # Spark may render the checkpoint dir as a file: URI
        assert "ckpt" in auto and "/unit_" in auto
    finally:
        # clear the session-scoped checkpoint dir (the scala setter's
        # name contains '$', so plain attribute syntax can't spell it)
        getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.empty()
        )

    # round-15 ADVICE (low): the tempdir fallback is ONLY legal under a
    # local master — on a cluster it must fail loudly, not stage
    # silently incomplete tables to the driver's node-local disk
    import pytest

    class _Ctx:
        master = "spark://cluster:7077"

        def getCheckpointDir(self):
            raise Exception("no checkpoint dir")

    class _FakeSpark:
        sparkContext = _Ctx()

    with pytest.raises(RuntimeError, match="not visible to remote"):
        resolve_staging(_FakeSpark(), "unit_")

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps"),
         (3, "entirely unrelated text here")],
        "doc_id BIGINT, text STRING",
    )
    import os

    pairs = ssjoin_prefix_pairs(
        docs, n=3, threshold=0.3, staging_dir=str(tmp_path / "jobstage")
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert any(
        d.startswith("ssjoin_prefix_stage_")
        for d in os.listdir(tmp_path / "jobstage")
    )


def test_zone_pruned_read_with_null_zone_values(spark, tmp_path):
    """NULL zone values must keep pruned reads FILTER-EQUIVALENT:
    least() skips the NULL so such rows quantize into the top bucket
    (never a NULL partition dir), per-bucket stats exclude NULLs, and
    a range predicate never matches NULL — so the pruned read equals
    the filtered full scan, which drops NULL rows under both. An
    all-NULL bucket records [null, null] stats and is kept
    (unprunable) rather than crashing the planner."""
    from kafkastreams_example_spark.sources.sinks import (
        read_zone_pruned,
        write_zoned,
    )

    df = spark.createDataFrame(
        [(1, 10, 5), (2, None, 7), (3, 30, 9), (4, 18, None),
         (5, 22, 6), (6, None, None)],
        "id BIGINT, x BIGINT, y BIGINT",
    )
    path = str(tmp_path / "z_null")
    write_zoned(df, path, ("x", "y"), n_buckets=4)
    pruned = read_zone_pruned(spark, path, {"x": (10, 25), "y": (5, 7)})
    got = sorted(r["id"] for r in pruned.collect())
    want = sorted(
        r["id"]
        for r in df.filter(
            F.col("x").between(10, 25) & F.col("y").between(5, 7)
        ).collect()
    )
    assert got == want == [1, 5]  # NULL rows dropped under BOTH


def test_write_zoned_salts_hot_buckets(spark, tmp_path, monkeypatch):
    """Round-21 salt guard (guide §2.5): a z-bucket whose measured row
    count exceeds _SALT_ROWS_PER_TASK must spread over several write
    tasks (several files in its partition dir) instead of serializing
    into one, while the data read back stays exactly the input and
    small-bucket layouts keep ~1 file. The threshold is monkeypatched
    low so a hot bucket is constructible at test scale."""
    import os

    from kafkastreams_example_spark.sources import sinks
    from kafkastreams_example_spark.sources.sinks import (
        read_zone_pruned,
        write_zoned,
    )

    # x clusters tightly around two centers -> few hot buckets; one
    # center carries 900 of the 1000 rows
    rows = [(i, 5 if i < 900 else 1000 + i, i % 7) for i in range(1000)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
    path_hot = str(tmp_path / "z_hot")
    monkeypatch.setattr(sinks, "_SALT_ROWS_PER_TASK", 100)
    write_zoned(df, path_hot, ("x", "y"), n_buckets=4)

    def files_per_bucket(path):
        out = {}
        for d in os.listdir(path):
            if d.startswith("zbucket="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]
                )
        return out

    per_bucket = files_per_bucket(path_hot)
    assert max(per_bucket.values()) > 1, per_bucket  # hot bucket split
    back = spark.read.option("basePath", path_hot).parquet(path_hot)
    assert sorted(r["id"] for r in back.collect()) == list(range(1000))
    # pruned read stays filter-equivalent over the salted layout
    pruned = read_zone_pruned(spark, path_hot, {"x": (0, 10)})
    assert sorted(r["id"] for r in pruned.collect()) == list(range(900))

    # default threshold: every test bucket is small -> 1 file each
    monkeypatch.setattr(sinks, "_SALT_ROWS_PER_TASK", 4000000)
    path_cold = str(tmp_path / "z_cold")
    write_zoned(df, path_cold, ("x", "y"), n_buckets=4)
    assert max(files_per_bucket(path_cold).values()) == 1
