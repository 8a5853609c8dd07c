#!/usr/bin/env python
"""Prove the plan ledger's `aqe skew` column can trip (round-19
verdict item 2).

PLANS.md / PLANS_x10.md carry an OptimizeSkewedJoin-activation column
that has read zero at every audit SF — expected on the near-uniform
driver fixtures, but by the repo's own gate-sensitivity discipline an
evidence column that has never been OBSERVED nonzero is unproven.
This tool closes that:

  build  — materialize `.scale_probe/skew/`: the sf0.01 tables with
           lineitem replaced by a HOT-KEY analog (one existing
           l_orderkey owning ~70% of a ~2M-row table — the
           hot-entity shape a real event log develops). All other
           tables are byte-copied, so every registry entry runs on
           the fixture unchanged.

  run    — three demonstrations under ONE skew-tuned session (AQE
           skew thresholds lowered so the 100 TB regime is
           reproducible at fixture scale: skewedPartitionThreshold
           1 MB, advisory 256 KB, broadcast disabled so the join is
           a genuine shuffle SMJ):

           1. POSITIVE: a lineitem⋈orders shuffle join on the skew
              fixture — the final adaptive plan must contain
              skew=true / "AQEShuffleRead skewed" nodes (the exact
              markers tools/plan_audit.py counts).
           2. NEGATIVE CONTROL: the SAME join under the SAME session
              on uniform sf0.01 — zero skew markers, proving the
              lowered thresholds alone do not fabricate activations.
           3. BEHAVIOR UNDER SKEW: `skew_profile` must FLAG the hot
              key (top-1 share and x-mean multiple), and
              `join_salted` must stay OUTPUT-IDENTICAL on the skewed
              fixture (oracle-compared against the plain-join SQL on
              the same parquet — salting never changes results, and
              now that is demonstrated under actual skew).

Artifact: SKEW_<round>.json (GATE_ROUND env, else adhoc) with the
plan metrics of both runs and the behavior checks — the committed
evidence that the `aqe skew` cell is a live signal, not a dead
column.

Sibling: tools/skew_probe.py (round 4) TIMES the three skew
strategies (no-AQE / AQE / salted) on a zipfian fixture; this tool
proves the PLAN-LEDGER column observes the AQE activation and that
the behavior-under-skew contracts hold on a registry-shaped fixture.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
SKEW_DIR = str(REPO / ".scale_probe" / "skew")
BASE_SF = "/root/testdata/sf0.01"
HOT_ROWS = 1_400_000  # rows stacked on the single hot orderkey


def build() -> None:
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.session import get_spark
    from kafkastreams_example_spark.schema import TABLE_NAMES
    from kafkastreams_example_spark.sources.tables import load_table

    spark = get_spark(app_name="skew-probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SKEW_DIR, exist_ok=True)
    # byte-copy every table except lineitem: identical schemas, and
    # the registry entries that read them run on the fixture unchanged
    for t in TABLE_NAMES:
        if t == "lineitem":
            continue
        src = f"{BASE_SF}/{t}.parquet"
        dst = f"{SKEW_DIR}/{t}.parquet"
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
    li = load_table(spark, BASE_SF, "lineitem")
    hot_key = li.select(F.min("l_orderkey")).first()[0]
    # hot rows: clone ONE template row HOT_ROWS times, varying the
    # line number so rows stay distinct; every other column keeps the
    # template's values (schema-identical, trivially valid)
    template = li.filter(F.col("l_orderkey") == hot_key).limit(1)
    # per-row VARIED numerics, not a bare clone: skew detection reads
    # COMPRESSED shuffle-partition sizes from the map statistics, and
    # 1.4M identical rows run-length-compress under any realistic
    # threshold — a hot partition that is skewed by rows but not by
    # bytes is exactly the case the detector is designed NOT to split
    hot = (
        spark.range(HOT_ROWS)
        .crossJoin(
            F.broadcast(
                template.drop(
                    "l_linenumber", "l_quantity", "l_extendedprice",
                    "l_discount", "l_tax", "l_partkey", "l_suppkey",
                    "l_shipdate", "l_linestatus",
                )
            )
        )
        .withColumn("l_linenumber", (F.col("id") % 2_000_000_000).cast("int"))
        .withColumn("l_quantity", (F.col("id") % 50 + 1).cast("double"))
        .withColumn(
            "l_extendedprice",
            ((F.col("id") * 7919 % 9000000) / 100.0 + 900.0),
        )
        .withColumn("l_discount", ((F.col("id") % 11) / 100.0))
        .withColumn("l_tax", ((F.col("id") % 9) / 100.0))
        .withColumn("l_partkey", (F.col("id") % 2_000 + 1))
        .withColumn("l_suppkey", (F.col("id") % 100 + 1))
        .withColumn("l_linestatus", F.when(F.col("id") % 2 == 0, "F").otherwise("O"))
        .withColumn(
            "l_shipdate",
            F.timestamp_seconds(
                F.lit(800_000_000) + (F.col("id") % 100_000) * 600
            ),
        )
        .drop("id")
        .select(*li.columns)
    )
    li.unionByName(hot).repartition(8).write.mode("overwrite").parquet(
        f"{SKEW_DIR}/lineitem.parquet"
    )
    n = spark.read.parquet(f"{SKEW_DIR}/lineitem.parquet").count()
    print(
        json.dumps(
            {"built": SKEW_DIR, "hot_key": hot_key, "lineitem_rows": n}
        )
    )
    spark.stop()


def _skew_session():
    """One session for every demonstration: AQE skew-join thresholds
    lowered so a ~100 MB hot shuffle partition at fixture scale is to
    this session what a multi-GB hot partition is to a production
    one; broadcast disabled so the probe join is a genuine shuffle
    SMJ (OptimizeSkewedJoin only applies to shuffle joins)."""
    from kafkastreams_example_spark.session import get_spark

    spark = get_spark(app_name="skew-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }.items():
        spark.conf.set(k, v)
    return spark


def _probe_join(spark, sf_dir: str):
    """The canonical hot-fact⋈dim shuffle join: lineitem⋈orders on
    orderkey, aggregated on a NON-join key so the join's output
    partitioning is not required downstream (a skewed partition can
    only be split when nothing above the join needs its hash
    distribution)."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )


def _plan_metrics(df) -> dict:
    """Execute THIS QueryExecution and count the same final-plan
    markers tools/plan_audit.py tabulates (skew=true nodes + skewed
    shuffle reads + join strategy counts)."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().executeCollect()
    plan = qe.executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    return {
        "skew": plan.count("skew=true") + plan.count("AQEShuffleRead skewed"),
        "smj": plan.count("SortMergeJoin"),
        "bcast": plan.count("BroadcastHashJoin"),
        "exchanges": len(
            [1 for ln in plan.splitlines() if "Exchange " in ln]
        ),
    }


def run() -> int:
    import duckdb

    from kafkastreams_example_spark.queries import REGISTRY
    from kafkastreams_example_spark.schema import TABLE_NAMES
    from tools.oracle_check import compare_query

    if not os.path.isdir(SKEW_DIR):
        raise SystemExit(f"skew fixture missing — run: python tools/aqe_skew_probe.py build")
    spark = _skew_session()
    t0 = time.time()

    # 1. positive: the hot-key fixture must activate OptimizeSkewedJoin
    pos = _plan_metrics(_probe_join(spark, SKEW_DIR))
    # 2. negative control: same session, same join, uniform sf0.01
    neg = _plan_metrics(_probe_join(spark, BASE_SF))

    # 3a. skew_profile flags the hot key on the skewed fixture
    prof = REGISTRY["skew_profile"].fn(spark, SKEW_DIR).collect()
    top = prof[0]
    profile = {
        "top_key": top["key"],
        "top_cnt": top["cnt"],
        "top_share_ppm": top["share_ppm"],
        "top_x_mean_1000": top["x_mean_1000"],
        "second_share_ppm": prof[1]["share_ppm"] if len(prof) > 1 else None,
    }

    # 3b. join_salted stays output-identical UNDER skew: the entry's
    # oracle IS the plain unsalted join, compared on the skew fixture
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{SKEW_DIR}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    spec = REGISTRY["join_salted"]
    salted_ok, salted_detail = compare_query(
        spark, con, spec.fn, spec.oracle, SKEW_DIR
    )

    # 4. registry-entry ledger rows under the skew session (recorded,
    # not gated: each entry's agg/distinct shape decides whether AQE
    # may split the skewed join — e.g. a COUNT(DISTINCT join_key)
    # requires the join's hash distribution downstream and lawfully
    # blocks the split; the HARD gate is the ad-hoc probe above)
    from tools.plan_audit import audit_one

    ledger = {}
    for entry in ("sql_q12_latency", "sql_q4_priority_count", "join_salted"):
        try:
            r = audit_one(spark, entry, SKEW_DIR)
            ledger[entry] = {k: r[k] for k in ("skew", "smj", "bcast", "exchanges")}
        except Exception as exc:  # noqa: BLE001
            ledger[entry] = {"err": f"{type(exc).__name__}: {exc}"[:160]}

    summary = {
        "fixture": SKEW_DIR,
        "registry_ledger": ledger,
        "hot_rows": HOT_ROWS,
        "session": {
            "skewedPartitionThresholdInBytes": "1m",
            "advisoryPartitionSizeInBytes": "256k",
            "autoBroadcastJoinThreshold": "-1",
        },
        "positive_skewed_fixture": pos,
        "negative_uniform_sf001": neg,
        "skew_profile": profile,
        "join_salted_output_identical": salted_ok,
        "join_salted_detail": salted_detail,
        "elapsed_sec": round(time.time() - t0, 1),
        "pass": bool(
            pos["skew"] > 0 and neg["skew"] == 0 and salted_ok
            and profile["top_x_mean_1000"] > 5_000
        ),
    }
    rnd = os.environ.get("GATE_ROUND")
    out = REPO / f"SKEW_{rnd if rnd else 'adhoc'}.json"
    out.write_text(json.dumps(summary, indent=1, default=str))
    print(json.dumps(summary, default=str))
    spark.stop()
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "build":
        build()
    elif cmd == "run":
        sys.exit(run())
    else:
        raise SystemExit(f"unknown command {cmd!r}: use build|run")
