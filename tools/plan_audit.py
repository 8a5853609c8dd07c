#!/usr/bin/env python
"""Plan audit: EXECUTE every registry entry at the audit SF and tabulate
the physical-plan properties that matter at 100 TB — exchange count,
broadcast joins, parquet scans, whole-stage-codegen coverage, top-k vs
global sort — into one markdown table (PLANS.md). The per-claim
assertions live in tests/test_plans.py; this is the whole-surface
inventory, regenerated per round so plan regressions are diffable.

Execution is REQUIRED, not an implementation detail: under AQE the
finalized plan (runtime join strategy choices, codegen span ids) only
exists after the adaptive plan object runs, so audit_one calls
executedPlan().executeCollect() — every query fully runs and its result
rows land on the driver. That is cheap at the default sf0.001 audit
fixture but becomes a full run with driver-memory risk at larger SFs;
main() warns when pointed at anything other than a sf0.001 dir.

Usage: python tools/plan_audit.py [sf_dir] [out_md] [entry ...]

Optional trailing entry names restrict the audit to a subset — the
round-18 use case: re-auditing the join-heavy families at the x10
fixture, where AQE's stat-driven broadcast-vs-shuffle choices (never
observed above sf0.1 before) actually flip, without paying a full
203-entry execution at that scale.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402


def audit_one(spark, name: str, sf_dir: str) -> dict:
    df = REGISTRY[name].fn(spark, sf_dir)
    # force THIS QueryExecution: under AQE the FINAL plan (runtime join
    # choices, WholeStageCodegen spans) only exists after the adaptive
    # plan object itself executes — df.count()/write spawn NEW
    # executions and leave this one isFinalPlan=false
    qe = df._jdf.queryExecution()
    qe.executedPlan().executeCollect()
    plan = qe.executedPlan().toString()
    # the finalized AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections — audit only the final one (counting
    # both doubles every metric); codegen'd operators carry a "*(id)"
    # prefix there
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return {
        "name": name,
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "bcast": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "smj": plan.count("SortMergeJoin"),
        "scans": plan.count("FileScan"),
        "codegen": len(ids),
        "python": plan.count("InPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("ArrowEvalPython"),
        # row-at-a-time Python (BatchEvalPython) reported SEPARATELY:
        # the repo-wide "zero non-Arrow Python stages" claim must be
        # auditable per entry, not lumped with the Arrow tier
        # (round-17, verdict item 4)
        "pyrow": plan.count("BatchEvalPython"),
        "topk": "Y" if "TakeOrderedAndProject" in plan else "",
        "gsort": "Y" if "rangepartitioning" in plan else "",
        # AQE skew-join activation at the audit SF: OptimizeSkewedJoin
        # marks the join "(skew=true)" and splits its shuffle reads
        # into "AQEShuffleRead skewed" nodes. Zero at every test SF is
        # EXPECTED (the fixtures are near-uniform); the column exists
        # so an activation — or a future skewed fixture — is visible
        # in the diff rather than silent (round-17, verdict item 4)
        "skew": plan.count("skew=true") + plan.count("AQEShuffleRead skewed"),
    }


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    if not os.path.isdir(sf_dir):
        # same silently-wrong-arg class gate_sensitivity closed in
        # round 15: a flag or typo consumed as sf_dir must not start a
        # full EXECUTING registry run (this tool also OVERWRITES
        # PLANS.md mid-run)
        raise SystemExit(
            f"plan_audit: sf_dir {sf_dir!r} is not a directory "
            "(usage: plan_audit.py [sf_dir] [out_md])"
        )
    if "sf0.001" not in sf_dir:
        print(
            f"WARNING: plan audit EXECUTES every registry entry and collects "
            f"its rows to the driver (AQE final plans require execution); "
            f"'{sf_dir}' is not a sf0.001 audit fixture — this is a full run "
            f"with driver-memory risk, not a compile-only pass.",
            file=sys.stderr,
        )
    names = sys.argv[3:] or sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"plan_audit: unknown entries {unknown}")
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows, errs = [], []
    t0 = time.time()
    for name in sorted(names):
        try:
            rows.append(audit_one(spark, name, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errs.append((name, f"{type(exc).__name__}: {exc}"[:200]))
    lines = [
        "# Plan audit (auto-generated: python tools/plan_audit.py)",
        "",
        f"{len(rows)} registry entries compiled at `{sf_dir}`; columns are",
        "physical-plan node counts. `arrow py stages` counts Arrow-batched",
        "stages (`mapInPandas`/`applyInPandas`/pandas UDF); `rowwise py`",
        "counts row-at-a-time BatchEvalPython stages — the repo claim is",
        "ZERO everywhere. `topk` = TakeOrderedAndProject; `gsort` = a global",
        "range sort (only acceptable where ordered output IS the contract).",
        "`aqe skew` counts OptimizeSkewedJoin activations (skew=true /",
        "skewed shuffle reads) — expected 0 on the near-uniform fixtures;",
        "the column makes an activation visible in the diff.",
        "Broadcast counts at this audit SF include AQE stat-driven choices",
        "that become shuffle joins on bigger inputs; forced broadcasts are",
        "only ever bounded sides (see the F.broadcast audit in BASELINE.md).",
        "",
        "| entry | exchanges | bcast joins | merge joins | scans | codegen spans | arrow py stages | rowwise py | topk | global sort | aqe skew |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['bcast']} | {r['smj']} | "
            f"{r['scans']} | {r['codegen']} | {r['python']} | {r['pyrow']} | "
            f"{r['topk']} | {r['gsort']} | {r['skew'] or ''} |"
        )
    if errs:
        lines += ["", "## Errors", ""]
        lines += [f"- {n}: {e}" for n, e in errs]
    lines += [
        "",
        f"_Generated in {time.time() - t0:.0f}s; {len(errs)} errors._",
    ]
    Path(out_md).write_text("\n".join(lines) + "\n")
    print(f"wrote {out_md}: {len(rows)} entries, {len(errs)} errors")
    spark.stop()


if __name__ == "__main__":
    main()
