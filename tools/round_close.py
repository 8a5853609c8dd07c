#!/usr/bin/env python
"""Standing round-close correctness gate (round-16 verdict item 3).

The round-16 sf0.1 sweep caught a REAL scale-dependent defect class
(the RANGE corr kernel's co-moment cancellation at |corr| → 1,
invisible at the sf0.01 gate SF), proving SF-sensitive defects exist;
until now running the full sweep at BOTH SFs was session habit, not
machinery. This tool makes it structural: one command runs the full
registry oracle sweep at sf0.01 AND sf0.1, writes both logs with the
round's standard artifact names, and auto-commits them via
tools/artifacts.py — a round cannot close "green" without the
committed two-SF evidence.

Usage:
  python tools/round_close.py [--round N] [--x10] [--skip-sf01]

  --round N     artifact round number; default = (max round number
                among existing BENCH_r*/CORRECTNESS_r* artifacts) + 1
                (i.e. the round currently being built).
  --x10         additionally run the graph_triangles dual-orientation
                self-check on .scale_probe/x10 when that fixture
                exists (the one entry whose SQL oracle is infeasible
                at that scale — tools/triangle_check.py), appending
                its lines to the sf0.1 log.
  --skip-sf01   only run the sf0.1 sweep (when the sf0.01 log for
                this round was already produced by an earlier
                oracle_check run this session).

Exit code: 0 iff every executed sweep printed "FAILS: none".
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def infer_round() -> int:
    """Next round number after the newest DRIVER-recorded artifact
    (the per-round .json files — .log evidence can be written for the
    in-flight round and must not skew the inference): during round
    N's build the newest driver .json artifacts are r(N-1)'s."""
    rounds = [0]
    for p in REPO.iterdir():
        m = re.match(r"(?:BENCH|CORRECTNESS)_r(\d+)\.json$", p.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def run_sweep(sf_dir: str, log_path: Path) -> bool:
    """Run the full-registry oracle sweep at ``sf_dir``, tee'ing
    cleaned output (progress-bar \\r spam stripped) to ``log_path``.
    Returns True iff the sweep ended with FAILS: none."""
    print(f"== sweep {sf_dir} -> {log_path.name}", flush=True)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "oracle_check.py"), sf_dir],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    lines = []
    for raw in proc.stdout.splitlines():
        for seg in raw.split("\r"):
            seg = seg.strip()
            if re.search(
                r": ok rows=|: rows=|^FAILS:|: MISMATCH|: ERROR", seg
            ):
                lines.append(seg + "\n")
    log_path.write_text("".join(lines))
    ok = proc.returncode == 0 and any(
        ln.startswith("FAILS: none") for ln in lines
    )
    tail = lines[-1].strip() if lines else f"(no output, rc={proc.returncode})"
    print(f"   {tail}", flush=True)
    if not ok and proc.stderr:
        print(proc.stderr[-2000:], file=sys.stderr)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--x10", action="store_true")
    ap.add_argument("--skip-sf01", action="store_true")
    args = ap.parse_args()
    n = args.round if args.round is not None else infer_round()

    ok = True
    if not args.skip_sf01:
        ok &= run_sweep(
            "/root/testdata/sf0.01", REPO / f"CORRECTNESS_r{n:02d}_full.log"
        )
    sf01_log = REPO / f"CORRECTNESS_r{n:02d}_full_sf0.1.log"
    ok &= run_sweep("/root/testdata/sf0.1", sf01_log)

    x10_dir = REPO / ".scale_probe" / "x10"
    if args.x10 and x10_dir.exists():
        print("== graph_triangles dual-orientation self-check @ x10", flush=True)
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "tools" / "triangle_check.py"),
                str(x10_dir),
            ],
            capture_output=True,
            text=True,
            cwd=str(REPO),
        )
        picked = [
            seg.strip() + "\n"
            for raw in proc.stdout.splitlines()
            for seg in raw.split("\r")
            if re.search(r"ok census|MISMATCH|^FAILS:", seg)
        ]
        with open(sf01_log, "a") as fh:
            fh.write("\n## triangle_check @ x10 (oracle-infeasible scale)\n")
            fh.writelines(picked)
        ok &= proc.returncode == 0
        print(f"   {picked[-1].strip() if picked else proc.returncode}", flush=True)

    try:
        from tools.artifacts import commit_round_artifacts

        commit_round_artifacts()
    except Exception as exc:  # noqa: BLE001 — evidence hygiene must not
        # mask the sweep result
        print(f"artifact auto-commit unavailable: {exc}", file=sys.stderr)
    print(f"round_close: {'GREEN' if ok else 'RED'} (round {n})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
