"""Round-evidence hygiene, made structural.

Six rounds running, the per-round evidence files (``BENCH_r*.json``,
``CORRECTNESS_r*.json``, ``BENCH_STREAMING_r*.json``) sat untracked at
round end — a printed reminder did not fix it, so the tools now commit
the artifacts themselves: ``commit_round_artifacts`` finds every
UNTRACKED round artifact at the repo root and commits JUST those paths
(modified tracked artifacts are deliberately left alone — hand edits
must not be swept into a generic commit by a tool run) (``git commit -- <paths>`` ignores the index, so unrelated
staged work is never swept in). Called from ``bench.py`` and
``tools/oracle_check.py`` after they finish, and safe to invoke
directly: ``python tools/artifacts.py``.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
_PREFIXES = (
    "BENCH_r",
    "CORRECTNESS_r",
    "BENCH_STREAMING_r",
    "GATE_SENSITIVITY_r",
)


def _loose_artifacts() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain"],
        capture_output=True, text=True, timeout=10, cwd=str(REPO),
    ).stdout
    loose = []
    for ln in out.splitlines():
        # UNTRACKED ("??") entries only: auto-committing modified
        # tracked artifacts would silently sweep hand edits into a
        # generic-message commit as a side effect of any tool run.
        if not ln.startswith("??"):
            continue
        name = ln[3:].strip()
        if any(name.startswith(p) for p in _PREFIXES) and name.endswith(
            (".json", ".log")
        ):
            loose.append(name)
    return loose


def commit_round_artifacts() -> list[str]:
    """Commit any loose round artifacts; returns the committed paths.
    Never raises — evidence commits must not break the tool that just
    produced the evidence (a failure prints to stderr instead)."""
    try:
        loose = _loose_artifacts()
        if not loose:
            return []
        subprocess.run(
            ["git", "add", "--", *loose],
            cwd=str(REPO), timeout=10, check=True, capture_output=True,
        )
        subprocess.run(
            [
                "git", "commit", "-q",
                "-m", f"Record round evidence artifacts: {', '.join(sorted(loose))}",
                "--", *loose,
            ],
            cwd=str(REPO), timeout=15, check=True, capture_output=True,
        )
        print(f"committed round artifacts: {sorted(loose)}", file=sys.stderr)
        return loose
    except Exception as exc:  # noqa: BLE001
        print(f"artifact auto-commit failed: {exc}", file=sys.stderr)
        return []


if __name__ == "__main__":
    commit_round_artifacts()
