#!/usr/bin/env python
"""Generate REGISTRY.md — the machine-readable registry inventory
(round-16 verdict item 8: SURVEY.md §2c grew into a 700-line prose
block that every judge/builder re-derives; this table is generated
FROM the QuerySpec registrations, so it cannot drift from the code).

One row per registry entry: family tags, implementation site
(file:line of the query callable), oracle kind (full SQL compare vs
rows-only), whether the entry is in bench.py's headline set, its
calibrated wall-clock band at sf0.1 (BASELINE_BANDS.json; entries
without a band are the documented <1 s exemption ledger), and the
first docstring sentence as the summary.

Usage: python tools/gen_registry.py   # rewrites REGISTRY.md
"""

from __future__ import annotations

import inspect
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402


def _site(fn) -> str:
    code = fn.__code__
    path = Path(code.co_filename)
    try:
        rel = path.relative_to(REPO)
    except ValueError:
        rel = path
    return f"{rel}:{code.co_firstlineno}"


def _summary(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    first = doc.split("\n\n")[0].replace("\n", " ")
    # first sentence, bounded; pipes would break the table
    m = re.match(r"(.+?\.)(\s|$)", first)
    s = (m.group(1) if m else first)[:160].replace("|", "/")
    return s


def main() -> None:
    import bench

    bands = json.loads((REPO / "BASELINE_BANDS.json").read_text())[
        "bench_bands_sec"
    ]
    benched = set(bench.BENCH_QUERIES)
    lines = [
        "# Registry inventory (auto-generated: python tools/gen_registry.py)",
        "",
        f"{len(REGISTRY)} `QuerySpec` registrations in",
        "`kafkastreams_example_spark/queries.py` — the engine's declared",
        "surface (SURVEY.md §2c points here). Every entry has a",
        "`queries()` callable; `oracle` says how the driver verifies it",
        "(`sql` = full DuckDB value compare, `sql-strict` = the same",
        "compare with full-repr floats — the round-18 kernel-contract",
        "tier, one ulp fails; `rows-only` = the weaker row-count check",
        "for non-SQL-expressible ops). `band` is the",
        "calibrated sf0.1 wall-clock band from BASELINE_BANDS.json",
        "(drift-normalized by bench.py's canary gate); unbanded entries",
        "are the documented <1 s exemption ledger (BASELINE.md). Scale",
        "design notes live in each callable's docstring at the linked",
        "site; per-plan properties in PLANS.md.",
        "",
        "| entry | family | impl | oracle | benched | band (s) | summary |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        band = bands.get(name)
        lines.append(
            "| {n} | {t} | {s} | {o} | {b} | {bd} | {d} |".format(
                n=name,
                t=", ".join(spec.tags) or "—",
                s=_site(spec.fn),
                o=(
                    "sql-strict"
                    if spec.oracle and getattr(spec, "strict_float", False)
                    else "sql" if spec.oracle else "rows-only"
                ),
                b="Y" if name in benched else "",
                bd=f"[{band[0]}, {band[1]}]" if band else "",
                d=_summary(spec.fn),
            )
        )
    n_sql = sum(1 for s in REGISTRY.values() if s.oracle)
    lines += [
        "",
        f"_{len(REGISTRY)} entries: {n_sql} sql-oracled "
        f"({sum(1 for s in REGISTRY.values() if s.oracle and getattr(s, 'strict_float', False))} strict-float), "
        f"{len(REGISTRY) - n_sql} rows-only; {len(benched & set(REGISTRY))} "
        "benched headline queries._",
    ]
    (REPO / "REGISTRY.md").write_text("\n".join(lines) + "\n")
    print(f"wrote REGISTRY.md: {len(REGISTRY)} entries")


if __name__ == "__main__":
    main()
