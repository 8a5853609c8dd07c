#!/usr/bin/env python
"""Zero-signal audit: run every registry oracle in DuckDB at the gate
SF and flag outputs that cannot distinguish a working operator from a
broken one — zero rows, all-NULL columns, and constant boolean columns.

Motivation (round 10): the long-standing asof_join entry joined orders
to events whose time axes never overlap in this testdata, so its match
column was NULL for every row at every SF — both engines agreed, the
gate stayed green, and the carry logic was never exercised. The same
audit then caught join_anti (zero rows — every customer has an order),
string_funcs3 (three affix predicates that never occur in part names),
events_funnel (conversion constant True at this event density), and
earlier sql_q22 (a dormancy cutoff vacuous at sf0.001). A hash compare
of a degenerate output is not evidence; this sweep makes degeneracy
visible.

The audit loop lives here ONCE; the CI degeneracy gate
(tests/test_parity.py::test_no_zero_signal_oracles) imports audit()
rather than re-implementing it, so the tool and the gate cannot drift.

Known-accepted finding: events_funnel.signed_up is constant True —
every synthetic user signs up at this density; that is the corpus, not
a dead predicate (documented in the entry docstring).

Usage: python tools/signal_audit.py [sf_dir]   # exits 0 always; read output
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.schema import TABLE_NAMES  # noqa: E402

ACCEPTED = {("events_funnel", "signed_up")}


def register_views(con, sf_dir: str) -> None:
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def audit(con, registry=None, accepted=None) -> list[tuple[str, str]]:
    """Run every oracle and return (entry, finding) pairs for
    degenerate outputs. Oracle execution errors are reported as
    findings too (a broken oracle is also a broken gate)."""
    registry = REGISTRY if registry is None else registry
    accepted = ACCEPTED if accepted is None else accepted
    findings: list[tuple[str, str]] = []
    for name, spec in sorted(registry.items()):
        if not spec.oracle:
            continue
        try:
            rel = con.execute(spec.oracle)
            rows = rel.fetchall()
            cols = [d[0] for d in rel.description]
        except Exception as exc:  # noqa: BLE001
            findings.append((name, f"oracle error: {str(exc).splitlines()[0][:80]}"))
            continue
        if not rows:
            findings.append((name, "zero rows"))
            continue
        n = len(rows)
        for i, c in enumerate(cols):
            vals = [r[i] for r in rows]
            nonnull = [v for v in vals if v is not None]
            if not nonnull:
                findings.append((name, f"column {c}: all null ({n} rows)"))
            elif isinstance(nonnull[0], bool) and len(set(nonnull)) == 1 and n >= 10:
                if (name, c) in accepted:
                    continue
                findings.append(
                    (name, f"bool column {c}: constant {nonnull[0]} over {n} rows")
                )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    register_views(con, sf_dir)
    findings = audit(con)
    for f in findings:
        print(f)
    print(f"checked {len(REGISTRY)} entries; {len(findings)} findings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
