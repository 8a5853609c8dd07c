#!/usr/bin/env python
"""Mutation audit of the DuckDB oracle gate (round-13 verdict item 2).

The oracle gate is the repo's hard correctness signal, but a gate is
only as good as its sensitivity: a query and its oracle could encode
the SAME mistake (shared fate), or a compare could be structurally
unable to trip for a class of bugs. This tool measures sensitivity
directly: for a sample of registry entries spanning operator families,
it mechanically mutates the SPARK side of the query — swap a
comparison operator, off-by-one an integer literal, perturb a float
threshold — and asserts the gate (tools/oracle_check.compare_query,
the SAME comparator the gate replica uses) FAILS for the mutant.

A mutant that survives is either a real gate hole (fix it) or a
semantically equivalent mutation on this data (record why). The audit
log is the committed artifact GATE_SENSITIVITY_r{N}.json.

Mutation mechanics: the query function's source is parsed to an AST;
each mutant flips exactly ONE node:

  * ast.Compare ops:  > <-> >=,  < <-> <=,  == -> !=
  * ast.Constant int:  n -> n + max(1, n//24)   (frame bounds, ks,
    caps, windows — scale-aware so a 24 h-in-µs constant moves ~1 h,
    not a semantically-invisible 1 µs)
  * ast.Constant float:  x -> x*1.1 + 0.01   (thresholds, alphas)
  * ast.Constant short str (non-docstring): s -> s+"_x"  (predicate
    values like 'error', aliases — alias mutations audit the SCHEMA
    side of the gate; entries like filter_level delegate their
    comparison to an operators/ helper, so the string literal is the
    only mutable surface at the query level)

Docstrings never contain Compare/numeric Constant nodes, so they are
untouched; the mutated AST is unparsed and exec'd in the queries
module's namespace, giving a callable the gate can run unmodified.
Up to MUTANTS_PER_ENTRY mutants per entry, chosen deterministically
(spread across the candidate list), so the audit is reproducible.

Usage:
    python tools/gate_sensitivity.py [sf_dir] [entry ...]
    python tools/gate_sensitivity.py [sf_dir] --all      # full registry

Output lands in GATE_SENSITIVITY_<round>.json (round from the
GATE_ROUND env var; when unset the run is ad-hoc and lands in
GATE_SENSITIVITY_adhoc.json, which is never round evidence).
"""

from __future__ import annotations

import ast
import copy
import inspect
import json
import sys
import textwrap
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import kafkastreams_example_spark.queries as queries_mod  # noqa: E402
from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.schema import TABLE_NAMES  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402
from tools.oracle_check import compare_query  # noqa: E402

MUTANTS_PER_ENTRY = 3

# one entry per family: reference surface, TPC-H relational, windows,
# joins, dedup/similarity, text/retrieval, timeseries, sketches,
# manifest tables, quality/governance, the new RANGE kernel
DEFAULT_ENTRIES = [
    "filter_level",
    "json_decode",
    "agg_pricing_summary",
    "sql_q6_forecast_revenue",
    "join_customer_orders",
    "window_rank",
    "asof_join",
    "dedup_refresh",
    "minhash_lsh_pairs",
    "sim_topk",
    "top_terms_sketched",
    "gopher_rules",
    "ewma",
    "twap",
    "rolling_corr",
    "rolling_corr_range",
    "rolling_range_stats",
    "ann_recall",
    "k_anonymity",
    "decile_lift",
    "bm25_topk",
    "sequence_match",
    "winsorize",
    "mat_view_counts",
    # round-13 second wave: double coverage across the remaining
    # families (TPC-H shapes, set ops, sketches, text quality, graph,
    # multimodal, governance, timeseries, embeddings)
    "agg_rollup",
    "setop_except_all",
    "sql_q19_disjunct_revenue",
    "sql_q22_dormant_customers",
    "range_join",
    "null_handling",
    "approx_quantiles",
    "contamination",
    "lang_id",
    "graph_triangles",
    "image_header_meta",
    "fk_integrity",
    "snapshot_diff",
    "resample_ohlc",
    "semdedup",
]

# ---- round-19 boundary fixtures ------------------------------------
# The dominant survivor class in GATE_SENSITIVITY_r14/r18 is
# "boundary-unoccupied": a cmp mutant (> -> >=) survives only because
# no sf0.01 row sits EXACTLY at the predicate's cut, and the survivor
# was adjudicated by argument — the weakest evidence tier the repo
# accepts. These builders write tiny synthetic tables that OCCUPY the
# adjudicated boundaries (a row exactly at 5·MAD, a group with exactly
# 50 orders, a price exactly at the 1000.0 cut, a zero-token document,
# a NULL in a checksummed column); audit_entry then runs every mutant
# against the boundary fixture as a SECOND gate, so the cmp mutant
# dies by MISMATCH instead of adjudication. Values are small integers
# in doubles — exact in binary floating point on both engines, so the
# boundary equality is bit-clean cross-engine.


def _bf_mad_outliers(spark, d: str) -> None:
    """events with a row whose |value − median| is EXACTLY 5·MAD:
    group 'boundary' = [8,10,10,12,20] → median 10 (middle of 5),
    ads [2,0,0,2,10] → MAD 2, cut 5·2 = 10; the value-20 row lands
    ad == 10, excluded by `>`, included by `>=`. Group 'clear' keeps
    one strict outlier (ad 20 > 10) so the generic path stays hot."""
    rows = [(i, "boundary", v) for i, v in enumerate([8.0, 10.0, 10.0, 12.0, 20.0])]
    rows += [(10 + i, "clear", v) for i, v in enumerate([8.0, 10.0, 10.0, 12.0, 30.0])]
    spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")


def _bf_table_checksum(spark, d: str) -> None:
    """lineitem with NULLs in checksummed columns (l_partkey, and a
    NULL l_shipdate) so the '\\N' canonicalization sentinel is
    actually exercised: the semstr mutant '\\N_x' now changes real
    hashed bytes on the Spark side only → checksum MISMATCH."""
    from datetime import datetime

    rows = [
        (1, 10, 100, 1, "A", "F", datetime(1995, 3, 1)),
        (1, None, 100, 2, "A", "F", datetime(1995, 3, 2)),
        (2, 20, None, 1, "N", "O", None),
        (3, 30, 300, 1, "R", "F", datetime(1995, 4, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")


def _bf_agg_having(spark, d: str) -> None:
    """orders with a priority group of EXACTLY 50 orders (the HAVING
    n_orders > 50 cut) next to a 51-order group."""
    rows = [(i, "AT-CUT", 100.25) for i in range(50)]
    rows += [(100 + i, "ABOVE", 200.50) for i in range(51)]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")


def _bf_agg_boolean(spark, d: str) -> None:
    """orders occupying BOTH price cuts exactly: group 'A' holds a row
    at 1000.0 (bool_and(> 1000) flips under >=), group 'B' a row at
    400000.0 (bool_or(> 400000) flips under >=)."""
    rows = [
        (1, "A", 1000.0, "1-URGENT"),
        (2, "A", 2000.0, "5-LOW"),
        (3, "B", 500.0, "5-LOW"),
        (4, "B", 400000.0, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")


def _bf_doc_chunking(spark, d: str) -> None:
    """documents with a ZERO-token doc (empty text): its single empty
    chunk carries n_tokens == 0, dropped by `> 0`, kept by `>= 0`."""
    rows = [
        (1, "", "en", "web", 0),
        (2, " ".join(f"tok{i}" for i in range(40)), "en", "web", 240),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")


BOUNDARY_FIXTURES = {
    "mad_outliers": _bf_mad_outliers,
    "table_checksum": _bf_table_checksum,
    "agg_having": _bf_agg_having,
    "agg_boolean": _bf_agg_boolean,
    "doc_chunking": _bf_doc_chunking,
}


def _boundary_con(d: str):
    """DuckDB connection with views over the fixture dir's tables
    (Spark writes each table as a directory of part files)."""
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{d}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.isfile(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


_CMP_SWAP = {
    ast.Gt: ast.GtE,
    ast.GtE: ast.Gt,
    ast.Lt: ast.LtE,
    ast.LtE: ast.Lt,
    ast.Eq: ast.NotEq,
    ast.NotEq: ast.Eq,
}


def _docstring_ids(tree: ast.AST) -> set[int]:
    """id()s of docstring Constant nodes — excluded from mutation."""
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.Module, ast.ClassDef)):
            body = getattr(node, "body", [])
            if body and isinstance(body[0], ast.Expr) and isinstance(
                body[0].value, ast.Constant
            ):
                out.add(id(body[0].value))
    return out


#: call targets whose string argument is a PREDICATE VALUE, not an
#: identifier — mutating these is the highest-signal string class
#: (wrong constant in a filter), vs alias/column strings whose
#: mutation trips the schema gate or an AnalysisException trivially
_SEMANTIC_STR_FNS = {
    "lit", "filter_equals", "nullif", "when", "regexp_extract_all",
    "rlike", "like", "contains", "startswith", "endswith", "substring",
}


def _candidates(tree: ast.AST):
    """Enumerate mutation points: (kind, path-index, describe)."""
    out = []
    docs = _docstring_ids(tree)
    parents: dict[int, ast.AST] = {}
    for node in ast.walk(tree):
        for child in ast.iter_child_nodes(node):
            parents[id(child)] = node
    for i, node in enumerate(ast.walk(tree)):
        if isinstance(node, ast.Compare) and type(node.ops[0]) in _CMP_SWAP:
            op = type(node.ops[0]).__name__
            out.append(("cmp", i, f"L{node.lineno}: {op} -> "
                        f"{_CMP_SWAP[type(node.ops[0])].__name__}"))
        elif isinstance(node, ast.Constant) and type(node.value) is int:
            # scale-aware delta: +1 on small ints (frame bounds, ks),
            # ~+4% on large ones (a 24 h window in µs mutated by 1 µs
            # is equivalent on any real data — a worthless mutant)
            if abs(node.value) <= 10_000_000_000_000:
                delta = max(1, abs(node.value) // 24)
                out.append(
                    ("int", i,
                     f"L{node.lineno}: {node.value} -> "
                     f"{node.value + delta}")
                )
        elif isinstance(node, ast.Constant) and type(node.value) is float:
            out.append(
                ("float", i,
                 f"L{node.lineno}: {node.value} -> "
                 f"{round(node.value * 1.1 + 0.01, 6)}")
            )
        elif (
            isinstance(node, ast.Constant)
            and type(node.value) is str
            and 1 <= len(node.value) <= 24
            and id(node) not in docs
        ):
            parent = parents.get(id(node))
            kind = "str"
            if isinstance(parent, ast.Compare):
                kind = "semstr"
            elif isinstance(parent, ast.Call):
                f = parent.func
                fname = f.attr if isinstance(f, ast.Attribute) else getattr(
                    f, "id", ""
                )
                if fname in _SEMANTIC_STR_FNS:
                    kind = "semstr"
            out.append(
                (kind, i, f"L{node.lineno}: {node.value!r} -> "
                 f"{node.value + '_x'!r}")
            )
    return out


def _mutate(tree: ast.AST, kind: str, target_idx: int) -> ast.AST:
    tree = copy.deepcopy(tree)
    for i, node in enumerate(ast.walk(tree)):
        if i != target_idx:
            continue
        if kind == "cmp":
            node.ops[0] = _CMP_SWAP[type(node.ops[0])]()
        elif kind == "int":
            node.value = node.value + max(1, abs(node.value) // 24)
        elif kind == "float":
            node.value = round(node.value * 1.1 + 0.01, 6)
        elif kind in ("str", "semstr"):
            node.value = node.value + "_x"
        return tree
    raise IndexError(f"node {target_idx} not found")


def _spread(cands, k):
    """Deterministic spread over the candidate list: comparisons first
    (the highest-signal bug class), then numerics, then strings
    (aliases/predicate values — often trivial schema kills), sampled
    evenly within the combined order."""
    rank = {"cmp": 0, "semstr": 1, "int": 2, "float": 2, "str": 3}
    ordered = sorted(cands, key=lambda c: (rank[c[0]],))
    if len(ordered) <= k:
        return ordered
    step = len(ordered) / k
    return [ordered[int(i * step)] for i in range(k)]


def audit_entry(
    spark, con, name: str, sf_dir: str, bdir: str | None = None, bcon=None
) -> dict:
    spec = REGISTRY[name]
    src = textwrap.dedent(inspect.getsource(spec.fn))
    tree = ast.parse(src)
    cands = _candidates(tree)
    picks = _spread(cands, MUTANTS_PER_ENTRY)
    # sanity: the unmutated entry must pass, or the audit means nothing.
    # strict_float entries are audited under the SAME strict compare
    # the gate replica applies to them (round 18) — auditing a strict
    # entry at 9 sig figs would overstate the gate's blindness
    strict = getattr(spec, "strict_float", False)
    ok, detail = compare_query(
        spark, con, spec.fn, spec.oracle, sf_dir, strict_float=strict
    )
    if not ok:
        return {"baseline": f"FAIL {detail}", "mutants": [], "killed": 0,
                "survived": 0}
    if bdir is not None:
        # the boundary fixture is itself oracle-gated: the unmutated
        # query must agree with its oracle ON the occupied boundary,
        # or the second gate audits nothing
        bok, bdetail = compare_query(
            spark, bcon, spec.fn, spec.oracle, bdir, strict_float=strict
        )
        if not bok:
            return {
                "baseline": f"BOUNDARY-FAIL {bdetail}",
                "mutants": [],
                "killed": 0,
                "survived": 0,
            }
    results = []
    for kind, idx, desc in picks:
        # drop temp views between runs: a mutant that renames only the
        # CREATE side of a createOrReplaceTempView would otherwise read
        # the baseline run's STALE view and survive as an artifact of
        # audit session order, not of gate sensitivity (round-14: the
        # grouping_sets / udtf_term_counts survivors were exactly this
        # — both die honestly in a clean-view session)
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        mutated = ast.fix_missing_locations(_mutate(tree, kind, idx))
        ns = dict(queries_mod.__dict__)
        try:
            code = compile(mutated, f"<mutant:{name}>", "exec")
            exec(code, ns)  # noqa: S102 — audit tool, own source only
            mfn = ns[spec.fn.__name__]
            mok, mdetail = compare_query(
                spark, con, mfn, spec.oracle, sf_dir, strict_float=strict
            )
            killed = not mok
            how = "MISMATCH" if killed else "SURVIVED"
            if not killed and bdir is not None:
                # second gate (round 19): the boundary fixture — a
                # survivor here is equivalent even ON the occupied
                # boundary, not merely boundary-unoccupied at sf0.01
                for t in spark.catalog.listTables():
                    if t.isTemporary:
                        spark.catalog.dropTempView(t.name)
                try:
                    mbok, _ = compare_query(
                        spark, bcon, mfn, spec.oracle, bdir,
                        strict_float=strict,
                    )
                except Exception as exc:  # noqa: BLE001
                    mbok = False
                    mdetail = f"boundary {type(exc).__name__}"
                    # distinct label: an error-kill on the boundary
                    # fixture is NOT mismatch evidence (r19 advice —
                    # the sf0.01 path already separates ERROR kills)
                    killed, how = True, f"BOUNDARY ERROR {type(exc).__name__}"
                else:
                    if not mbok:
                        killed, how = True, "BOUNDARY MISMATCH"
        except Exception as exc:  # noqa: BLE001 — a throwing mutant is caught
            killed, how = True, f"ERROR {type(exc).__name__}"
            mdetail = str(exc).splitlines()[0][:120]
        results.append(
            {"mutation": f"{kind} {desc}", "killed": killed, "how": how}
        )
        print(json.dumps({name: results[-1]}), flush=True)
    return {
        "baseline": "ok",
        "mutants": results,
        "killed": sum(r["killed"] for r in results),
        "survived": sum(not r["killed"] for r in results),
    }


def main() -> int:
    # accept --all anywhere (a bare `gate_sensitivity.py --all` used
    # to swallow the flag as sf_dir and silently audit the default
    # sample against a nonexistent dir — round-14 review finding)
    args = [a for a in sys.argv[1:] if a != "--all"]
    all_flag = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if not Path(sf_dir).is_dir():
        # catches `--all <entry>` with no sf_dir: the entry name would
        # be silently consumed as sf_dir and the guard below skipped
        # (round-15 review finding — same silently-wrong-arg class as
        # the round-14 --all fix)
        raise SystemExit(
            f"gate_sensitivity: sf_dir {sf_dir!r} is not a directory "
            "(usage: gate_sensitivity.py [sf_dir] [entry ...] | "
            "gate_sensitivity.py [sf_dir] --all)"
        )
    if all_flag and args[1:]:
        # round-15 ADVICE (low): --all used to silently discard the
        # user-listed entries; the combination is ambiguous — reject it
        raise SystemExit(
            "gate_sensitivity: pass either --all or explicit entry "
            f"names, not both (got --all plus {args[1:]})"
        )
    names = args[1:] or DEFAULT_ENTRIES
    if all_flag:
        # full-registry audit (round-14 verdict item 1): every entry's
        # gate demonstrated to trip, not just a family sample
        names = list(REGISTRY)
    spark = get_spark(app_name="gate-sensitivity", cpus="8",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    report = {}
    import tempfile

    for name in names:
        bdir = bcon = None
        tmp = None
        if name in BOUNDARY_FIXTURES:
            tmp = tempfile.TemporaryDirectory(prefix=f"gate_boundary_{name}_")
            bdir = tmp.name
            BOUNDARY_FIXTURES[name](spark, bdir)
            bcon = _boundary_con(bdir)
        try:
            report[name] = audit_entry(spark, con, name, sf_dir, bdir, bcon)
        finally:
            if bcon is not None:
                bcon.close()
            if tmp is not None:
                tmp.cleanup()
    total_m = sum(len(r["mutants"]) for r in report.values())
    total_k = sum(r["killed"] for r in report.values())
    summary = {
        "sf_dir": sf_dir,
        "entries": len(names),
        "mutants": total_m,
        "killed": total_k,
        "kill_rate": round(total_k / total_m, 3) if total_m else None,
        "elapsed_sec": round(time.time() - t0, 1),
        "per_entry": report,
    }
    import os

    # round-15 review finding: the hard-coded "r14" default meant any
    # ad-hoc single-entry run silently OVERWROTE the committed round
    # evidence artifact (it destroyed the round-14 full-registry audit
    # until git restored it). Round-named artifacts are only written
    # when GATE_ROUND is set explicitly; unnamed runs go to the
    # adhoc file, which is never round evidence.
    rnd = os.environ.get("GATE_ROUND")
    out = (
        Path(__file__).resolve().parent.parent
        / f"GATE_SENSITIVITY_{rnd if rnd else 'adhoc'}.json"
    )
    out.write_text(json.dumps(summary, indent=1, default=str))
    print(json.dumps({k: v for k, v in summary.items() if k != "per_entry"}))
    survivors = {
        n: [m["mutation"] for m in r["mutants"] if not m["killed"]]
        for n, r in report.items()
        if r["survived"]
    }
    if survivors:
        print("SURVIVORS:", json.dumps(survivors))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
