"""Systematic crash-injection matrix for the ManifestTable commit
protocol (streaming/table_commit.py).

The existing durability tests pin SPECIFIC crash scenarios discovered
during review (schema orphan above/below the vacuum floor, half-
published manifest on fence loss, torn fence tmp).  This module closes
the class: it enumerates EVERY durable filesystem mutation a merge,
an evolving merge, and a vacuum perform (the ``os.replace`` /
``os.remove`` / ``shutil.rmtree`` calls under the table root — the
only operations whose effects survive a process death) and, for each
index k, kills the writer exactly at the k-th mutation, then asserts
the two protocol guarantees the docstrings promise:

  ATOMICITY  — a fresh reader sees EITHER the pre-batch committed
               snapshot or the post-batch one, never a torn mix; the
               ``_CURRENT`` pointer decides which.
  REPLAYABILITY — a fresh writer (new instance, as a restarted
               foreachBatch job would be) replaying the same batch id
               converges to exactly the clean-run state, and history/
               time travel/vacuum still work afterwards.

This mirrors how Delta/Iceberg test their commit protocols (kill at
every IO boundary, then recover); the matrix is discovered at run time
(a clean dry-run counts the mutations), so a future edit that adds a
durable op to the protocol is automatically covered — or, if it
reorders publishes unsafely, automatically caught.

Reference anchor: the commit-protocol semantics these invariants
protect are the replacement for KStreamDistinct.java:135-151's
changelog-backed state store durability (restore-on-restart); here the
"changelog" is the manifest history and the restore is a plain read.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager

import pytest


class InjectedCrash(Exception):
    """Simulated process death at a durable mutation point."""


@contextmanager
def _interleave(root: str, at: int, callback):
    """Two-process interleaving (round-17 verdict item 7): run
    ``callback()`` immediately AFTER the ``at``-th durable mutation
    under ``root`` (1-based) — simulating a concurrent ops process
    scheduled exactly at that boundary, instead of killing the writer
    there. Mutations performed BY the callback (its own fence claim,
    removes, sweeps) are not counted or re-triggered (reentrancy
    guard). Yields a dict with the running count."""
    state = {"count": 0, "in_callback": False}
    real_replace, real_remove, real_rmtree = (
        os.replace,
        os.remove,
        shutil.rmtree,
    )

    def _hit(path) -> bool:
        if state["in_callback"] or not str(path).startswith(root):
            return False
        state["count"] += 1
        return state["count"] == at

    def _fire():
        state["in_callback"] = True
        try:
            callback()
        finally:
            state["in_callback"] = False

    def replace(src, dst, **kw):
        fire = _hit(dst)
        out = real_replace(src, dst, **kw)
        if fire:
            _fire()
        return out

    def remove(path, **kw):
        fire = _hit(path)
        out = real_remove(path, **kw)
        if fire:
            _fire()
        return out

    def rmtree(path, *a, **kw):
        fire = _hit(path)
        out = real_rmtree(path, *a, **kw)
        if fire:
            _fire()
        return out

    os.replace, os.remove, shutil.rmtree = replace, remove, rmtree
    try:
        yield state
    finally:
        os.replace, os.remove, shutil.rmtree = (
            real_replace,
            real_remove,
            real_rmtree,
        )


@contextmanager
def _inject(root: str, crash_at: int | None):
    """Count durable mutations under ``root``; raise InjectedCrash on
    the ``crash_at``-th (1-based).  ``crash_at=None`` = dry run (count
    only).  Yields a dict with the running count.  Mutations outside
    the table root (Spark temp dirs etc.) pass through uncounted."""
    state = {"count": 0}
    real_replace, real_remove, real_rmtree = (
        os.replace,
        os.remove,
        shutil.rmtree,
    )

    def _hit(path):
        if not str(path).startswith(root):
            return
        state["count"] += 1
        if crash_at is not None and state["count"] == crash_at:
            raise InjectedCrash(f"durable op #{state['count']}: {path}")

    def replace(src, dst, **kw):
        _hit(dst)
        return real_replace(src, dst, **kw)

    def remove(path, **kw):
        _hit(path)
        return real_remove(path, **kw)

    def rmtree(path, *a, **kw):
        _hit(path)
        return real_rmtree(path, *a, **kw)

    os.replace, os.remove, shutil.rmtree = replace, remove, rmtree
    try:
        yield state
    finally:
        os.replace, os.remove, shutil.rmtree = (
            real_replace,
            real_remove,
            real_rmtree,
        )


# ---------------------------------------------------------------------------
# MaterializedCounts: merge crash matrix
# ---------------------------------------------------------------------------

def _mc_state(table, spark, at=None):
    return {
        r["user_id"]: (r["n"], float(r["total"]))
        for r in table.read(spark, at_batch=at).collect()
    }


B0 = [(1, 2.0), (2, 3.0)]
B1 = [(1, 1.0), (3, 7.0)]
S0 = {1: (1, 2.0), 2: (1, 3.0)}
S1 = {1: (2, 3.0), 2: (1, 3.0), 3: (1, 7.0)}


def _mc_batch(spark, rows):
    return spark.createDataFrame(rows, "user_id BIGINT, value DOUBLE")


def test_materialized_counts_merge_crash_matrix(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    # dry run: how many durable ops does a batch-1 merge perform?
    dry = str(tmp_path / "dry")
    t = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    t.apply_batch(_mc_batch(spark, B0), 0)
    writer = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    with _inject(dry, None) as st:
        writer.apply_batch(_mc_batch(spark, B1), 1)
    n_ops = st["count"]
    # fence claim + manifest publish + _CURRENT swap (schema unchanged
    # after batch 0 -> no schema version write); if this grows, the
    # matrix below grows with it
    assert n_ops >= 3
    assert _mc_state(writer, spark) == S1

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"k{k}")
        setup = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        setup.apply_batch(_mc_batch(spark, B0), 0)
        crasher = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        with _inject(root, k):
            with pytest.raises(InjectedCrash):
                crasher.apply_batch(_mc_batch(spark, B1), 1)

        # ATOMICITY: a fresh reader sees exactly one committed snapshot
        reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        committed = reader.committed_batch()
        assert committed in (0, 1), f"k={k}: torn pointer {committed}"
        expect = S1 if committed == 1 else S0
        assert _mc_state(reader, spark) == expect, f"k={k}"
        # versions() may include a half-published orphan at id 1
        # (manifest named, pointer not swapped) — never anything else
        assert set(reader.versions()) <= {0, 1}, f"k={k}"

        # REPLAYABILITY: a fresh writer replays batch 1 and converges
        replayer = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        replayer.apply_batch(_mc_batch(spark, B1), 1)
        assert _mc_state(replayer, spark) == S1, f"k={k} after replay"
        assert replayer.committed_batch() == 1
        assert replayer.versions() == [0, 1]
        # history intact, and maintenance still runs on the healed table
        assert _mc_state(replayer, spark, at=0) == S0, f"k={k}"
        replayer.vacuum(keep_last=1)
        assert _mc_state(replayer, spark) == S1, f"k={k} after vacuum"


# ---------------------------------------------------------------------------
# CdcTable: EVOLVING merge crash matrix (adds the schema-version
# publish to the op list, so the schema/commit ordering hazards from
# rounds 13-14 are each hit by some k)
# ---------------------------------------------------------------------------

def test_cdc_table_evolving_merge_crash_matrix(spark, tmp_path):
    from kafkastreams_example_spark.streaming.cdc_table import CdcTable

    df0_sql = "k BIGINT, seq BIGINT, op STRING, payload STRING"
    df1_sql = df0_sql + ", score DOUBLE"
    rows0 = [(1, 10, "u", "a"), (2, 11, "u", "b")]
    rows1 = [(1, 20, "u", "a2", 0.5), (3, 21, "u", "c", 0.9)]
    s0 = {1: ("a",), 2: ("b",)}
    s1 = {1: ("a2", 0.5), 2: ("b", None), 3: ("c", 0.9)}

    def state(table):
        out = {}
        for r in table.read(spark).collect():
            d = r.asDict()
            out[d["k"]] = (
                (d["payload"], d["score"])
                if "score" in d
                else (d["payload"],)
            )
        return out

    def mk(root, evolved):
        cols = ("payload", "score") if evolved else ("payload",)
        return CdcTable(root, key="k", n_buckets=4, payload_cols=cols)

    dry = str(tmp_path / "dry")
    mk(dry, False).apply_batch(spark.createDataFrame(rows0, df0_sql), 0)
    writer = mk(dry, True)
    with _inject(dry, None) as st:
        writer.apply_batch(spark.createDataFrame(rows1, df1_sql), 1)
    n_ops = st["count"]
    # fence + _SCHEMA-1 publish + manifest publish + _CURRENT swap
    assert n_ops >= 4
    assert state(writer) == s1

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"k{k}")
        mk(root, False).apply_batch(
            spark.createDataFrame(rows0, df0_sql), 0
        )
        with _inject(root, k):
            with pytest.raises(InjectedCrash):
                mk(root, True).apply_batch(
                    spark.createDataFrame(rows1, df1_sql), 1
                )

        reader = mk(root, True)
        committed = reader.committed_batch()
        assert committed in (0, 1), f"k={k}"
        got = state(reader)
        # the orphaned-schema rule (_schema_at: only committed versions
        # are honored) is what keeps the committed==0 read on the
        # NARROW pre-evolution shape even when _SCHEMA-1.json landed
        # before the crash
        assert got == (s1 if committed == 1 else s0), f"k={k}: {got}"

        replayer = mk(root, True)
        replayer.apply_batch(spark.createDataFrame(rows1, df1_sql), 1)
        assert state(replayer) == s1, f"k={k} after replay"
        # time travel across the evolution boundary still narrow
        old_cols = replayer.read(spark, at_batch=0).columns
        assert "score" not in old_cols, f"k={k}: {old_cols}"
        replayer.vacuum(keep_last=1)
        assert state(replayer) == s1, f"k={k} after vacuum"


# ---------------------------------------------------------------------------
# ops-vacuum BETWEEN a mid-commit crash and the batch retry: the
# half-published orphan manifest (durable, above _CURRENT) must not
# derail vacuum's keep/expire arithmetic into expiring the manifest
# the pointer names (post-close review finding) — vacuum resolves the
# orphan against the pointer and the retry still heals the table
# ---------------------------------------------------------------------------

def test_vacuum_between_commit_crash_and_retry(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    root = str(tmp_path / "t")
    setup = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    setup.apply_batch(_mc_batch(spark, B0), 0)

    # discover the op index of _commit's second rename (the _CURRENT
    # swap is the last durable op of a merge), then kill exactly there:
    # manifest-1 lands durable while the pointer still names manifest-0
    probe_root = str(tmp_path / "probe")
    p = MaterializedCounts(probe_root, keys=("user_id",), n_buckets=4)
    p.apply_batch(_mc_batch(spark, B0), 0)
    w = MaterializedCounts(probe_root, keys=("user_id",), n_buckets=4)
    with _inject(probe_root, None) as st:
        w.apply_batch(_mc_batch(spark, B1), 1)
    last_op = st["count"]

    crasher = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    with _inject(root, last_op):
        with pytest.raises(InjectedCrash):
            crasher.apply_batch(_mc_batch(spark, B1), 1)
    orphan = os.path.join(root, "manifests", "manifest-1.json")
    assert os.path.exists(orphan), "setup failed: no half-published orphan"
    reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    assert reader.committed_batch() == 0

    # the ops vacuum runs BEFORE the job restarts (the hazard window)
    ops = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    assert ops.vacuum(keep_last=1) == []  # nothing committed to expire
    # the pointer's manifest survived, the orphan did not
    assert ops.committed_batch() == 0
    assert ops.versions() == [0]
    assert not os.path.exists(orphan)
    assert _mc_state(ops, spark) == S0

    # and the retry still heals
    retry = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    retry.apply_batch(_mc_batch(spark, B1), 1)
    assert _mc_state(retry, spark) == S1
    assert retry.versions() == [0, 1]


# ---------------------------------------------------------------------------
# fenced-out zombie replaying an id the replacement ALREADY committed:
# _commit must never "roll back" (delete) the replacement's live
# manifest (post-close review finding — _commit now deliberately
# performs NO remove on fence loss, because any remove can race the
# replacement's replay of the same id and leave _CURRENT dangling)
# ---------------------------------------------------------------------------

def test_zombie_rollback_never_deletes_committed_manifest(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    root = str(tmp_path / "t")
    w2 = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    w2.apply_batch(_mc_batch(spark, B0), 0)
    w2.apply_batch(_mc_batch(spark, B1), 1)  # replacement owns batch 1

    # zombie w1 wakes mid-_commit of the SAME id: entry check long
    # past (no-op), first publish verify passes, second raises — the
    # exact interleaving where a rollback-on-fence-loss variant
    # deleted manifest-1 out from under _CURRENT
    w1 = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    w1._ensure_fence = lambda: None
    calls = {"n": 0}

    def verify_passes_once_then_fenced():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("fenced out (simulated mid-publish)")

    w1._verify_fence = verify_passes_once_then_fenced
    with pytest.raises(RuntimeError, match="fenced out"):
        w1._commit(dict(w2._current_manifest()), 1)

    # the committed manifest survived the zombie's rollback
    reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    assert reader.committed_batch() == 1
    assert reader.versions() == [0, 1]
    assert _mc_state(reader, spark) == S1
    reader.vacuum(keep_last=1)
    assert _mc_state(reader, spark) == S1


# ---------------------------------------------------------------------------
# zombie vacuum racing the replacement's _CURRENT swap: the orphan
# remove is one check-then-act window wide — a zombie that passed
# _verify_fence can delete the replacement's just-renamed manifest
# (above the stale pointer) before the replacement swaps _CURRENT,
# leaving the pointer naming a MISSING manifest (round-17 advice).
# vacuum now re-reads _CURRENT after the removes and restores any
# manifest it names from the bytes saved before deletion.
# ---------------------------------------------------------------------------

def test_zombie_vacuum_heals_current_after_racing_remove(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    root = str(tmp_path / "t")
    w2 = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    w2.apply_batch(_mc_batch(spark, B0), 0)
    w2.apply_batch(_mc_batch(spark, B1), 1)  # the replacement's batch
    m1 = os.path.join(root, "manifests", "manifest-1.json")
    m1_bytes = open(m1).read()

    # rewind the pointer: the replacement now sits BETWEEN _commit's
    # two renames — manifest-1 durable, _CURRENT still naming 0
    with open(os.path.join(root, "_CURRENT"), "w") as fh:
        fh.write("manifest-0.json")

    zombie = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    real_remove = os.remove

    def remove_then_replacement_swaps(path, **kw):
        real_remove(path, **kw)
        if str(path) == m1:
            # the replacement's second rename lands inside the window
            with open(os.path.join(root, "_CURRENT"), "w") as fh:
                fh.write("manifest-1.json")

    os.remove = remove_then_replacement_swaps
    try:
        zombie.vacuum(keep_last=2)
    finally:
        os.remove = real_remove

    # the heal: _CURRENT resolves, manifest-1 restored byte-identical,
    # history intact, the table reads the replacement's state
    reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    assert reader.committed_batch() == 1
    assert open(m1).read() == m1_bytes
    assert reader.versions() == [0, 1]
    assert _mc_state(reader, spark) == S1


# ---------------------------------------------------------------------------
# compact crash matrix: compaction rewrites the SAME logical state, so
# the invariant is stronger than the merge matrix's either/or — the
# table must read IDENTICALLY at every crash point (a compaction can
# only ever be invisible or complete, never observable as data change)
# ---------------------------------------------------------------------------

def test_compact_crash_matrix(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    def build(root):
        t = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        t.apply_batch(_mc_batch(spark, B0), 0)
        t.apply_batch(_mc_batch(spark, B1), 1)
        return t

    dry = str(tmp_path / "dry")
    t = build(dry)
    compactor = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    with _inject(dry, None) as st:
        compactor.compact(spark, 2)
    n_ops = st["count"]
    assert n_ops >= 3  # fence + manifest publish + _CURRENT swap
    assert _mc_state(compactor, spark) == S1

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"k{k}")
        build(root)
        compactor = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        with _inject(root, k):
            with pytest.raises(InjectedCrash):
                compactor.compact(spark, 2)

        reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        assert reader.committed_batch() in (1, 2), f"k={k}"
        assert _mc_state(reader, spark) == S1, f"k={k}: compaction leaked"

        # retry compaction from a fresh maintenance process, then
        # vacuum: the compacted table collapses to one version dir
        retry = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        retry.compact(spark, 2)
        assert _mc_state(retry, spark) == S1, f"k={k} after retry"
        assert retry.committed_batch() == 2
        retry.vacuum(keep_last=1)
        assert _mc_state(retry, spark) == S1, f"k={k} after vacuum"
        data = os.path.join(root, "data")
        dirs = sorted(
            n for n in os.listdir(data) if n.startswith("version=")
        )
        assert dirs == ["version=2"], f"k={k}: {dirs}"


# ---------------------------------------------------------------------------
# two-process interleavings (round-17): the crash matrices kill ONE
# writer at each durable op; these run a SECOND process's full
# operation at each boundary instead and assert the same guarantees.
# ---------------------------------------------------------------------------

def test_vacuum_during_merge_interleaving(spark, tmp_path):
    """An ops vacuum lands at EVERY durable-op boundary of a live
    merge (the vacuum claims the fence — the documented supersede).
    Invariants at each boundary: the merge either commits fully
    before the vacuum supersedes it or fails loudly on its next
    fence-checked publish (never a torn commit); the table then reads
    EITHER the pre-batch or post-batch state; and a fresh writer
    replaying the batch id converges to the clean-run state."""
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    # dry run: count the merge's durable ops
    dry = str(tmp_path / "dry")
    t = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    t.apply_batch(_mc_batch(spark, B0), 0)
    w = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    with _inject(dry, None) as st:
        w.apply_batch(_mc_batch(spark, B1), 1)
    n_ops = st["count"]
    assert n_ops >= 3

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"k{k}")
        setup = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        setup.apply_batch(_mc_batch(spark, B0), 0)
        writer = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        vac_result = {}

        def ops_vacuum():
            ops = MaterializedCounts(
                root, keys=("user_id",), n_buckets=4
            )
            vac_result["expired"] = ops.vacuum(keep_last=1)

        outcome = None
        with _interleave(root, k, ops_vacuum):
            try:
                writer.apply_batch(_mc_batch(spark, B1), 1)
                outcome = "committed"
            except RuntimeError as exc:
                assert "fenced out" in str(exc), f"k={k}: {exc}"
                outcome = "fenced"
        assert vac_result.get("expired") is not None, f"k={k}: vacuum never ran"

        # ATOMICITY: pre-batch or post-batch, never torn
        reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        cb = reader.committed_batch()
        assert cb in (0, 1), f"k={k}"
        state = _mc_state(reader, spark)
        assert state == (S1 if cb == 1 else S0), f"k={k} ({outcome})"
        if outcome == "committed":
            assert cb == 1, f"k={k}: merge reported success but lost"

        # REPLAYABILITY: a fresh writer (post-supersede) heals
        retry = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        retry.apply_batch(_mc_batch(spark, B1), 1)
        assert _mc_state(retry, spark) == S1, f"k={k} after retry"
        retry.vacuum(keep_last=1)
        assert _mc_state(retry, spark) == S1, f"k={k} after vacuum"


def test_compact_under_concurrent_reader(spark, tmp_path):
    """Snapshot isolation under maintenance: a reader that resolved
    the manifest BEFORE compaction keeps reading its exact snapshot
    from the resolved paths at EVERY durable-op boundary of the
    compaction (compact never destroys data dirs — only vacuum does),
    and time travel to the pre-compact batch survives the compaction.
    After a subsequent vacuum the old snapshot's dirs are reclaimed
    (that is vacuum's contract) but re-resolution still reads the
    same logical state."""
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    root = str(tmp_path / "t")
    t = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    t.apply_batch(_mc_batch(spark, B0), 0)
    t.apply_batch(_mc_batch(spark, B1), 1)

    reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
    pinned_paths = sorted(set(reader._current_manifest().values()))
    pinned_batch = reader.committed_batch()

    def pinned_state():
        df = spark.read.parquet(*pinned_paths)
        return {
            r["user_id"]: (r["n"], float(r["total"]))
            for r in df.collect()
        }

    # dry-run compaction on a twin table to count its durable ops
    twin = str(tmp_path / "twin")
    t2 = MaterializedCounts(twin, keys=("user_id",), n_buckets=4)
    t2.apply_batch(_mc_batch(spark, B0), 0)
    t2.apply_batch(_mc_batch(spark, B1), 1)
    c2 = MaterializedCounts(twin, keys=("user_id",), n_buckets=4)
    with _inject(twin, None) as st:
        c2.compact(spark, 2)
    n_ops = st["count"]

    # the CONCURRENT reader observes its pinned snapshot at every
    # boundary of the real table's compaction; a FRESH compactor per
    # pass (as a restarted maintenance job would be) keeps the
    # durable-op sequence identical — fence claim included — so k
    # sweeps every boundary
    observed = []
    for k in range(1, n_ops + 1):
        compactor = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        with _interleave(root, k, lambda: observed.append(pinned_state())):
            compactor.compact(spark, 2 + k)  # fresh id per pass
    assert len(observed) == n_ops, (len(observed), n_ops)
    assert all(s == S1 for s in observed), observed

    # post-compact: pinned paths still read; time travel to the
    # pre-compact batch still resolves
    assert pinned_state() == S1
    assert _mc_state(compactor, spark, at=pinned_batch) == S1
    assert _mc_state(compactor, spark) == S1

    # vacuum reclaims the old snapshot (the pinned paths die — that
    # is the documented end of a snapshot's life), re-resolution holds
    compactor.vacuum(keep_last=1)
    assert _mc_state(
        MaterializedCounts(root, keys=("user_id",), n_buckets=4), spark
    ) == S1
    assert not any(os.path.exists(p) for p in pinned_paths)


# ---------------------------------------------------------------------------
# vacuum crash matrix: maintenance dies mid-expiry; the CURRENT
# snapshot must survive every prefix of vacuum's deletions and a
# retried vacuum must finish the job
# ---------------------------------------------------------------------------

def test_vacuum_crash_matrix(spark, tmp_path):
    from kafkastreams_example_spark.streaming.mat_view import (
        MaterializedCounts,
    )

    batches = [B0, B1, [(2, 5.0)]]
    s_final = {1: (2, 3.0), 2: (2, 8.0), 3: (1, 7.0)}

    def build(root):
        t = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        for i, rows in enumerate(batches):
            t.apply_batch(_mc_batch(spark, rows), i)
        # plant a schema orphan ABOVE the floor so the orphan purge
        # (vacuum's first destructive phase) is part of the matrix
        schema_json = open(os.path.join(root, "_SCHEMA-0.json")).read()
        with open(os.path.join(root, "_SCHEMA-9.json"), "w") as fh:
            fh.write(schema_json)
        return t

    dry = str(tmp_path / "dry")
    t = build(dry)
    vac = MaterializedCounts(dry, keys=("user_id",), n_buckets=4)
    with _inject(dry, None) as st:
        expired = vac.vacuum(keep_last=1)
    n_ops = st["count"]
    assert expired == [0, 1]
    # fence + orphan schema remove + 2 manifest removes + >=1 rmtree
    assert n_ops >= 5
    assert _mc_state(vac, spark) == s_final

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"k{k}")
        build(root)
        vac = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        with _inject(root, k):
            with pytest.raises(InjectedCrash):
                vac.vacuum(keep_last=1)

        # the newest snapshot survives EVERY deletion prefix
        reader = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        assert reader.committed_batch() == 2, f"k={k}"
        assert _mc_state(reader, spark) == s_final, f"k={k}"

        # a retried vacuum (fresh maintenance process) finishes
        retry = MaterializedCounts(root, keys=("user_id",), n_buckets=4)
        retry.vacuum(keep_last=1)
        assert retry.versions() == [2], f"k={k}"
        assert _mc_state(retry, spark) == s_final, f"k={k} after retry"
        # the planted orphan is gone, and the surviving version dirs
        # are EXACTLY the set the kept manifest references (cold
        # buckets legitimately pin old dirs — carried-forward refs)
        assert not os.path.exists(
            os.path.join(root, "_SCHEMA-9.json")
        ), f"k={k}"
        data = os.path.join(root, "data")
        dirs = {
            os.path.join(data, n)
            for n in os.listdir(data)
            if n.startswith("version=")
        }
        live = {
            os.path.dirname(p)
            for p in retry._current_manifest().values()
        }
        assert dirs == live, f"k={k}: dirs={dirs} live={live}"
