"""Shared manifest-commit machinery for the incremental streaming
tables (mat_view.MaterializedCounts, cdc_table.CdcTable).

Both tables store hash-bucketed parquet under
``data/version=<batch_id>/bucket=<b>`` with JSON manifests mapping
bucket → live data dir and an atomic ``_CURRENT`` pointer swap as the
commit (see mat_view.py's module docstring for the full protocol
rationale — crash safety, idempotent replay, O(hot-buckets) merges).
What differs between them is only the MERGE ALGEBRA (additive monoid
fold vs last-writer-wins argmax); everything about naming versions,
committing, reading manifests, time travel, SCHEMA versioning
(additive column evolution without rewrite — see ``_save_schema``),
and snapshot expiry is protocol, so it lives here once.

``vacuum`` must respect carried-forward references: after incremental
merges the newest manifest routinely points into OLD version dirs for
cold buckets, so expiry deletes a version dir only when NO kept
manifest references it — and sweeps all unreferenced dirs, not just
this round's expired ids, because an earlier expiry may have orphaned
a dir whose reference has since aged out.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    """Commit-protocol base: subclasses implement the merge algebra
    and call ``_commit``/``_current_manifest`` around their writes.

    Writer FENCING (round-15): the whole protocol's crash-safety
    argument assumes a single writer, but until now that was only
    documented — two writers (the canonical hazard: a crashed job's
    zombie retrying beside its replacement) could interleave
    ``_save_schema``/``_commit`` and produce exactly the
    orphan-resurrection skew classes the round-14 fixes handle only
    for crash-then-resume. Each instance therefore claims an
    epoch-fencing token on its FIRST write (``_FENCE.json``:
    monotonically increasing epoch + instance id) and re-verifies it
    before every subsequent schema write and commit: when a newer
    writer has claimed, the stale instance raises instead of
    publishing — the zombie loses, loudly. Claiming is
    read-increment-replace, not a distributed lock: the deployment
    still brings writers up one at a time (the single-writer model);
    the fence turns a violated assumption into an error instead of
    silent corruption, which is all a lock file on a non-locking
    filesystem (S3, NFS) can honestly promise."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        self._writer_id = uuid.uuid4().hex
        self._fence_epoch: int | None = None

    # -- writer fencing -------------------------------------------------
    def _read_fence(self) -> dict | None:
        fpath = os.path.join(self.path, "_FENCE.json")
        if not os.path.exists(fpath):
            return None
        with open(fpath) as fh:
            return json.load(fh)

    def _ensure_fence(self) -> None:
        """First write of this instance: claim the fence (bump the
        epoch under this instance's id). Every later write: verify the
        claim still stands — a different id or epoch means another
        writer took over after us, so this instance is a zombie and
        must not publish."""
        if self._fence_epoch is None:
            cur = self._read_fence()
            epoch = (int(cur["epoch"]) if cur else 0) + 1
            fpath = os.path.join(self.path, "_FENCE.json")
            # writer-unique tmp name: two simultaneous first-claims
            # must not interleave writes through a SHARED .tmp (one
            # truncating the other mid-write would publish torn JSON
            # and every later _read_fence would crash instead of
            # fencing — round-15 review finding); with unique tmps the
            # two atomic replaces serialize and one coherent claim
            # wins, which the loser's next _ensure_fence detects
            tmp = f"{fpath}.{self._writer_id}.tmp"
            with open(tmp, "w") as fh:
                json.dump({"epoch": epoch, "writer": self._writer_id}, fh)
            os.replace(tmp, fpath)
            self._fence_epoch = epoch
            return
        self._verify_fence()

    def _verify_fence(self) -> None:
        """Fence re-check at a PUBLISH point (round-16 narrowing):
        ``_ensure_fence`` runs at method entry, but a merge stages tmp
        files for a while before renaming them durable — re-verifying
        immediately before each atomic rename (and before vacuum's
        destructive phase) shrinks the zombie-interleave window from
        "whole merge" to "one rename". The window cannot be zero
        without a locking filesystem; this is the honest minimum."""
        cur = self._read_fence()
        if (
            cur is None
            or cur.get("writer") != self._writer_id
            or int(cur.get("epoch", -1)) != self._fence_epoch
        ):
            raise RuntimeError(
                f"ManifestTable writer fenced out at {self.path}: this "
                f"instance holds epoch {self._fence_epoch} but the "
                f"current fence is {cur} — another writer has taken "
                f"over (the table is single-writer; a superseded "
                f"writer must not publish)"
            )

    # -- commit protocol ------------------------------------------------
    def _current_manifest(self) -> dict[str, str]:
        ptr = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(ptr):
            return {}
        with open(ptr) as fh:
            name = fh.read().strip()
        with open(os.path.join(self.path, "manifests", name)) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict[str, str], batch_id: int) -> None:
        self._ensure_fence()
        name = f"manifest-{batch_id}.json"
        mpath = os.path.join(self.path, "manifests", name)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
        # a manifest file is durable the moment it is named (versions()
        # lists the directory), so the rename is a publish — re-verify
        # the fence immediately before it, with the tmp fully staged
        self._verify_fence()
        os.replace(tmp, mpath)
        ptmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(ptmp, "w") as fh:
            fh.write(name)
        # fenced out BETWEEN the two renames: raise WITHOUT touching
        # the already-named manifest. Deliberately no rollback: any
        # os.remove here can race the replacement's own deterministic
        # replay of this id and delete the manifest it is about to
        # point _CURRENT at — a permanently wedged table, strictly
        # worse than the orphan (two post-close review rounds each
        # found a live interleaving in a guarded-remove variant).
        # The half-published orphan above the pointer is harmless and
        # short-lived: readers resolve through _CURRENT, the single
        # writer's retry of this batch id overwrites it (the same
        # story as a CRASH here, which could never roll back anyway),
        # and vacuum deletes any orphan above the pointer it finds.
        self._verify_fence()
        os.replace(ptmp, os.path.join(self.path, "_CURRENT"))

    def _save_schema(self, schema, batch_id: int = 0) -> None:
        """Persist the table's read-shape StructType, VERSIONED like the
        manifests (round-13 schema evolution): the first apply writes
        ``_SCHEMA-<batch_id>.json``; a later apply whose delta ADDS
        columns (existing names keep their exact types) writes a new
        schema version — no data rewrite, old version files simply
        NULL-fill the new columns at read time (parquet
        read-by-explicit-schema semantics). Anything non-additive —
        dropped column, type change — raises: that class of evolution
        needs a rewrite and must be a conscious migration, not a drive-
        by from one odd micro-batch. An identical schema writes
        nothing. This is also what makes a PRE-data read return the
        same column types as a post-commit read."""
        self._ensure_fence()
        latest = self._schema_at(None)
        if latest is not None:
            if latest.json() == schema.json():
                return
            have = {f.name: f.dataType for f in latest.fields}
            new = {f.name: f.dataType for f in schema.fields}
            non_additive = [
                n for n, t in have.items() if n not in new or new[n] != t
            ]
            if non_additive:
                raise ValueError(
                    f"non-additive schema change for {non_additive}: "
                    "committed columns may only be ADDED to (same name, "
                    "same type); dropping or retyping needs an explicit "
                    "table migration"
                )
        spath = os.path.join(self.path, f"_SCHEMA-{batch_id}.json")
        tmp = spath + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(schema.json())
        self._verify_fence()
        os.replace(tmp, spath)

    def _schema_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            if name.startswith("_SCHEMA-") and name.endswith(".json"):
                out.append(int(name[len("_SCHEMA-") : -len(".json")]))
        return sorted(out)

    def _schema_at(self, at_batch: int | None):
        """Read-shape schema as of a batch id (None = latest): the
        newest schema version ≤ at_batch, so TIME TRAVEL across an
        evolution boundary reads old snapshots with their OWN column
        set. Falls back to the legacy un-versioned _SCHEMA.json
        (pre-evolution tables).

        Only COMMITTED schema versions are honored: ``_save_schema``
        runs before the data write, so a crash between the schema
        write and ``_commit`` leaves an orphaned ``_SCHEMA-<id>.json``
        for a batch that never committed, and an uncapped read
        at/after that id would pair the pre-evolution snapshot with
        the evolved (wider) column set (round-13 ADVICE). A version is
        committed iff a manifest with ITS id exists — a bare
        at-or-below-the-cap rule is not enough: a LATER batch
        committing under the old schema would otherwise resurrect the
        orphan, and the next ``_save_schema`` would judge the true
        (narrower) schema "non-additive" against it and wedge the
        writer (round-14 review finding). Versions older than the
        OLDEST kept manifest are honored too (vacuum expires
        manifests; in the single-writer model an orphan at id v is
        overwritten by v's retry before any later id commits, so a
        version below the kept-history floor was necessarily
        committed)."""
        from pyspark.sql.types import StructType

        committed = set(self.versions())
        if at_batch is None:
            cap = self.committed_batch()
        else:
            at_or_below = [v for v in committed if v <= at_batch]
            cap = max(at_or_below) if at_or_below else None
        hist_floor = min(committed) if committed else None
        versions = self._schema_versions()
        eligible = (
            []
            if cap is None
            else [
                v
                for v in versions
                if v <= cap and (v in committed or v < hist_floor)
            ]
        )
        if eligible:
            spath = os.path.join(
                self.path, f"_SCHEMA-{max(eligible)}.json"
            )
            with open(spath) as fh:
                return StructType.fromJson(json.load(fh))
        legacy = os.path.join(self.path, "_SCHEMA.json")
        if os.path.exists(legacy):
            with open(legacy) as fh:
                return StructType.fromJson(json.load(fh))
        return None

    def _load_schema(self):
        return self._schema_at(None)

    def committed_batch(self) -> int | None:
        ptr = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return int(fh.read().strip().rsplit("-", 1)[1].split(".")[0])

    # -- history --------------------------------------------------------
    def versions(self) -> list[int]:
        """Committed batch ids, ascending — every one remains readable
        until vacuumed (manifests are immutable; a version dir is only
        ever superseded by a later manifest pointing elsewhere, so old
        manifests keep resolving: snapshot isolation for free from the
        immutable version=<id> layout)."""
        mdir = os.path.join(self.path, "manifests")
        out = []
        for name in os.listdir(mdir):
            if name.startswith("manifest-") and name.endswith(".json"):
                out.append(int(name[len("manifest-") : -len(".json")]))
        return sorted(out)

    def _manifest_at(self, batch_id: int) -> dict[str, str]:
        eligible = [v for v in self.versions() if v <= batch_id]
        if not eligible:
            return {}
        name = f"manifest-{max(eligible)}.json"
        with open(os.path.join(self.path, "manifests", name)) as fh:
            return json.load(fh)

    def _resolve_manifest(self, at_batch: int | None) -> dict[str, str]:
        return (
            self._current_manifest()
            if at_batch is None
            else self._manifest_at(at_batch)
        )

    # -- maintenance ----------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Expire history: drop all but the newest ``keep_last``
        manifests, then delete every version dir no kept manifest
        references — the expire_snapshots half of table maintenance.
        Time travel keeps working for kept manifests and stops for the
        expired ones (that is the point: reclaiming the storage old
        snapshots pin). Returns the expired batch ids (committed ones
        only — half-published orphans resolved along the way are not
        history).

        History is anchored on the ``_CURRENT`` pointer: manifests
        ABOVE the pointed-to id are half-published debris from a
        writer that died between ``_commit``'s two renames, never
        committed state — vacuum deletes them rather than letting
        keep/expire arithmetic select them (which could expire the
        manifest the pointer names and wedge the table).

        Maintenance is a WRITE (it deletes manifests, schema versions
        and data dirs), so it runs under the same fence as commits: an
        instance that vacuums either already holds the fence or claims
        it — an ops process vacuuming a live table thereby TAKES
        writership and the old writer fails loudly on its NEXT
        fence-checked write — since round 16 that includes the
        in-flight one: the writer re-verifies the fence immediately
        before each atomic rename, so a mid-merge supersede fails the
        merge at its publish instead of interleaving. The residual
        window is one rename (check-then-act, not a lock — the
        honest minimum on a non-locking filesystem); run maintenance
        from the writer's own schedule or while it is down."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        self._ensure_fence()
        all_manifests = self.versions()
        cur = self.committed_batch()
        # anchor history on the POINTER: a manifest above the id
        # _CURRENT names was never fully committed — it is the
        # half-published debris of a writer that died (or was fenced
        # out without managing a rollback) between _commit's two
        # renames. Treating it as committed would let keep/expire
        # select it and expire the manifest _CURRENT points to,
        # wedging every later read AND the batch retry that would
        # have healed the orphan (post-close review finding). Such
        # orphans are deleted here instead: the single writer's retry
        # of that batch id deterministically recreates them, and
        # leaving them would keep time-travel reads at/above their id
        # resolving to dangling paths once the sweep reclaims their
        # staged data dirs.
        if cur is None:
            committed_ids, orphans = [], list(all_manifests)
        else:
            committed_ids = [v for v in all_manifests if v <= cur]
            orphans = [v for v in all_manifests if v > cur]
        # destructive phase 1 (orphan manifests + orphan schema
        # versions): re-verify the fence immediately before it, so a
        # zombie vacuum passing only the entry check cannot purge the
        # replacement's just-written schema version while its manifest
        # is still in flight (round-16 self-review — exactly the
        # evolved-columns corruption the orphan rule guards against)
        self._verify_fence()
        # keep the orphan bytes in hand: the remove below carries the
        # same one-rename check-then-act window as _commit — a zombie
        # vacuum that passed _verify_fence can delete the REPLACEMENT
        # writer's just-renamed manifest before the replacement swaps
        # _CURRENT, leaving the pointer naming a missing manifest
        # (wedged if that writer dies before its next commit heals
        # it). Healing rule (round-17 advice, loop form per round-18
        # advice): after the removes, re-read _CURRENT and RESTORE any
        # removed manifest it names from the saved bytes, REPEATING
        # until a stable read — two consecutive reads agree and the
        # named manifest (if ours) is already restored. A single
        # re-read narrowed the window but a replacement writer
        # swapping _CURRENT just after it still left the pointer
        # naming a deleted manifest; the loop closes that for any
        # finite number of swaps observed while vacuuming. The
        # iteration bound is a liveness backstop, not a correctness
        # hole: a writer still swapping past it is alive by
        # definition, and every id it can swap TO from here on is
        # either already restored below or a manifest vacuum never
        # touched. The restored ids are committed history, not
        # orphans, and join the keep/expire arithmetic below.
        removed: dict[int, str] = {}
        for v in orphans:
            p = os.path.join(self.path, "manifests", f"manifest-{v}.json")
            with open(p) as fh:
                removed[v] = fh.read()
            os.remove(p)
        if removed:
            restored: set[int] = set()
            prev: object = object()  # never equals a first read
            for _ in range(8):
                cur_after = self.committed_batch()
                if (
                    cur_after is not None
                    and cur_after in removed
                    and cur_after not in restored
                ):
                    p = os.path.join(
                        self.path, "manifests", f"manifest-{cur_after}.json"
                    )
                    tmp = p + ".restore.tmp"
                    with open(tmp, "w") as fh:
                        fh.write(removed[cur_after])
                    os.replace(tmp, p)
                    restored.add(cur_after)
                    committed_ids = sorted({*committed_ids, cur_after})
                    prev = object()  # force a confirming re-read
                    continue
                if cur_after == prev:
                    break
                prev = cur_after
        versions = committed_ids
        # while manifest history is still known, purge ORPHANED schema
        # versions (no manifest ever committed their id): after expiry
        # the kept-history floor rises and _schema_at's below-the-floor
        # trust rule would start honoring them (round-14 review
        # hardening; maintenance never runs concurrently with the
        # single writer). Only versions ABOVE the current floor are
        # decidable: once a prior vacuum has expired manifests, a
        # schema version below min(committed) has no manifest LEFT yet
        # was necessarily committed (the same single-writer argument
        # _schema_at's v < hist_floor rule rests on), so treating it
        # as an orphan would delete live evolution history and silently
        # drop the evolved columns from every read at/after its batch
        # (round-15 ADVICE).
        committed = set(versions)
        for v in self._schema_versions():
            if committed and v not in committed and v > min(committed):
                os.remove(os.path.join(self.path, f"_SCHEMA-{v}.json"))
        if not versions:
            # nothing committed: leave any staged data dirs alone (a
            # first batch's parquet may be durable ahead of its commit;
            # its retry overwrites it)
            return []
        expire, keep = versions[:-keep_last], versions[-keep_last:]
        live_dirs: set[str] = set()
        for v in keep:
            with open(
                os.path.join(self.path, "manifests", f"manifest-{v}.json")
            ) as fh:
                for p in json.load(fh).values():
                    live_dirs.add(os.path.dirname(p))
        # destructive phase 2 (manifest expiry + dir sweep): the
        # keep-manifest reads above took time — re-verify immediately
        # before deleting, keeping each destructive phase one
        # check-then-act window wide (post-close review finding: the
        # phase-1 relocation had LEFT this phase unguarded)
        self._verify_fence()
        for v in expire:
            os.remove(os.path.join(self.path, "manifests", f"manifest-{v}.json"))
        # the dir sweep runs even when NOTHING expired this round: a
        # prior vacuum that died between its manifest expiry and its
        # sweep leaves unreferenced dirs with no manifest left to
        # expire, so an expire-gated sweep could never reclaim them
        # (round-16 crash-matrix finding)
        data = os.path.join(self.path, "data")
        kept = {os.path.join(data, f"version={v}") for v in keep}
        for name in os.listdir(data):
            vdir = os.path.join(data, name)
            if (
                name.startswith("version=")
                and vdir not in live_dirs
                and vdir not in kept
            ):
                shutil.rmtree(vdir)
        return expire

    # -- shared read/compact plumbing ----------------------------------
    def _read_paths(self, spark: SparkSession, paths, schema=None) -> DataFrame:
        """Read bucket data dirs with basePath discovery (recovers the
        bucket/version partition columns from the dir layout — Spark
        appends partition columns to an explicit schema). Passing the
        resolved table ``schema`` does double duty: files written
        before an additive evolution NULL-fill the newer columns, and
        the scan skips per-file footer schema inference entirely (at
        warehouse scale, mergeSchema-style inference reads every
        footer; the manifest-resolved schema is authoritative)."""
        reader = spark.read.option(
            "basePath", os.path.join(self.path, "data")
        )
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*sorted(set(paths)))

    def _read_manifest_paths(
        self, spark: SparkSession, manifest: dict[str, str], schema=None
    ) -> DataFrame:
        return self._read_paths(spark, manifest.values(), schema)
