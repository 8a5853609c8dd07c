"""Shared manifest-commit machinery for the incremental streaming
tables (mat_view.MaterializedCounts, cdc_table.CdcTable).

Both tables store hash-bucketed parquet under
``data/version=<batch_id>/bucket=<b>`` with JSON manifests mapping
bucket → live data dir and an atomic ``_CURRENT`` pointer swap as the
commit (see mat_view.py's module docstring for the full protocol
rationale — crash safety, idempotent replay, O(hot-buckets) merges).
What differs between them is only the MERGE ALGEBRA (additive monoid
fold vs last-writer-wins argmax); everything about naming versions,
committing, reading manifests, time travel, and snapshot expiry is
protocol, so it lives here once.

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

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    """Commit-protocol base: subclasses implement the merge algebra
    and call ``_commit``/``_current_manifest`` around their writes."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

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
        name = f"manifest-{batch_id}.json"
        mpath = os.path.join(self.path, "manifests", name)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, mpath)
        ptmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(ptmp, "w") as fh:
            fh.write(name)
        os.replace(ptmp, os.path.join(self.path, "_CURRENT"))

    def _save_schema(self, schema) -> None:
        """Persist the table's read-shape StructType next to the
        manifests, once, on the first apply (a delta frame has a schema
        even when it has zero rows). This is what makes a PRE-data read
        return the same column types as a post-commit read — without it
        the empty branch would have to guess types and a caller's
        unionByName/join written against the committed schema breaks."""
        spath = os.path.join(self.path, "_SCHEMA.json")
        if os.path.exists(spath):
            return
        tmp = spath + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(schema.json())
        os.replace(tmp, spath)

    def _load_schema(self):
        spath = os.path.join(self.path, "_SCHEMA.json")
        if not os.path.exists(spath):
            return None
        from pyspark.sql.types import StructType

        with open(spath) as fh:
            return StructType.fromJson(json.load(fh))

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
        snapshots pin). Returns the expired batch ids."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.versions()
        expire, keep = versions[:-keep_last], versions[-keep_last:]
        if not expire:
            return []
        live_dirs: set[str] = set()
        for v in keep:
            with open(
                os.path.join(self.path, "manifests", f"manifest-{v}.json")
            ) as fh:
                for p in json.load(fh).values():
                    live_dirs.add(os.path.dirname(p))
        for v in expire:
            os.remove(os.path.join(self.path, "manifests", f"manifest-{v}.json"))
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
    def _read_paths(self, spark: SparkSession, paths) -> DataFrame:
        """Read bucket data dirs with basePath discovery (recovers the
        bucket/version partition columns from the dir layout)."""
        return spark.read.option(
            "basePath", os.path.join(self.path, "data")
        ).parquet(*sorted(set(paths)))

    def _read_manifest_paths(
        self, spark: SparkSession, manifest: dict[str, str]
    ) -> DataFrame:
        return self._read_paths(spark, manifest.values())
