"""CDC snapshot table: apply an insert/update/delete change stream to
a keyed table with last-writer-wins semantics — the OTHER half of the
streaming-table story next to mat_view.py's additive aggregate.

A materialized aggregate folds a commutative monoid, so merge order
inside a batch never matters. A CDC apply (Debezium-style change
events, Delta MERGE from a change feed) is NOT a monoid: the latest
change per key wins outright and a delete REMOVES the key. That needs
a total order on changes — here an explicit monotonically increasing
``seq`` column (the CDC source's log offset / LSN; never wall-clock,
which duplicates and reorders) — and a per-key argmax-by-seq reduction
instead of a sum.

Storage reuses the mat_view layout and commit protocol verbatim
(hash-bucketed parquet under data/version=<batch_id>, JSON manifests,
atomic _CURRENT pointer swap, idempotent per batch id, bucket-pruned
merges, read-time manifest resolution, time travel via retained
manifests): the difference is entirely in the merge step —

  * batch delta: keep each key's max-seq change (``max_by`` over the
    batch — map-side partial, one shuffle of distinct keys),
  * merge with current bucket state: again max-seq per key between
    state row and delta row,
  * a winning DELETE drops the key from the rewritten bucket. No
    tombstone retention is needed under the single-writer ordered-
    batch contract: the key's bucket is rewritten by this merge, so
    absence IS the tombstone, and any later re-insert carries a later
    seq anyway.

Correctness contract (oracle-checked end-to-end by the
``cdc_snapshot`` registry entry in queries.py): for ANY batching of
the change stream that respects seq order across batches per key, the
final table equals the one-shot "latest change per key, drop deletes"
query over the whole stream.

No reference-repo counterpart (the reference app's sink only appends
to a topic — kafkastreams-example KafkaStreamsApplication.java:92-114);
this is SURVEY.md §2c extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_commit import ManifestTable


class CdcTable(ManifestTable):
    """Keyed snapshot maintained from (op, key, seq, *payloads) change
    batches. ``op`` is 'u' (upsert) or 'd' (delete); ties on seq break
    deterministically toward delete then larger payloads (documented —
    a real CDC source never ties because seq is a log offset).
    Storage, commits, version history, time travel, schema versioning,
    and vacuum come from ManifestTable; this class is only the argmax
    merge algebra.

    Additive schema evolution (round 13): reconstruct the table object
    with a GROWN ``payload_cols`` and keep applying — the new column is
    recorded as a schema version at that batch id, pre-evolution bucket
    files NULL-fill it at read/merge time (no rewrite), and time travel
    to pre-evolution snapshots reads their own narrower column set.
    Dropping or retyping a committed column raises (a conscious
    migration, not a merge)."""

    def __init__(
        self,
        path: str,
        key: str = "key",
        seq_col: str = "seq",
        op_col: str = "op",
        payload_col: str = "payload",
        n_buckets: int = 16,
        col_types: dict[str, str] | None = None,
        payload_cols: tuple[str, ...] | None = None,
    ) -> None:
        super().__init__(path)
        self.key = key
        self.seq_col = seq_col
        self.op_col = op_col
        # multi-payload form (round-13 schema evolution); payload_col
        # stays as the single-column shorthand
        self.payload_cols = tuple(payload_cols or (payload_col,))
        self.payload_col = self.payload_cols[0]
        self.n_buckets = n_buckets
        # DDL type per column for reads BEFORE the first apply_batch;
        # after the first apply the persisted schema versions win
        self.col_types = dict(col_types or {})

    # -- merge ----------------------------------------------------------
    def _latest_per_key(self, df: DataFrame) -> DataFrame:
        """Argmax-by-(seq, op desc, payloads) per key: one hash agg with
        map-side partials (max_by), never a window sort."""
        rank = F.struct(
            F.col(self.seq_col).alias("s"),
            (F.col(self.op_col) == "d").cast("int").alias("del_wins"),
            *[F.col(c).alias(f"p{i}") for i, c in enumerate(self.payload_cols)],
        )
        row = F.struct(
            F.col(self.seq_col),
            F.col(self.op_col),
            *[F.col(c) for c in self.payload_cols],
        )
        return (
            df.groupBy("bucket", self.key)
            .agg(F.max_by(row, rank).alias("r"))
            .select(
                "bucket",
                self.key,
                F.col(f"r.{self.seq_col}").alias(self.seq_col),
                F.col(f"r.{self.op_col}").alias(self.op_col),
                *[
                    F.col(f"r.{c}").alias(c)
                    for c in self.payload_cols
                ],
            )
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Apply one change batch. Idempotent per batch_id."""
        committed = self.committed_batch()
        if committed is not None and batch_id <= committed:
            return
        spark = batch_df.sparkSession
        # persist across the two actions (hot-bucket collect, merge
        # write): the per-key argmax over the batch would otherwise run
        # once per action (guide §5: reused AND expensive)
        delta = self._latest_per_key(
            batch_df.withColumn(
                "bucket",
                F.pmod(F.xxhash64(self.key), F.lit(self.n_buckets)).cast("int"),
            )
        ).persist()
        try:
            data_schema = delta.select(
                self.key, self.seq_col, *self.payload_cols
            ).schema
            # versioned save: an ADDITIVE payload-column change records a
            # new schema version at this batch id (no data rewrite); a
            # non-additive change raises before anything is written
            self._save_schema(data_schema, batch_id)
            hot = [r["bucket"] for r in delta.select("bucket").distinct().collect()]
            manifest = self._current_manifest()
            if not hot:
                self._commit(manifest, batch_id)
                return
            cur_paths = [manifest[str(b)] for b in hot if str(b) in manifest]
            merged = delta
            if cur_paths:
                cur = (
                    # explicit current schema: bucket files written BEFORE
                    # an additive evolution NULL-fill the new columns here,
                    # so old state merges with new-schema deltas untouched
                    self._read_paths(spark, cur_paths, data_schema)
                    # state rows are live upserts by construction
                    .select(
                        "bucket",
                        self.key,
                        self.seq_col,
                        F.lit("u").alias(self.op_col),
                        *self.payload_cols,
                    )
                )
                merged = self._latest_per_key(delta.unionByName(cur))
            # a winning delete erases the key: absence in the rewritten
            # bucket IS the tombstone (single-writer ordered batches)
            merged = merged.filter(F.col(self.op_col) != "d").drop(self.op_col)
            vdir = os.path.join(self.path, "data", f"version={batch_id}")
            merged.write.mode("overwrite").partitionBy("bucket").parquet(vdir)
        finally:
            delta.unpersist()
        # a hot bucket whose merged content is ENTIRELY deletions wrote
        # no bucket dir — it must leave the manifest (the empty bucket),
        # not dangle a path. Survivors come from the write's own output
        # layout (at cluster scale: the commit's file listing), so the
        # merged frame is never computed twice.
        wrote = {
            d.split("=", 1)[1]
            for d in os.listdir(vdir)
            if d.startswith("bucket=")
        }
        new_manifest = dict(manifest)
        for b in hot:
            if str(b) in wrote:
                new_manifest[str(b)] = os.path.join(vdir, f"bucket={b}")
            else:
                new_manifest.pop(str(b), None)
        self._commit(new_manifest, batch_id)

    def sink(self):
        """foreachBatch function maintaining this table."""
        return lambda batch_df, batch_id: self.apply_batch(batch_df, batch_id)

    def compact(self, spark: SparkSession, batch_id: int) -> None:
        """Fold the committed snapshot into one version dir (the
        mat_view compaction contract: same commit protocol, readers
        never see a half-compacted table, idempotent per batch id)."""
        committed = self.committed_batch()
        if committed is not None and batch_id <= committed:
            return
        manifest = self._current_manifest()
        if not manifest:
            return
        saved = self._schema_at(None)
        cols = (
            [f.name for f in saved.fields]
            if saved is not None
            else [self.key, self.seq_col, *self.payload_cols]
        )
        cur = self._read_manifest_paths(spark, manifest, saved).select(
            "bucket", *cols
        )
        vdir = os.path.join(self.path, "data", f"version={batch_id}")
        cur.write.mode("overwrite").partitionBy("bucket").parquet(vdir)
        new_manifest = {b: os.path.join(vdir, f"bucket={b}") for b in manifest}
        self._commit(new_manifest, batch_id)

    def read(self, spark: SparkSession, at_batch: int | None = None) -> DataFrame:
        """Live snapshot: one row per non-deleted key. ``at_batch=N``
        time-travels to the snapshot as of the latest commit ≤ N
        (ManifestTable history; priced like a current read). The
        column set follows the SCHEMA VERSION as of the same batch:
        a snapshot from before an additive evolution reads with its
        own (narrower) columns; post-evolution snapshots NULL-fill the
        new columns in any still-referenced pre-evolution bucket
        files."""
        manifest = self._resolve_manifest(at_batch)
        saved = self._schema_at(at_batch)
        if not manifest:
            if saved is not None:
                return spark.createDataFrame([], saved)
            t = self.col_types
            fields = ", ".join(
                [f"`{self.key}` {t.get(self.key, 'BIGINT')}",
                 f"`{self.seq_col}` {t.get(self.seq_col, 'BIGINT')}"]
                + [f"`{c}` {t.get(c, 'STRING')}" for c in self.payload_cols]
            )
            return spark.createDataFrame([], fields)
        cols = (
            [f.name for f in saved.fields]
            if saved is not None
            else [self.key, self.seq_col, *self.payload_cols]
        )
        return self._read_manifest_paths(spark, manifest, saved).select(*cols)
