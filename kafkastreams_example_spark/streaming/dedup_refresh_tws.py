"""transformWithState tier of the reference-parity refresh dedup.

Spark 4's transformWithStateInPandas is the designated successor to
applyInPandasWithState for custom stateful operators (SPARK-49564 /
the "Arbitrary Stateful Processing v2" API): typed state handles
(value/list/map), event-time AND processing-time timers, schema
evolution, and the state data source for offline inspection. The
semantics implemented here are identical to dedup_refresh.py —
both delegate to probe_and_remember(), the state-backend-agnostic core
re-derived from the reference DeduplicationTransformer
(KStreamDistinct.java:42-112).

Availability: the Python StatefulProcessor worker path requires
protobuf (state-server messages are proto-encoded). This sandbox ships
no pip-installed protobuf and has no package-index network access
(pip install AND pip download both fail on DNS — re-verified rounds 9
and 10); since round 17 the probe escalates to the protobuf runtime
VENDORED inside the box's google-cloud-sdk (_proto_vendor.py — one
minor version behind pyspark's gencode, bridged via protobuf's
official TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK hatch), which
lets the TWS tiers EXECUTE here and the e2e tests carry real
behavioral evidence. Where neither source exists the module degrades
to a guarded factory: ``tws_available()`` reports (usable, reason)
and ``dedup_refresh_stream_tws`` raises a clear RuntimeError —
callers fall back to dedup_refresh.dedup_refresh_stream, which is
Arrow-only and runs everywhere. The processor logic itself is plain
Python over the shared core and is also unit-tested without Spark
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ._evict import forget_tws, rearm_tws
from .dedup_refresh import (
    DEFAULT_WINDOW_MS,
    coalesced_kernel,
    probe_and_remember,
)


def tws_available() -> tuple[bool, str]:
    """Can transformWithStateInPandas execute in this runtime?

    Requires (a) the PySpark 4.x StatefulProcessor API and (b)
    protobuf, which the Python state-server protocol is encoded with.
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False, "pyspark.sql.streaming.stateful_processor not present (<4.0)"
    # system protobuf, else the vendored google-cloud-sdk runtime
    # (round-17 escalation — see _proto_vendor.py; the activation also
    # runs in session.get_spark BEFORE the JVM starts, which is what
    # actually lets the WORKERS see it)
    from .._proto_vendor import activate_vendored_protobuf

    ok, how = activate_vendored_protobuf()
    if not ok:
        return False, how
    return True, how


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def ensure_tws_state_provider(spark) -> None:
    """TWS state (one column family per state variable + timers)
    requires a provider with column-family support; the HDFS-backed
    provider throws STATE_STORE_MULTIPLE_COLUMN_FAMILIES at the first
    micro-batch. session.get_spark already defaults to RocksDB, but a
    session tuned for tiny-state tests (tests/conftest.py pins the
    HDFS provider to skip per-batch RocksDB spin-up) would fail every
    TWS query — so each TWS wiring point switches the SESSION conf to
    RocksDB before starting. Per-query: the provider is captured from
    the session conf at query START, so already-running queries keep
    the provider they started with. The flip is PERMANENT for the
    session (round-18 advice: the provider can't be set per-query via
    conf): any LATER stateful query started on the same session also
    gets RocksDB, even if the caller had deliberately pinned another
    provider — the flip is logged here and called out in every public
    *_tws wiring docstring; restore the conf key yourself after query
    start if the old provider matters (tests/test_streaming.py's
    autouse fixture does exactly that)."""
    import logging

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    if prev != _ROCKSDB_PROVIDER:
        spark.conf.set(key, _ROCKSDB_PROVIDER)
        logging.getLogger(__name__).info(
            "TWS wiring flipped %s from %r to RocksDB for the whole "
            "session (later stateful queries inherit it)",
            key,
            prev or "<unset>",
        )


def make_refresh_dedup_processor(
    window_ms: int = DEFAULT_WINDOW_MS,
    evict: bool = False,
    out_cols: tuple[str, ...] = ("row_id", "ts_ms"),
    clock: str = "event",
):
    """Build the StatefulProcessor class for the refresh dedup.

    Mirrors make_refresh_dedup_fn 1:1: list-state of remembered
    timestamps per key, processing-time timer for idle-key eviction
    (the reference's store retention, KStreamDistinct.java:135-141),
    batch rows processed in event-time order with payload-column
    tie-break. Constructed lazily so importing this module never
    touches the TWS API on runtimes that lack it.

    Building the processor requires only the StatefulProcessor API
    (PySpark ≥ 4) — protobuf is an EXECUTION dependency of the TWS
    Python worker, checked by dedup_refresh_stream_tws at wiring time.
    The split lets the processor's batch/timer protocol be unit-tested
    with mock handles on runtimes that can't execute TWS
    (tests/test_streaming.py::test_tws_processor_timer_protocol).
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); "
            "use dedup_refresh.dedup_refresh_stream (applyInPandasWithState) instead"
        ) from exc
    if clock not in ("event", "stream"):
        raise ValueError(f"clock must be 'event' or 'stream', got {clock!r}")

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    tiebreak = [c for c in out_cols if c != "ts_ms"]

    class RefreshDedupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen ARRAY<BIGINT>")
            # last registered eviction expiry: TWS timers are one-shot
            # and ADDITIVE (registerTimer never replaces), so the prior
            # timer must be deleted explicitly or every batch leaves a
            # live timer behind and the earliest one fires one window
            # after FIRST activity even while the key stays hot —
            # re-emitting previously suppressed duplicates
            self._tmr = handle.getValueState("tmr", "expiry BIGINT")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            chunks = list(rows)
            batch = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            )
            # same numpy lexsort fast path (with the object-dtype
            # pandas fallback for NULL-able string payloads) as the
            # applyInPandasWithState tier (dedup_refresh)
            cols = {c: batch[c].to_numpy() for c in out_cols}
            ts = cols["ts_ms"] = cols["ts_ms"].astype("int64", copy=False)
            if any(cols[c].dtype == object for c in tiebreak):
                batch = batch.sort_values(["ts_ms", *tiebreak], kind="mergesort")
                cols = {c: batch[c].to_numpy() for c in out_cols}
                ts = cols["ts_ms"] = cols["ts_ms"].astype("int64", copy=False)
                order = np.arange(len(batch))
            else:
                order = np.lexsort(tuple(cols[c] for c in reversed(tiebreak)) + (ts,))
            got = self._seen.get()
            seen = [int(s) for s in got[0]] if got is not None else []
            keep, seen = probe_and_remember(seen, ts[order], window_ms, clock)
            self._seen.update((list(seen),))
            # idle-key eviction TTL (KStreamDistinct.java:135-141) —
            # delete-then-register via the shared helper
            rearm_tws(self._handle, self._tmr, timerValues,
                      window_ms if evict else None)
            emit = order[np.asarray(keep, dtype=bool)]
            yield pd.DataFrame({c: cols[c][emit] for c in out_cols})

        # param names MUST be the API's camelCase: the TWS runtime
        # invokes handleExpiredTimer with KEYWORD arguments
        # (timerValues=..., expiredTimerInfo=...) — snake_case
        # params raise TypeError at the first real timer firing
        # (caught by the round-17 eviction e2e; mock tests call
        # positionally and never saw it)
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # delete-then-register above guarantees this only fires for
            # a key idle a full window — forget it entirely. An eviction
            # emits no rows (the previous empty all-object-dtype frame
            # could fail Arrow conversion against the BIGINT schema).
            forget_tws(self._seen, self._tmr)
            return
            yield  # unreachable — keeps this a generator yielding nothing

        def close(self) -> None:
            pass

    return RefreshDedupProcessor()


def dedup_refresh_stream_tws(
    decoded: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    id_col: str = "dedup_id",
    ts_col: str = "event_time",
    payload_cols: tuple[str, ...] = ("row_id",),
    evict_state: bool = False,
    clock: str = "event",
) -> DataFrame:
    """transformWithStateInPandas wiring of the refresh dedup — same
    contract as dedup_refresh.dedup_refresh_stream (null ids bypass via
    split-union, survivors keyed by dedup id, (payload..., ts_ms) out).

    Raises RuntimeError with the blocking reason when the runtime can't
    execute TWS (no protobuf / PySpark < 4) — callers catch and fall
    back to the applyInPandasWithState tier.

    Session side effect: flips the session's stateStore providerClass
    to RocksDB permanently (TWS needs column families; the conf can't
    be set per-query) — later stateful queries on this session inherit
    RocksDB; see ensure_tws_state_provider.
    """
    from pyspark.sql import functions as F

    ok, reason = tws_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {reason}; "
            "use dedup_refresh.dedup_refresh_stream (applyInPandasWithState) instead"
        )
    ensure_tws_state_provider(decoded.sparkSession)
    processor = make_refresh_dedup_processor(
        window_ms,
        evict=evict_state,
        out_cols=tuple(payload_cols) + ("ts_ms",),
        clock=clock,
    )
    keyed = decoded.select(
        F.col(id_col).alias("dedup_id"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        *[F.col(c) for c in payload_cols],
    )
    out_cols = tuple(payload_cols) + ("ts_ms",)
    dtypes = dict(keyed.dtypes)
    out_ddl = ", ".join(f"`{c}` {dtypes[c]}" for c in out_cols)
    nonnull = keyed.filter(F.col("dedup_id").isNotNull() & F.col("ts_ms").isNotNull())
    survivors = nonnull.groupBy("dedup_id").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=out_ddl,
        outputMode="append",
        timeMode="processingTime" if evict_state else "none",
    )
    null_rows = keyed.filter(F.col("dedup_id").isNull()).select(*out_cols)
    return survivors.unionByName(null_rows)


def make_coalesced_refresh_processor(
    window_ms: int = DEFAULT_WINDOW_MS,
    out_cols: tuple[str, ...] = ("dedup_id", "row_id", "ts_ms"),
    clock: str = "event",
    id_ddl: str = "STRING",
    evict: bool = False,
):
    """StatefulProcessor for the key-COALESCED dedup tier over the
    shared coalesced_kernel (the CSR pack state: ids/offsets/flat ts)
    — completing the both-APIs symmetry for the last stateful op in
    the package. Pack-granularity eviction maps to one TWS timer per
    pack under the delete-then-register discipline; ``id_ddl`` names
    the dedup-id element type for the state schema (the
    applyInPandasWithState tier derives it the same way)."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); use "
            "dedup_refresh.dedup_refresh_stream_coalesced "
            "(applyInPandasWithState) instead"
        ) from exc
    if clock not in ("event", "stream"):
        raise ValueError(f"clock must be 'event' or 'stream', got {clock!r}")

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CoalescedRefreshProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._csr = handle.getValueState(
                "csr",
                f"ids ARRAY<{id_ddl}>, offsets ARRAY<INT>, ts ARRAY<BIGINT>,"
                " last_seen ARRAY<BIGINT>",
            )
            self._tmr = handle.getValueState("tmr", "expiry BIGINT")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            chunks = list(rows)
            batch = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            st4 = self._csr.get()
            # the handle's processing-time clock keeps the lazy per-id
            # TTL sweep (round 16, see coalesced_kernel) on the same
            # clock the pack timer fires on
            out, new_state = coalesced_kernel(
                st4, batch, out_cols, window_ms, clock,
                now_ms=timerValues.getCurrentProcessingTimeInMs(),
                ttl_ms=window_ms if evict else None,
            )
            self._csr.update(new_state)
            rearm_tws(self._handle, self._tmr, timerValues,
                      window_ms if evict else None)
            yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # every id in the pack idle a full retention window
            forget_tws(self._csr, self._tmr)
            return
            yield  # unreachable — keeps this a generator yielding nothing

        def close(self) -> None:
            pass

    return CoalescedRefreshProcessor()


def dedup_refresh_stream_coalesced_tws(
    decoded: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    id_col: str = "dedup_id",
    ts_col: str = "event_time",
    payload_cols: tuple[str, ...] = ("row_id",),
    clock: str = "event",
    n_state_keys: int = 256,
    evict_state: bool = False,
) -> DataFrame:
    """transformWithStateInPandas wiring of the coalesced dedup tier —
    same contract as dedup_refresh.dedup_refresh_stream_coalesced
    (ids packed xxhash64 % n_state_keys per state key, null ids
    bypass). Raises RuntimeError with the blocking reason when the
    runtime can't execute TWS. Session side effect: permanently flips
    the session's stateStore providerClass to RocksDB (see
    ensure_tws_state_provider)."""
    from pyspark.sql import functions as F

    ok, reason = tws_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {reason}; use "
            "dedup_refresh.dedup_refresh_stream_coalesced "
            "(applyInPandasWithState) instead"
        )
    ensure_tws_state_provider(decoded.sparkSession)
    keyed = decoded.select(
        F.col(id_col).alias("dedup_id"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        *[F.col(c) for c in payload_cols],
    )
    out_cols = tuple(payload_cols) + ("ts_ms",)
    dtypes = dict(keyed.dtypes)
    out_ddl = ", ".join(f"`{c}` {dtypes[c]}" for c in out_cols)
    id_ddl = dtypes["dedup_id"]
    nonnull = keyed.filter(
        F.col("dedup_id").isNotNull() & F.col("ts_ms").isNotNull()
    ).withColumn(
        "skey", F.pmod(F.xxhash64("dedup_id"), F.lit(n_state_keys)).cast("int")
    )
    survivors = nonnull.groupBy("skey").transformWithStateInPandas(
        statefulProcessor=make_coalesced_refresh_processor(
            window_ms,
            ("dedup_id",) + out_cols,
            clock,
            id_ddl=id_ddl,
            evict=evict_state,
        ),
        outputStructType=f"`dedup_id` {id_ddl}, {out_ddl}",
        outputMode="append",
        timeMode="processingTime" if evict_state else "none",
    ).select(*out_cols)
    null_rows = keyed.filter(F.col("dedup_id").isNull()).select(*out_cols)
    return survivors.unionByName(null_rows)
