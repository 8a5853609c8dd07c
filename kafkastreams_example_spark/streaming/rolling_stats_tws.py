"""transformWithState tier of the streaming rolling-stats face.

Spark 4's transformWithStateInPandas is the designated successor to
applyInPandasWithState for custom stateful operators (SPARK-49564 /
"Arbitrary Stateful Processing v2"): typed state handles, event- and
processing-time timers, state schema evolution, and the state data
source for offline inspection. The semantics implemented here are
IDENTICAL to streaming/rolling_stats.py's plain tier — both delegate
to ``rolling_stats.stats_kernel``, the state-backend-agnostic
per-(entity, batch) kernel (merge → one searchsorted pair → prefix
sums + shared RMQ), the same shared-core split dedup_refresh /
dedup_refresh_tws use for probe_and_remember.

Availability: the Python StatefulProcessor worker path requires
protobuf (state-server messages are proto-encoded), absent in this
sandbox with no package-index access (re-verified at round-15 open).
The module therefore degrades exactly like dedup_refresh_tws:
``tws_available()`` (re-exported from there — one probe, one answer)
reports (usable, reason); ``rolling_stats_stream_tws`` raises a clear
RuntimeError when the runtime can't execute it and callers fall back
to rolling_stats.rolling_stats_stream, which is Arrow-only and runs
everywhere. The processor's batch/timer protocol is plain Python over
the shared kernel and is unit-tested with mock handles without Spark
(tests/test_streaming.py); an end-to-end streaming test activates
when protobuf appears (same env gate as the TWS dedup tier).

Idle-key eviction mirrors the applyInPandasWithState tier's
``evict_after_ms`` via TWS timers, which are ONE-SHOT and ADDITIVE —
so each batch deletes the previously registered timer before arming
the next (the delete-then-register discipline the TWS dedup processor
established; without it the FIRST batch's timer fires one idle period
after first activity even while the key stays hot, wrongly resetting
a live timeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ._evict import forget_tws, rearm_tws
from .dedup_refresh_tws import ensure_tws_state_provider, tws_available
from .rolling_stats import (
    DEFAULT_WINDOW_US,
    corrected_stats_kernel,
    stats_kernel,
)

__all__ = [
    "tws_available",
    "make_rolling_stats_processor",
    "make_rolling_stats_corrected_processor",
    "rolling_stats_stream_tws",
]


def make_rolling_stats_processor(
    window_us: int,
    id_col: str = "row_id",
    evict_after_ms: int | None = None,
):
    """Build the StatefulProcessor for the plain rolling-stats tier.

    Mirrors make_rolling_stats_fn 1:1: value state = the retention-
    pruned (ts, vs) timeline arrays; optional processing-time timer
    for idle-key eviction (delete-then-register, exactly one live
    timer per key); per-batch work delegated to stats_kernel. Requires
    only the StatefulProcessor API to BUILD (protobuf is an execution
    dependency, checked by rolling_stats_stream_tws at wiring time) so
    the protocol is unit-testable with mock handles everywhere."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); use "
            "rolling_stats.rolling_stats_stream (applyInPandasWithState) "
            "instead"
        ) from exc

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RollingStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tl = handle.getValueState(
                "tl", "ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>"
            )
            # last registered eviction expiry (TWS timers are one-shot
            # and additive — see module docstring)
            self._tmr = handle.getValueState("tmr", "expiry BIGINT")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            chunks = list(rows)
            batch = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            got = self._tl.get()
            st_, sv = (got[0], got[1]) if got is not None else ((), ())
            out, kt, kv = stats_kernel(st_, sv, batch, id_col, window_us)
            # .tolist() (not list()) so state holds Python ints/floats,
            # never numpy scalars — matches the applyInPandasWithState
            # tier's state.update((kt.tolist(), kv.tolist())).
            self._tl.update((kt.tolist(), kv.tolist()))
            rearm_tws(self._handle, self._tmr, timerValues, evict_after_ms)
            yield out

        # param names MUST be the API's camelCase: the TWS runtime
        # invokes handleExpiredTimer with KEYWORD arguments
        # (timerValues=..., expiredTimerInfo=...) — snake_case
        # params raise TypeError at the first real timer firing
        # (caught by the round-17 eviction e2e; mock tests call
        # positionally and never saw it)
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # delete-then-register guarantees this fires only for a key
            # idle a full eviction period — timeline forgotten, nothing
            # emitted (same contract as _evict.expired on the
            # applyInPandasWithState tier)
            forget_tws(self._tl, self._tmr)
            return
            yield  # unreachable — keeps this a generator yielding nothing

        def close(self) -> None:
            pass

    return RollingStatsProcessor()


def make_rolling_stats_corrected_processor(
    window_us: int,
    id_col: str = "row_id",
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
):
    """StatefulProcessor for the CORRECTED-emission stats tier over
    the shared corrected_stats_kernel — 5-field value state (ts, vs,
    ids, seq, floor), the exact state tuple the
    applyInPandasWithState tier keeps, so semantics (affected-set
    probe, prune-floor suppression, 2W retention, per-key rev) are
    the round-14 contract verbatim. Timer discipline as in the plain
    processor."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); use "
            "rolling_stats.rolling_stats_stream (applyInPandasWithState) "
            "instead"
        ) from exc

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RollingStatsCorrectedProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tl = handle.getValueState(
                "tl",
                "ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>, ids ARRAY<BIGINT>, "
                "seq BIGINT, floor BIGINT",
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
            st5 = self._tl.get()
            out, new_state = corrected_stats_kernel(
                st5, batch, id_col, window_us, retention_windows
            )
            self._tl.update(new_state)
            rearm_tws(self._handle, self._tmr, timerValues, evict_after_ms)
            yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            forget_tws(self._tl, self._tmr)
            return
            yield  # unreachable — keeps this a generator yielding nothing

        def close(self) -> None:
            pass

    return RollingStatsCorrectedProcessor()


def rolling_stats_stream_tws(
    events: DataFrame,
    entity_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "event_time",
    value_col: str = "value",
    id_col: str = "row_id",
    window_us: int = DEFAULT_WINDOW_US,
    emit_corrections: bool = False,
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
) -> DataFrame:
    """transformWithStateInPandas wiring of the rolling-stats face —
    same contract as rolling_stats.rolling_stats_stream (NULL value /
    NULL event-time rows dead-lettered; output per surviving row:
    id_col, ts_ms, n_frame, sum_v, mean_v, min_v, max_v;
    ``emit_corrections=True`` adds the per-key ``rev`` and requires an
    integral id column). Raises RuntimeError with the blocking reason
    when the runtime can't execute TWS — callers catch and fall back
    to the applyInPandasWithState tier. Session side effect:
    permanently flips the session's stateStore providerClass to
    RocksDB (see dedup_refresh_tws.ensure_tws_state_provider)."""
    from pyspark.sql import functions as F

    ok, reason = tws_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {reason}; use "
            "rolling_stats.rolling_stats_stream (applyInPandasWithState) "
            "instead"
        )
    ensure_tws_state_provider(events.sparkSession)
    keyed = events.select(
        *entity_cols,
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull() & F.col("t_us").isNotNull())
    id_ddl = dict(keyed.dtypes)[id_col]
    time_mode = "processingTime" if evict_after_ms is not None else "none"
    if not emit_corrections:
        return keyed.groupBy(*entity_cols).transformWithStateInPandas(
            statefulProcessor=make_rolling_stats_processor(
                window_us, id_col, evict_after_ms
            ),
            outputStructType=(
                f"`{id_col}` {id_ddl}, ts_ms BIGINT, n_frame BIGINT, "
                "sum_v DOUBLE, mean_v DOUBLE, min_v DOUBLE, max_v DOUBLE"
            ),
            outputMode="append",
            timeMode=time_mode,
        )
    if id_ddl not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"emit_corrections requires an integral id column, got "
            f"{id_col}: {id_ddl}"
        )
    return keyed.groupBy(*entity_cols).transformWithStateInPandas(
        statefulProcessor=make_rolling_stats_corrected_processor(
            window_us, id_col, retention_windows, evict_after_ms
        ),
        outputStructType=(
            f"`{id_col}` BIGINT, ts_ms BIGINT, n_frame BIGINT, "
            "sum_v DOUBLE, mean_v DOUBLE, min_v DOUBLE, max_v DOUBLE, "
            "rev BIGINT"
        ),
        outputMode="append",
        timeMode=time_mode,
    )
