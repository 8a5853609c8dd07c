"""transformWithState tier of the streaming rolling-CORR face —
completing the TWS symmetry: both rolling faces (stats + corr) now
run under either stateful API with the SAME kernel behind each
(rolling_corr.corr_kernel here; see rolling_stats_tws.py for the
rationale, availability gating, and the delete-then-register timer
discipline — everything written there holds verbatim for this module,
including the protobuf execution gate and the mock-handle test
strategy).

Because both plain tiers keep byte-identical state DDL under the same
grouping (the pinned checkpoint-share contract), the TWS faces do
too: `tl` is (ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>) in both processors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ._evict import forget_tws, rearm_tws
from .dedup_refresh_tws import ensure_tws_state_provider, tws_available
from .rolling_corr import (
    DEFAULT_WINDOW_US,
    corr_kernel,
    corrected_corr_kernel,
)

__all__ = [
    "tws_available",
    "make_rolling_corr_processor",
    "make_rolling_corr_corrected_processor",
    "rolling_corr_stream_tws",
]


def make_rolling_corr_processor(
    window_us: int,
    id_col: str = "row_id",
    evict_after_ms: int | None = None,
):
    """Build the StatefulProcessor for the plain rolling-corr tier —
    mirrors rolling_stats_tws.make_rolling_stats_processor with
    corr_kernel as the math; see that factory's docstring for the
    build-vs-execute dependency split."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); use "
            "rolling_corr.rolling_corr_stream (applyInPandasWithState) "
            "instead"
        ) from exc

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RollingCorrProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tl = handle.getValueState(
                "tl", "ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>"
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
            got = self._tl.get()
            st_, sv = (got[0], got[1]) if got is not None else ((), ())
            out, kt, kv = corr_kernel(st_, sv, batch, id_col, window_us)
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
            forget_tws(self._tl, self._tmr)
            return
            yield  # unreachable — keeps this a generator yielding nothing

        def close(self) -> None:
            pass

    return RollingCorrProcessor()


def make_rolling_corr_corrected_processor(
    window_us: int,
    id_col: str = "row_id",
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
):
    """StatefulProcessor for the CORRECTED-emission corr tier over the
    shared corrected_corr_kernel — the corr analogue of
    rolling_stats_tws.make_rolling_stats_corrected_processor (same
    5-field state tuple, same timer discipline, defined-corr
    filtering inside the kernel)."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        raise RuntimeError(
            f"StatefulProcessor API unavailable ({exc}); use "
            "rolling_corr.rolling_corr_stream (applyInPandasWithState) "
            "instead"
        ) from exc

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RollingCorrCorrectedProcessor(StatefulProcessor):
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
            out, new_state = corrected_corr_kernel(
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

    return RollingCorrCorrectedProcessor()


def rolling_corr_stream_tws(
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
    """transformWithStateInPandas wiring of the rolling-corr face —
    same contract as rolling_corr.rolling_corr_stream (defined-corr
    emission, NULL rows dead-lettered; ``emit_corrections=True`` adds
    the per-key ``rev``, integral id required). Raises RuntimeError
    with the blocking reason when the runtime can't execute TWS.
    Session side effect: permanently flips the session's stateStore
    providerClass to RocksDB (see
    dedup_refresh_tws.ensure_tws_state_provider)."""
    from pyspark.sql import functions as F

    ok, reason = tws_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {reason}; use "
            "rolling_corr.rolling_corr_stream (applyInPandasWithState) "
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
            statefulProcessor=make_rolling_corr_processor(
                window_us, id_col, evict_after_ms
            ),
            outputStructType=(
                f"`{id_col}` {id_ddl}, ts_ms BIGINT, n_frame BIGINT, "
                "corr DOUBLE"
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
        statefulProcessor=make_rolling_corr_corrected_processor(
            window_us, id_col, retention_windows, evict_after_ms
        ),
        outputStructType=(
            f"`{id_col}` BIGINT, ts_ms BIGINT, n_frame BIGINT, "
            "corr DOUBLE, rev BIGINT"
        ),
        outputMode="append",
        timeMode=time_mode,
    )
