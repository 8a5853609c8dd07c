"""Shared idle-timeout plumbing for the stateful kernels.

Six applyInPandasWithState functions across three modules
(dedup_refresh's per-key and coalesced tiers, the four rolling
stats/corr tiers) implement the SAME processing-time idle-eviction
contract: a fired timer drops the key's state wholesale and emits
nothing; a touched key re-arms the timer after its state update. The
two halves live here once so the tiers' eviction semantics are
provably identical — a fix lands in one place instead of six
(round-15 review finding).

``timeout_ms=None`` disables both halves (the NoTimeout tiers)."""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState

__all__ = ["expired", "arm"]


def expired(state: GroupState, timeout_ms: int | None) -> bool:
    """Prologue: True when this invocation is a fired idle timer — the
    key's state has been dropped and the caller must yield nothing."""
    if timeout_ms is not None and state.hasTimedOut:
        state.remove()
        return True
    return False


def arm(state: GroupState, timeout_ms: int | None) -> None:
    """Epilogue (call after ``state.update``): re-base the idle timer
    on this batch's processing time."""
    if timeout_ms is not None:
        state.setTimeoutDuration(timeout_ms)


def rearm_tws(handle, tmr_state, timer_values, timeout_ms) -> None:
    """TWS epilogue (the transformWithState analogue of ``arm``): TWS
    timers are one-shot and ADDITIVE, so re-arming must delete the
    previously registered timer first — delete-then-register keeps
    exactly one live timer per key; without it the FIRST batch's timer
    fires one idle period after first activity even while the key
    stays hot. ``tmr_state`` is the value state holding the last
    registered expiry; ``timeout_ms=None`` disables."""
    if timeout_ms is None:
        return
    prev = tmr_state.get()
    if prev is not None:
        handle.deleteTimer(int(prev[0]))
    expiry = timer_values.getCurrentProcessingTimeInMs() + timeout_ms
    handle.registerTimer(expiry)
    tmr_state.update((expiry,))


def forget_tws(*states) -> None:
    """TWS expiry prologue: clear every state handle of the idle key —
    delete-then-register guarantees the timer only fires after a full
    idle period, so forgetting wholesale matches ``expired``'s
    ``state.remove()`` on the applyInPandasWithState side."""
    for s in states:
        s.clear()
