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
