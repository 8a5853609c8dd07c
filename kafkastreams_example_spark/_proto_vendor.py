"""Offline activation of a vendored protobuf runtime (round 17).

The transformWithStateInPandas (TWS) Python worker speaks a
proto-encoded state-server protocol, so every TWS tier has been
env-gated for nine rounds: this container has no ``google.protobuf``
and no package-index network (``pip install`` / ``pip download`` both
fail on DNS — re-verified rounds 9, 10, 14). The round-16 verdict
(item 6) asked for ONE escalation attempt at a vendored/offline
install; this module is that attempt, made standing.

What was found: the box's google-cloud-sdk vendors a complete
protobuf **runtime 6.32.0-dev** under
``/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf``.
PySpark 4.1.2's pre-generated ``StateMessage_pb2.py`` pins **gencode
6.33.0**, and protobuf's runtime-version validator rejects a runtime
older than the gencode — but protobuf itself ships an official
escape hatch for exactly this window
(``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``,
runtime_version.py). The 6.32/6.33 gap is one minor version on a
stable message schema; correctness is NOT assumed from the override —
the TWS end-to-end tests (tests/test_streaming.py) execute the real
worker protocol and pin output semantics against the
applyInPandasWithState tier, so the evidence bar is behavioral, not
"it imported".

Activation must happen BEFORE the Spark JVM starts: local-mode Python
workers inherit the driver's environment at JVM launch, so both
``PYTHONPATH`` (the vendored package dir) and the version-check
override are exported here. ``session.get_spark`` calls this first;
``tws_available`` calls it for JVM-less probes. A real
``google.protobuf`` install always wins — the vendor path is only
added when the import fails.

Deploy note: on a real cluster none of this fires — install protobuf
(>= the pyspark gencode version) into the worker environment and the
probe short-circuits to (True, "system").
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"

_result: tuple[bool, str] | None = None


def activate_vendored_protobuf() -> tuple[bool, str]:
    """Make ``google.protobuf`` importable, preferring a real install.

    Returns (available, how). Idempotent; the first call's result is
    cached (sys.path/env mutations must not stack)."""
    global _result
    if _result is not None:
        return _result
    try:
        import google.protobuf  # noqa: F401

        _result = (True, "system protobuf")
        return _result
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        _result = (False, "no protobuf: not installed and no vendored copy")
        return _result
    # export BEFORE any JVM exists so local-mode Python workers
    # inherit both; sys.path for this (driver) interpreter. The
    # vendor dir is APPENDED on both (post-close review): it must
    # never shadow other PYTHONPATH entries (the appengine dir ships
    # a whole `google` package plus top-level modules). Honest limit:
    # PYTHONPATH entries still precede a worker interpreter's OWN
    # site-packages, so on a deployment whose workers use a DIFFERENT
    # python env that has real protobuf while the driver's does not,
    # workers would see the vendored copy — the "real install wins"
    # probe is driver-side. That split-env shape does not exist here
    # (local mode, one env); on a real cluster install protobuf in
    # both envs and none of this fires.
    prev_check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
    prev_pypath = os.environ.get("PYTHONPATH")
    os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    py_path = prev_pypath or ""
    if VENDOR_DIR not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            (py_path + os.pathsep if py_path else "") + VENDOR_DIR
        )
    added_sys_path = VENDOR_DIR not in sys.path
    if added_sys_path:
        sys.path.append(VENDOR_DIR)
    try:
        import google.protobuf as pb

        # the real gate: pyspark's pinned-gencode module must load
        # under the override (it is what the TWS worker imports)
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        # Honest limit of the success path (round-18 advice): the
        # override env var stays set process- and worker-wide for the
        # session, so protobuf's gencode/runtime validator is disabled
        # for EVERY consumer in this process, not just pyspark's
        # StateMessage — an unrelated future gencode mismatch would be
        # waved through instead of raising. Acceptable only because
        # this box has exactly one protobuf consumer (the TWS worker)
        # and the vendored runtime is the only runtime; on any real
        # deployment the probe returns "system protobuf" above and no
        # override is ever set.
        _result = (
            True,
            f"vendored protobuf {pb.__version__} from {VENDOR_DIR} "
            "(gencode version check overridden PROCESS-WIDE for this "
            "session; TWS e2e tests carry the correctness evidence)",
        )
    except Exception as exc:  # noqa: BLE001 — degrade to env-gated,
        # UNDOING the env/sys.path mutations: leaving the version
        # check disabled and a broken vendor dir on PYTHONPATH would
        # leak into every later subprocess and wave through a
        # legitimate gencode mismatch elsewhere (post-close review)
        if prev_check is None:
            os.environ.pop(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None
            )
        else:
            os.environ[
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
            ] = prev_check
        if prev_pypath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pypath
        if added_sys_path and VENDOR_DIR in sys.path:
            sys.path.remove(VENDOR_DIR)
        # purge partially-imported vendored modules (round-18 advice):
        # a failed `import google.protobuf` can still leave `google`,
        # `google.protobuf`, and submodules cached in sys.modules,
        # resolved against the now-removed vendor path — a later REAL
        # protobuf install in this process would silently keep hitting
        # the broken vendored halves. Only purge when the vendor dir
        # was the source (a real install above returned early).
        # prefix match with a trailing separator (round-19 advice): a
        # bare startswith(VENDOR_DIR) would also purge modules loaded
        # from a SIBLING directory sharing the prefix (e.g.
        # .../google_appengine_extras)
        vendor_prefix = VENDOR_DIR.rstrip(os.sep) + os.sep
        for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            m_obj = sys.modules[mod]
            f = getattr(m_obj, "__file__", None) or ""
            paths = list(getattr(m_obj, "__path__", []) or [])
            if f.startswith(vendor_prefix) or (
                not f and any(p.startswith(vendor_prefix) for p in paths)
            ):
                del sys.modules[mod]
        _result = (False, f"vendored protobuf unusable: {exc}")
    return _result
