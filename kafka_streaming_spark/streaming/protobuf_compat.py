"""Locate a usable ``google.protobuf`` runtime for transformWithState.

The Spark 4.x ``transformWithStateInPandas`` path needs protobuf twice:

- **driver side** — ``pyspark.sql.streaming.stateful_processor`` imports
  the generated ``StateMessage_pb2`` module;
- **worker side** — the state-server Python process imports the same
  module at startup, before any user code runs.

This container has no ``protobuf`` pip package and no network route to
install one (DELTA.md probe history), but the public Google Cloud SDK at
``/usr/lib/google-cloud-sdk`` ships the pure-Python protobuf runtime
(6.32.0) inside its app-engine platform directory.  That runtime is one
minor version OLDER than the gencode pyspark ships (6.33.0), which the
generated module's ``ValidateProtobufRuntimeVersion`` rejects outright;
the wire format and generated-code builder API are stable across a
same-major one-minor gap, so both halves relax exactly that case and
nothing else:

- :func:`ensure_protobuf` fixes the **driver**: put the SDK path on
  ``sys.path`` (only when ``google.protobuf`` is not importable already)
  and install the lenient validator.
- :func:`ensure_tws_worker_env` fixes the **workers**: it injects
  ``PYTHONPATH = <shim dir> + <sdk dir>`` into
  ``SparkContext.environment`` (persistently — the entry must survive
  until the stream starts and launches the worker).  The shim
  directory's ``sitecustomize.py`` (auto-imported by Python's ``site``
  machinery in each worker) applies the same lenient validator before
  pyspark's worker module can import ``StateMessage_pb2``.

No file outside ``/root/repo`` is touched; with a real ``protobuf``
install present both helpers become no-ops (``ensure_protobuf`` returns
``"system"`` and the validator is left strict).
"""

from __future__ import annotations

import os
import sys

#: Pure-Python protobuf runtime shipped with the (public) Google Cloud
#: SDK.  Probed, never assumed: every entry point checks isdir first.
GCLOUD_PROTOBUF_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"

#: Directory whose sitecustomize.py applies the lenient version check in
#: worker processes (see that file's docstring).
SHIM_DIR = os.path.join(os.path.dirname(__file__), "_pb_shim")


def _install_lenient_validator() -> None:
    """Relax ``ValidateProtobufRuntimeVersion`` to tolerate gencode one
    minor NEWER than the runtime (same major) — but ONLY for Spark's own
    generated modules (the validator receives the gencode's source
    location, ``org/apache/spark/.../StateMessage.proto`` for the TWS
    state server; scoping on it beats a restore-after-import dance: any
    OTHER gencode imported later in the session still gets the strict
    check, with no timing window).  Idempotent."""
    from google.protobuf import runtime_version as rv

    if getattr(rv.ValidateProtobufRuntimeVersion, "_ksp_lenient", False):
        return
    strict = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, minor, patch, suffix, location):
        try:
            strict(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            gap_ok = (
                "spark" in str(location)
                and major == rv.MAJOR
                and (minor, patch) >= (rv.MINOR, rv.PATCH)
                and minor - rv.MINOR <= 1
            )
            if not gap_ok:
                raise

    lenient._ksp_lenient = True
    rv.ValidateProtobufRuntimeVersion = lenient


#: Memoized resolution: once ensure_protobuf() has put the SDK runtime on
#: sys.path, a later bare ``import google.protobuf`` SUCCEEDS — so an
#: unmemoized re-probe would misreport "system" and (fatally) skip the
#: worker PYTHONPATH injection.  Measured: exactly that ordering happens
#: when a caller checks availability before running_counter_tws runs.
_RESOLVED: list = []


def ensure_protobuf() -> str | None:
    """Make ``google.protobuf`` importable in THIS process if possible.

    Returns ``"system"`` (real install, untouched), ``"gcloud-sdk"``
    (SDK runtime on sys.path + lenient validator), or ``None`` (no
    runtime available — callers should fall back to
    ``applyInPandasWithState``).  The first resolution is memoized so
    every later call reports how protobuf was ACTUALLY provided.
    """
    if _RESOLVED:
        return _RESOLVED[0]
    mode: str | None
    try:
        import google.protobuf  # noqa: F401

        mode = "system"
    except ImportError:
        mode = None
    if mode is None and os.path.isdir(
        os.path.join(GCLOUD_PROTOBUF_PATH, "google")
    ):
        if GCLOUD_PROTOBUF_PATH not in sys.path:
            sys.path.insert(0, GCLOUD_PROTOBUF_PATH)
        try:
            import google.protobuf  # noqa: F401

            _install_lenient_validator()
            mode = "gcloud-sdk"
        except ImportError:
            mode = None
    if mode is not None:  # never memoize absence (an install may appear)
        _RESOLVED.append(mode)
    return mode


def ensure_tws_worker_env(spark) -> str | None:
    """Inject the shim + SDK runtime into worker ``PYTHONPATH`` so the
    transformWithState state-server process can import protobuf.

    ``SparkContext.environment`` feeds ``PythonWorkerFactory``, which
    merges its ``PYTHONPATH`` entry into each worker process's
    environment.  The entry must still be present when the STREAM STARTS
    (worker launch), not merely while the plan is built — a
    scoped set-and-restore around plan construction was measured to
    leave the worker without it — so this setter is persistent and
    idempotent.  Leak surface: later pandas-UDF workers in the same
    session also see the shim, which only relaxes the protobuf gencode
    version check (a no-op for workers that never import protobuf).
    No-op when a real protobuf install exists (workers inherit it the
    normal way) or when no runtime is available; returns
    :func:`ensure_protobuf`'s mode either way.
    """
    mode = ensure_protobuf()
    if mode != "gcloud-sdk":
        return mode
    env = spark.sparkContext.environment
    prev = env.get("PYTHONPATH")
    entries = [SHIM_DIR, GCLOUD_PROTOBUF_PATH]
    if prev:
        entries += [p for p in prev.split(os.pathsep) if p not in entries]
    env["PYTHONPATH"] = os.pathsep.join(entries)
    return mode
