"""Worker-side protobuf compatibility shim (imported automatically by
Python's ``site`` machinery when this directory is on ``PYTHONPATH``).

Why this exists: ``transformWithStateInPandas`` workers import
``pyspark.sql.streaming.proto.StateMessage_pb2`` at module-import time —
before any user code can run — and that generated module calls
``ValidateProtobufRuntimeVersion`` (gencode 6.33.0).  The only protobuf
runtime available in this container is the pure-Python 6.32.0 one shipped
inside the public Google Cloud SDK (``platform/google_appengine``), which
the strict validator rejects for being one minor version OLDER than the
gencode.  The wire format and the generated-code builder API are stable
across that gap (protobuf's cross-version guarantee covers same-major),
so this shim relaxes exactly that case: same major, runtime at most one
minor behind.  Everything else still raises.

Scoped, not global: this directory is injected into worker ``PYTHONPATH``
only by ``protobuf_compat.ensure_tws_worker_env`` (i.e. only in sessions
that actually build a transformWithState query); no file outside the repo
is modified.  See ``streaming/protobuf_compat.py`` for the driver-side
half.
"""

try:  # pragma: no cover - exercised only inside Spark python workers
    from google.protobuf import runtime_version as _rv
except Exception:  # protobuf genuinely absent: change nothing
    pass
else:
    _strict = _rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            _strict(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            # Allow: Spark's OWN gencode (validator receives the
            # gencode file location) with same major, gencode (args)
            # >= runtime, gap <= 1 minor.  Any other generated module
            # imported by a later worker still gets the strict check.
            gap_ok = (
                "spark" in str(location)
                and major == _rv.MAJOR
                and (minor, patch) >= (_rv.MINOR, _rv.PATCH)
                and minor - _rv.MINOR <= 1
            )
            if not gap_ok:
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient

# Chain-load a sitecustomize this shim may be SHADOWING: Python's site
# machinery imports only the first sitecustomize on sys.path, and
# ensure_tws_worker_env PREPENDS this directory — a worker environment
# that shipped its own sitecustomize would silently lose it otherwise.
try:  # pragma: no cover - depends on the worker's environment
    import importlib.util as _ilu
    import os as _os
    import sys as _sys

    _here = _os.path.dirname(_os.path.abspath(__file__))
    for _p in _sys.path:
        try:
            if not _p or _os.path.abspath(_p) == _here:
                continue
            _cand = _os.path.join(_p, "sitecustomize.py")
            if _os.path.isfile(_cand):
                _spec = _ilu.spec_from_file_location(
                    "_ksp_chained_sitecustomize", _cand
                )
                _mod = _ilu.module_from_spec(_spec)
                _spec.loader.exec_module(_mod)
                break
        except Exception:
            continue
except Exception:
    pass
