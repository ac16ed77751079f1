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
            # Allow: same major, gencode (args) >= runtime, gap <= 1 minor.
            gap_ok = (
                major == _rv.MAJOR
                and (minor, patch) >= (_rv.MINOR, _rv.PATCH)
                and minor - _rv.MINOR <= 1
            )
            if not gap_ok:
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient
