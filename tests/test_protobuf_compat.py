"""protobuf_compat: the lenient-validator scope, the system-mode
contract, and the worker shim's sitecustomize chain-load."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from kafka_streaming_spark.streaming.protobuf_compat import (
    GCLOUD_PROTOBUF_PATH,
    SHIM_DIR,
    ensure_protobuf,
)


def test_lenient_validator_scope():
    """The relaxed check must apply ONLY to pyspark's own gencode with a
    same-major, at-most-one-minor-newer gap — any other generated module
    (and any larger gap) still gets the strict rejection."""
    if ensure_protobuf() != "gcloud-sdk":
        pytest.skip("lenient validator not installed (system protobuf)")
    from google.protobuf import runtime_version as rv

    assert getattr(rv.ValidateProtobufRuntimeVersion, "_ksp_lenient", False)
    newer = (rv.MAJOR, rv.MINOR + 1, 0)
    pyspark_loc = (  # the location Spark's real gencode passes
        "org/apache/spark/sql/execution/streaming/StateMessage.proto"
    )

    # Spark gencode, one minor newer: allowed
    rv.ValidateProtobufRuntimeVersion(
        rv.DOMAIN, *newer, "", pyspark_loc
    )
    # same gap, NON-Spark gencode: still strict
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.DOMAIN, *newer, "", "someother/app_pb2.py"
        )
    # Spark gencode but two minors newer: still strict
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.DOMAIN, rv.MAJOR, rv.MINOR + 2, 0, "", pyspark_loc
        )
    # exact match (incl. the runtime's suffix): fine for anyone (the
    # strict path, untouched)
    rv.ValidateProtobufRuntimeVersion(
        rv.DOMAIN, rv.MAJOR, rv.MINOR, rv.PATCH, rv.SUFFIX, "x_pb2.py"
    )


def test_system_mode_leaves_validator_strict():
    """If a REAL protobuf install exists (no SDK path needed),
    ensure_protobuf must report "system" and leave the strict validator
    untouched.  Env-gated: activates the day a protobuf pip route opens
    (VERDICT r9 ask #6); skips while the container has none."""
    probe = subprocess.run(
        [sys.executable, "-c", "import google.protobuf"],
        capture_output=True,
    )
    if probe.returncode != 0:
        pytest.skip("no system protobuf install (expected in container)")
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            textwrap.dedent(
                """
                from kafka_streaming_spark.streaming.protobuf_compat import (
                    ensure_protobuf,
                )
                mode = ensure_protobuf()
                assert mode == "system", mode
                from google.protobuf import runtime_version as rv
                assert not getattr(
                    rv.ValidateProtobufRuntimeVersion, "_ksp_lenient", False
                ), "validator must stay strict in system mode"
                print("SYSTEM-MODE-OK")
                """
            ),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert "SYSTEM-MODE-OK" in check.stdout, (check.stdout, check.stderr)


def test_sitecustomize_chain_load(tmp_path):
    """The shim's sitecustomize must chain-load a sitecustomize it
    shadows on the path (a worker environment shipping its own must not
    silently lose it)."""
    other = tmp_path / "other_site"
    other.mkdir()
    (other / "sitecustomize.py").write_text(
        "import sys\nsys._ksp_chain_marker = 'loaded'\n"
    )
    env = {**os.environ}
    env["PYTHONPATH"] = os.pathsep.join(
        [SHIM_DIR, str(other), GCLOUD_PROTOBUF_PATH, "/root/repo"]
    )
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; print(getattr(sys, '_ksp_chain_marker', 'MISSING'))",
        ],
        capture_output=True,
        text=True,
        env=env,
    )
    assert out.stdout.strip() == "loaded", (out.stdout, out.stderr)
