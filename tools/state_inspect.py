"""Checkpoint state forensics CLI — the offline view of a streaming
checkpoint's state store (wraps ``streaming/state_reader.py``; the
engine-level surface is oracle-checked by ``f_statestore_scan`` and the
``test_state_reader_*`` suite).

    python tools/state_inspect.py <checkpoint-dir> [--state-var NAME]
        [--operator-id N] [--changes] [--limit N]

Prints: the operator metadata, the partition-skew view, a sample of the
flattened state rows, and (with ``--changes``) the per-batch state
change feed.  Read-only; safe against a live query's checkpoint (the
data source reads committed batches only).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streaming_spark.session import build_session  # noqa: E402
from kafka_streaming_spark.streaming.state_reader import (  # noqa: E402
    read_state_changes,
    read_state_flat,
    read_state_metadata,
    state_key_skew,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--state-var", default=None)
    ap.add_argument("--operator-id", type=int, default=None)
    ap.add_argument("--changes", action="store_true")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args()

    spark = build_session(
        app_name="kss-state-inspect",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    try:
        kw = {}
        if args.state_var is not None:
            kw["state_var"] = args.state_var
        if args.operator_id is not None:
            kw["operator_id"] = args.operator_id

        print("== operators ==")
        read_state_metadata(spark, args.checkpoint).show(truncate=False)
        print("== partition skew (state rows per store partition) ==")
        state_key_skew(spark, args.checkpoint, **kw).show()
        print(f"== state sample (first {args.limit} rows) ==")
        read_state_flat(spark, args.checkpoint, **kw).show(
            args.limit, truncate=False
        )
        if args.changes:
            print("== state change feed ==")
            read_state_changes(spark, args.checkpoint, **kw).orderBy(
                "batch_id", "partition_id"
            ).show(args.limit, truncate=False)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
