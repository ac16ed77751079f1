"""Round-9 scale self-bench for the two registrations that landed this
round (VERDICT r8 asks #3/#6): the transformWithState witness and the
Arrow-optimized Python UDTF witness.  Results go to SCALE.md by hand
(addenda 3 and 4).

Scale points:
- ``t_stream_tws_counter``: sf0.01 vs sf0.1 (10x events).  Expected
  near-flat — fixed streaming costs dominate (query start/stop, RocksDB
  state-store open/commit, the protobuf state-server handshake), same
  shape as ``t_stream_ttl_counter`` in the r8 table.
- ``x_udtf_chunk_text``: sf0.01 vs sf0.1.  The witness is bounded by
  construction (doc_id < 200 at every sf), so the replica row measures
  fixed cost; the scale argument is the plan's (zero-exchange narrow
  generate, pruned 2-column scan, Python once per Arrow batch).

Usage: python tools/bench_r9_registrations.py [name ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streaming_spark.session import build_session  # noqa: E402
from kafka_streaming_spark.queries import REGISTRY  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [("1x", "/root/testdata/sf0.01"), ("10x", "/root/testdata/sf0.1")]
NAMES = ["t_stream_tws_counter", "x_udtf_chunk_text"]


def main(names: list[str]) -> None:
    spark = build_session(app_name="bench-r9-registrations")
    try:
        for name in names:
            fn, _sql = REGISTRY[name]
            for label, d in POINTS:
                if name == "t_stream_tws_counter":
                    # the witness caches its staged source per sf-dir;
                    # clear it so each point includes one build + stream
                    import re

                    slug = re.sub(r"[^A-Za-z0-9]+", "_", d).strip("_")
                    shutil.rmtree(
                        os.path.join(
                            REPO, ".tmp", f"t_stream_tws_counter_{slug}"
                        ),
                        ignore_errors=True,
                    )
                best, rows = float("inf"), None
                for _ in range(2):
                    t0 = time.monotonic()
                    rows = len(fn(spark, d).collect())
                    best = min(best, time.monotonic() - t0)
                print(f"{name} {label} {d}: {best:.2f}s rows={rows}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or NAMES)
