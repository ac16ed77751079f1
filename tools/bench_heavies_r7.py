"""Round-7 100x self-bench of the seven heavies VERDICT r6 ask #2 lists
(the r6 100x table covered only the two pair miners + Kaplan-Meier).

Times each query best-of-2 at sf0.1 and at the 100x replica
(`.tmp/sf100r7`, built by make_scale_replica.py --factor 100
--replicate-customer with the r7 ck-offset fix).  Two exceptions route
to 10x replicas with the degenerate-regime rationale inline below and
in SCALE.md: x_prefix_filter_join (10x varied documents,
`.tmp/sf10docs_r7` — the 100x copy-cluster regime is output-quadratic
and filled the disk) and x_dbscan_clusters (10x customers — density-
quadratic at the fixed plane/eps).  Results go to SCALE.md by hand.

Usage: python tools/bench_heavies_r7.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streaming_spark.session import build_session  # noqa: E402
from kafka_streaming_spark.queries import REGISTRY  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
REPLICA = os.path.join(REPO, ".tmp", "sf100r7")
# x_dbscan_clusters is density-quadratic at a FIXED plane/eps by
# construction (100x points on the same 100k² plane → ~10,000x pair
# volume, an ~11G-row neighbor list) — its scale row runs at the 10x
# customer replica; the fixed-density caveat goes to SCALE.md.
CUSTOMER_10X = os.path.join(REPO, ".tmp", "sf10r6")

HEAVIES = [
    "x_kcore_trade",
    "x_dbscan_clusters",
    "x_label_propagation",
    "x_bfs_hops",
    "x_weighted_shortest_path",
    "x_prefix_filter_join",
    "x_hits_rank",
]


def main() -> None:
    names = sys.argv[1:] or HEAVIES
    spark = build_session("bench-heavies-r7", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _sql = REGISTRY[name]
        if name == "x_prefix_filter_join":
            # 10x varied docs: candidate volume (and the OUTPUT itself)
            # is quadratic in near-dup cluster size, so the 100x replica
            # (every doc a 100-copy cluster) is candidate- and
            # output-bound at ~2.5G candidate rows — it filled the disk
            # with shuffle spill.  The 10x regime (10-copy clusters) is
            # the meaningful scale point; caveat recorded in SCALE.md.
            scale = ("10x", os.path.join(REPO, ".tmp", "sf10docs_r7"))
        elif name == "x_dbscan_clusters":
            scale = ("10x", CUSTOMER_10X)
        else:
            scale = ("100x", REPLICA)
        for label, d in (("1x", BASE), scale):
            best = float("inf")
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(f"{name} {label}: {best:.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
