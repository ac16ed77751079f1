"""Compute the driver-window rotation from the CORRECTNESS_r*.json
union: every registry query's latest round-with-a-row, then the N
least-recently-checked greens in (latest-round, registration-order) key
— the steady-state regression schedule DRIVER_PRIORITY runs now that
coverage is closed (337/337 at r9).

Usage:
    python tools/rotation.py            # verify the live window + stage next
    python tools/rotation.py --next 2   # stage the window after next too
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def window(reg_order: list[str], latest: dict[str, int], n: int = 50):
    idx = {name: i for i, name in enumerate(reg_order)}
    return sorted(reg_order, key=lambda q: (latest.get(q, 0), idx[q]))[:n]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--next", type=int, default=1, dest="n_windows",
                    help="how many future windows to stage")
    args = ap.parse_args()

    from kafka_streaming_spark.queries import DRIVER_PRIORITY, REGISTRY

    reg_order = list(REGISTRY)
    latest = latest_rounds()
    never = [q for q in reg_order if q not in latest]
    print(f"registry={len(reg_order)} with-driver-row={len(latest)} "
          f"never-checked={never or 0}")

    cur = window(reg_order, latest, len(DRIVER_PRIORITY))
    # new registrations (never-checked) always lead the live window
    lead = [q for q in DRIVER_PRIORITY if q in never]
    expect = lead + [q for q in cur if q not in lead][: len(DRIVER_PRIORITY) - len(lead)]
    ok = list(DRIVER_PRIORITY) == expect
    print("live DRIVER_PRIORITY matches computed window:", ok)
    if not ok:
        live, comp = set(DRIVER_PRIORITY), set(expect)
        print("  only-live:", sorted(live - comp))
        print("  only-computed:", sorted(comp - live))

    nxt_round = max(latest.values(), default=0) + 1
    sim = dict(latest)
    for i in range(args.n_windows):
        for q in (DRIVER_PRIORITY if i == 0 else prev):  # noqa: F821
            sim[q] = nxt_round + i
        prev = window(reg_order, sim, len(DRIVER_PRIORITY))
        print(f"\nstaged window +{i + 1} ({len(prev)}):")
        for j in range(0, len(prev), 4):
            print("  " + ", ".join(prev[j:j + 4]))


if __name__ == "__main__":
    main()
