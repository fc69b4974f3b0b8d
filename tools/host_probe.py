"""Delivered-CPU-capacity probe: embarrassingly-parallel pure-python work
at N concurrent processes. No Spark, no shared state, no memory traffic
to speak of — any efficiency below 1.0 between N and 4N is the
HYPERVISOR's, not the engine's. Used to contextualize scaling runs on
this sandbox VM (BENCH/BASELINE.md host ceiling).

Usage: python tools/host_probe.py [lo] [hi] [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(args):
    deadline, = args
    count = 0
    x = 1.0001
    while time.time() < deadline:
        for _ in range(10_000):
            x = x * 1.0000001 % 7.0
        count += 10_000
    return count


def level(n_procs: int, seconds: float) -> float:
    with mp.Pool(n_procs) as pool:
        deadline = time.time() + seconds
        counts = pool.map(_spin, [(deadline,)] * n_procs)
    return sum(counts) / seconds


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    # alternate lo/hi thrice, best-of per level (same estimator as the
    # Spark scaling bench)
    los, his = [], []
    for _ in range(3):
        los.append(level(lo, secs))
        his.append(level(hi, secs))
    eff = (max(his) / max(los)) / (hi / lo)
    print(json.dumps({
        "lo_procs": lo, "hi_procs": hi,
        "lo_ops_per_sec": [round(x) for x in los],
        "hi_ops_per_sec": [round(x) for x in his],
        "delivered_efficiency_best": round(eff, 3),
        "per_round": [round((h / l) / (hi / lo), 3)
                      for l, h in zip(los, his)],
    }))


if __name__ == "__main__":
    main()
