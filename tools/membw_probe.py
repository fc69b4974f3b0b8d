"""Delivered MEMORY-BANDWIDTH probe: the companion to host_probe.py.

host_probe.py spins pure-register python (no memory traffic) and shows
whether the hypervisor delivers 4x CPU cycles from N to 4N procs. This
probe streams large numpy arrays (copy + add: ~3 reads + 2 writes per
element, far beyond LLC) so its N->4N efficiency is the HOST's memory
bandwidth ceiling — the resource the index build's encode kernels
(numpy sorts, varbyte packing, Arrow shuffles) actually contend on.

If host_probe says ~1.0 and this says ~0.7, a 0.7 build-scaling run is
bandwidth-starved by the VM, not serialized by the engine.

Usage: python tools/membw_probe.py [lo] [hi] [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _stream(args):
    deadline, = args
    import numpy as np

    a = np.random.RandomState(0).standard_normal(
        8 * 1024 * 1024)  # 64 MiB of valid doubles, >> LLC share
    b = np.empty_like(a)
    moved = 0
    while time.time() < deadline:
        np.copyto(b, a)      # read a, write b
        b += 1.0             # read b, write b
        moved += 3 * a.nbytes
    return moved


def level(n_procs: int, seconds: float) -> float:
    with mp.Pool(n_procs) as pool:
        deadline = time.time() + seconds
        totals = pool.map(_stream, [(deadline,)] * n_procs)
    return sum(totals) / seconds


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    los, his = [], []
    for _ in range(3):
        los.append(level(lo, secs))
        his.append(level(hi, secs))
    eff_best = (max(his) / max(los)) / (hi / lo)
    print(json.dumps({
        "lo_procs": lo, "hi_procs": hi,
        "lo_gbytes_per_sec": [round(x / 1e9, 2) for x in los],
        "hi_gbytes_per_sec": [round(x / 1e9, 2) for x in his],
        "delivered_bw_efficiency_best": round(eff_best, 3),
        "per_round": [
            round((h / l) / (hi / lo), 3) for l, h in zip(los, his)
        ],
    }))


if __name__ == "__main__":
    main()
