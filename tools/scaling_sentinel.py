"""Probe-gated scaling pairs: only launch an alternating local[2]/local[8]
index-build pair when the host is actually delivering cycles.

The VM's hypervisor steal makes unconditional pairs waste 25 minutes in a
storm (kernel core-seconds stay parallelism-invariant in every storm-hit
pair — the noise is the host's, BENCH/BASELINE.md). This sentinel probes
delivered capacity (tools/host_probe.py: pure-python, no Spark) and runs a
pair only in a calm window.

Usage: python tools/scaling_sentinel.py [budget_sec] [max_pairs] [n_docs]
Writes BENCH/scaling_r3_pair<N>.json per pair + a progress log to stdout.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

PROBE_GATE = 0.85


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 9000.0
    max_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_docs = sys.argv[3] if len(sys.argv) > 3 else "1000000"
    prefix = sys.argv[4] if len(sys.argv) > 4 else "BENCH/scaling_r3_pair"
    deadline = time.time() + budget
    pair_i = 0
    while time.time() < deadline and pair_i < max_pairs:
        p = subprocess.run(
            [sys.executable, "tools/host_probe.py", "2", "8", "8"],
            capture_output=True, text=True,
        )
        try:
            probe = json.loads(p.stdout.strip().splitlines()[-1])
            eff = float(probe["delivered_efficiency_best"])
        except Exception:
            eff = 0.0
        print(f"[sentinel] probe delivered_efficiency={eff}", flush=True)
        if eff >= PROBE_GATE:
            pair_i += 1
            out = f"{prefix}{pair_i}.json"
            print(f"[sentinel] calm window -> pair {pair_i} ({out})",
                  flush=True)
            subprocess.run(
                [sys.executable, "tools/bench_scaling.py", n_docs, out,
                 "1", "2", "8"],
            )
        else:
            time.sleep(150)
    print(f"[sentinel] done: {pair_i} pairs", flush=True)


if __name__ == "__main__":
    main()
