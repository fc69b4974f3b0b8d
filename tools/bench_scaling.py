"""Scaling-efficiency protocol (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors; sandbox stand-in per BASELINE.md: the
same index-build job at local[8] vs local[32] on the same input).

Each parallelism level runs in a FRESH subprocess (a JVM's core count is
fixed at startup), builds the same deterministic synthetic corpus index,
and reports files/sec + bytes/sec. Efficiency = (tp32 / tp8) / 4.

Usage: python tools/bench_scaling.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.corpus import corpus_df
from ckanext_extractor_spark.session import get_spark

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
synth = corpus_df(spark, n_docs).cache()
n = synth.count()
nbytes = synth.selectExpr("sum(octet_length(content)) b").collect()[0]["b"]
root = tempfile.mkdtemp(prefix=f"scal{cores}_")
try:
    eng = ExtractorEngine(spark, root, n_buckets=32, salt_threshold=50_000)
    t0 = time.time()
    eng.extract(synth, build_id="scaling")
    wall = time.time() - t0
finally:
    shutil.rmtree(root, ignore_errors=True)
print(json.dumps({
    "cores": cores, "n_docs": n, "bytes": int(nbytes),
    "wall_sec": round(wall, 2),
    "files_per_sec": round(n / wall, 1),
    "bytes_per_sec": round(nbytes / wall, 1),
}))
"""


def run_level(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=3600,
        cwd="/root/repo",
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"level {cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    r8 = run_level(8, n_docs)
    print("local[8]:", json.dumps(r8))
    r32 = run_level(32, n_docs)
    print("local[32]:", json.dumps(r32))
    eff = (r32["files_per_sec"] / r8["files_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(r32["files_per_sec"] / r8["files_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
