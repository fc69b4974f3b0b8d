"""Per-entry wall-time sweep over every declared query (guide §1).

Runs each queries() entry the way the driver does (build the DataFrame,
collect it) and prints a JSON dict name -> seconds (best of N), sorted
slowest-first on stderr for human eyes. Measurement-only sidecar:
bench.py and the oracle battery are untouched.

Usage: python tools/time_entries.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from ckanext_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("time-entries", cores="32", shuffle_partitions=32)
    import __spark_entry__ as e

    qs = e.queries()
    out: dict[str, float] = {}
    for name in sorted(qs):
        fn = qs[name]
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.time()
            try:
                fn(spark, sf_dir).collect()
            except Exception as ex:  # noqa: BLE001
                print(f"ERR {name}: {ex}", file=sys.stderr)
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            out[name] = round(best, 3)
            print(f"{best:8.3f}  {name}", file=sys.stderr)
    for name, sec in sorted(out.items(), key=lambda kv: -kv[1])[:25]:
        print(f"SLOW {sec:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
