"""Optimization-round profiling sidecar (bench.py is FROZEN — guide §1).

Measures, with job labels and per-stage wall timers:
  * the build phases of bench.py with the engine's stage_sec telemetry
    surfaced (status / tokenize / encode / doc_stats / manifest ...),
  * cold and lazy-warm query latency broken into engine steps,
  * noop-sink isolation for the slow-path DataFrame query.

Usage: python bench_extra.py [docs|synth|queries|all] (default all).
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ckanext_extractor_spark.api import ExtractorEngine  # noqa: E402
from ckanext_extractor_spark.corpus import corpus_df  # noqa: E402
from ckanext_extractor_spark.session import get_spark  # noqa: E402
from ckanext_extractor_spark.sources.corpus_source import (  # noqa: E402
    documents_as_corpus,
)

SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "20000"))


def build_profile(spark, corpus, tag: str, salt_threshold: int) -> dict:
    out = {}
    root = tempfile.mkdtemp(prefix=f"bx_{tag}_")
    try:
        for i in range(2):
            eng = ExtractorEngine(
                spark, os.path.join(root, f"idx{i}"), n_buckets=32,
                salt_threshold=salt_threshold,
            )
            spark.sparkContext.setJobDescription(f"bx build {tag} run{i}")
            t0 = time.time()
            rep = eng.extract(corpus, build_id=f"bx-{tag}")
            wall = time.time() - t0
            out[f"run{i}"] = {"wall": round(wall, 3), "stages": rep.stage_sec}
        # query-phase breakdown on the second engine
        eng.warm()
        for q in ("spark join", "vector stream batch"):
            eng.search(q, k=10, conjunctive=False)
        eng.cool()
        t0 = time.time()
        eng.search("vector stream batch", k=10, conjunctive=False,
                   mode="maxscore")
        out["maxscore_lazy_cold"] = round(time.time() - t0, 4)
        eng.cool()
        t0 = time.time()
        st = eng.corpus_stats()
        out["cold_corpus_stats"] = round(time.time() - t0, 4)
        t0 = time.time()
        eng._fetch_rows(["vector", "stream", "batch"])
        out["cold_fetch_rows_3terms"] = round(time.time() - t0, 4)
        t0 = time.time()
        eng.search("spark join", k=10, mode="slow")
        out["slowpath_and_2term"] = round(time.time() - t0, 4)
        t0 = time.time()
        eng.search("spark join", k=10, mode="wand")
        out["blockmax_wand_and_2term"] = round(time.time() - t0, 4)
        # capped lazy-warm first pass (bench phase 4 shape)
        eng.RAW_PRELOAD_BYTES = 1
        eng.warm(max_cache_bytes=32 << 20)
        eng._query_cache.clear()
        t0 = time.time()
        for q, conj in (
            ("spark join", True), ("merge sort window", True),
            ("data", True), ("vector stream batch", False),
            ("customer window group", True),
        ):
            eng.search(q, k=10, conjunctive=conj)
        out["lazy_first_pass_5q"] = round(time.time() - t0, 4)
        st  # noqa: B018
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=int(cpus))
    res: dict = {"sf_dir": sf_dir, "cpus": int(cpus)}
    if which in ("docs", "all", "queries"):
        corpus_docs = documents_as_corpus(spark, sf_dir).cache()
        corpus_docs.count()
        res["documents"] = build_profile(spark, corpus_docs, "docs", 100_000)
    if which in ("synth", "all"):
        synth = corpus_df(spark, SYNTH_DOCS).cache()
        synth.count()
        res["synthetic"] = build_profile(spark, synth, "synth", 50_000)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
