"""Paired A/B: dismax with build-time field norms vs query-time dl
aggregate (VERDICT r3 #6 'paired A/B on a wide-metadata corpus').

Synthesizes a wide-metadata corpus (every doc carries two metadata
fields of ~40 tokens each — the regime where the per-query
(doc, field) length aggregate dominates dismax), materializes
field_postings + field_norms as parquet (what the engine persists),
then alternates N timed dismax_search_fields queries per arm.

Usage: python tools/profile_dismax.py [n_docs] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ckanext_extractor_spark.operators.fields import (
    build_field_norms,
    build_field_postings,
    dismax_search_fields,
)
from ckanext_extractor_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("profile-dismax", cores=8, shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="dismax_ab_")

    # wide metadata: ~40 tokens/field from a 200-word vocabulary
    words = F.array(*[F.lit(f"w{i:03d}") for i in range(200)])
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.create_map(
            F.lit("title"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.element_at(
                    words, ((F.xxhash64(F.col("id") * 1000 + i) % 200
                             + 200) % 200 + 1).cast("int")),
            )),
            F.lit("tags"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.element_at(
                    words, ((F.xxhash64(F.col("id") * 7777 + i) % 200
                             + 200) % 200 + 1).cast("int")),
            )),
        ).alias("metadata"),
    )
    build_field_postings(base).write.parquet(f"{root}/fp")
    fp = spark.read.parquet(f"{root}/fp")
    build_field_norms(fp).write.parquet(f"{root}/fn")
    fp = spark.read.parquet(f"{root}/fp")
    fn = spark.read.parquet(f"{root}/fn")
    qf = {"title": 2.0, "tags": 1.0}

    def run(norms):
        t0 = time.time()
        dismax_search_fields(
            fp, "w001 w042 w123", qf, k=10, tie=0.3, norms=norms
        ).collect()
        return time.time() - t0

    run(None)  # warm both file listings / JIT once
    run(fn)
    with_norms, without = [], []
    for _ in range(rounds):  # alternate to cancel drift
        without.append(run(None))
        with_norms.append(run(fn))
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "n_docs": n_docs,
        "rounds": rounds,
        "query_time_agg_sec_best": min(without),
        "precomputed_norms_sec_best": min(with_norms),
        "speedup_best": round(min(without) / min(with_norms), 3),
        "raw_without": [round(x, 3) for x in without],
        "raw_with_norms": [round(x, 3) for x in with_norms],
    }))


if __name__ == "__main__":
    main()
