"""A/B: exact cosine top-k scan vs PQ ADC scans at a few hundred
thousand vectors — the measured claim behind the PQ family: once codes
exist (ingest-time artifacts), a query reads m small ints per vector
instead of 4*dim bytes of floats.

Two ADC variants are timed:
* EAV codes (one row per (vec, subspace)) -> broadcast-table join +
  per-id aggregate (pq_adc_topk)
* PACKED codes (one row per vec, array<int>) -> literal-table lookup
  projection + TakeOrdered, zero shuffle (pq_adc_topk_packed — the
  production layout)

Data is a seeded gaussian MIXTURE (256 planted centers, sigma 0.25):
uniform random vectors are PQ's pathological case (all cosines
concentrate near 0 and the top-k is a photo-finish of noise); real
embedding corpora are clustered, which is the regime IVF/PQ is built
for. recall@k of ADC vs exact is reported next to the speedup, plus
the on-disk bytes of both tables — at 100 TB the bytes ratio IS the
argument.

Protocol (BENCH discipline): one Spark session, vectors written to
parquet once (both paths read their own table), alternating timed
runs, best-of-N per path, all raw runs reported.

Usage: python tools/profile_pq.py [n_vecs] [dim] [rounds] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _write_mixture(path: str, n: int, dim: int, n_centers: int = 256,
                   sigma: float = 0.25) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((n_centers, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    writer = None
    chunk = 50_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        which = rng.randint(0, n_centers, hi - lo)
        vecs = (centers[which]
                + sigma * rng.standard_normal((hi - lo, dim))
                ).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    writer.close()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    from ckanext_extractor_spark.functions.projection import (
        pq_adc_topk,
        pq_adc_topk_packed,
        pq_codebooks,
        pq_encode,
        pq_encode_packed,
    )
    from ckanext_extractor_spark.functions.similarity import cosine_topk
    from ckanext_extractor_spark.session import get_spark

    spark = get_spark("profile-pq", cores=8, shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="pq_prof_")
    try:
        _write_mixture(f"{base}/emb.parquet", n, dim)
        emb = spark.read.parquet(f"{base}/emb.parquet") \
            .repartition(8).cache()
        emb.count()
        emb.write.mode("overwrite").parquet(f"{base}/emb")
        emb = spark.read.parquet(f"{base}/emb")

        # ingest-time artifacts
        t0 = time.time()
        books = pq_codebooks(emb, m=8, n_codes=64, rounds=1,
                             sample_frac=min(1.0, 20_000 / n))
        t_books = time.time() - t0
        t0 = time.time()
        pq_encode(emb, books).write.mode("overwrite") \
            .parquet(f"{base}/codes_eav")
        t_encode = time.time() - t0
        pq_encode_packed(emb, books).write.mode("overwrite") \
            .parquet(f"{base}/codes_packed")
        codes_eav = spark.read.parquet(f"{base}/codes_eav")
        codes_packed = spark.read.parquet(f"{base}/codes_packed")

        # query = a perturbed planted center (a realistic query)
        rng = np.random.RandomState(42)
        centers = np.random.RandomState(7).standard_normal((256, dim))
        q = list(centers[0] / np.linalg.norm(centers[0])
                 + 0.1 * rng.standard_normal(dim))
        k = 100
        exact_s, adc_s, packed_s = [], [], []
        exact_ids = adc_ids = packed_ids = None
        for _ in range(rounds):
            t0 = time.time()
            exact_ids = [r["vec_id"] for r in
                         cosine_topk(emb, q, k=k).collect()]
            exact_s.append(round(time.time() - t0, 3))
            t0 = time.time()
            adc_ids = [r["vec_id"] for r in
                       pq_adc_topk(codes_eav, books, q, k=k).collect()]
            adc_s.append(round(time.time() - t0, 3))
            t0 = time.time()
            packed_ids = [r["vec_id"] for r in
                          pq_adc_topk_packed(codes_packed, books, q,
                                             k=k).collect()]
            packed_s.append(round(time.time() - t0, 3))
        result = {
            "n_vecs": n, "dim": dim, "m": 8, "n_codes": 64, "k": k,
            "data": "256-center gaussian mixture sigma=0.25",
            "codebook_sec": round(t_books, 2),
            "encode_sec": round(t_encode, 2),
            "emb_bytes": _du(f"{base}/emb"),
            "codes_packed_bytes": _du(f"{base}/codes_packed"),
            "bytes_ratio": round(
                _du(f"{base}/emb") / _du(f"{base}/codes_packed"), 1),
            "exact_scan_sec": exact_s,
            "adc_eav_scan_sec": adc_s,
            "adc_packed_scan_sec": packed_s,
            "exact_best": min(exact_s),
            "adc_eav_best": min(adc_s),
            "adc_packed_best": min(packed_s),
            "speedup_packed_best": round(
                min(exact_s) / min(packed_s), 2),
            "recall_at_k_eav": round(
                len(set(exact_ids) & set(adc_ids)) / float(k), 3),
            "recall_at_k_packed": round(
                len(set(exact_ids) & set(packed_ids)) / float(k), 3),
        }
        # production two-stage shape: ADC shortlist (10k) -> exact
        # re-rank. Shortlist recall is the number that matters: it
        # bounds the two-stage pipeline's end recall while the exact
        # pass touches only shortlist/n of the corpus.
        t0 = time.time()
        short = [r["vec_id"] for r in
                 pq_adc_topk_packed(codes_packed, books, q,
                                    k=10 * k).collect()]
        result["shortlist_sec"] = round(time.time() - t0, 3)
        result["shortlist_recall_at_k"] = round(
            len(set(exact_ids) & set(short)) / float(k), 3)
        line = json.dumps(result)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
