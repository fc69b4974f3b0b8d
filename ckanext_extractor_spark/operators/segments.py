"""Segment build: skew-aware shuffle + compressed posting-list encoding
(SURVEY.md B1/B2; reference analog: Lucene segment writes triggered by
`search.rebuild`, tasks.py:110 — here owned natively).

B1 — postings shuffle.  Postings repartition by `term_bucket =
pmod(xxhash64(term), n_buckets)`.  Hot terms (df above `salt_threshold`)
additionally split by `pmod(xxhash64(doc_id), salt_factor)` so no single
task owns a whole hot posting list while encoding: the north rule's
"repartition by term hash with salting for skewed terms".  The salt factor
per term comes from the dictionary (a broadcast join — dictionary
cardinality ≪ postings).

B2 — per-(bucket, salt) `applyInPandas` encodes each term's postings with
the delta+varbyte codec + block-max metadata (operators/codec.py).  A
salted hot term yields one segment row per salt shard; shards carry
`salt_id` and are merged at read time (doc-id ranges of shards may
interleave; the decoder re-sorts — determinism comes from the codec's
internal doc_id sort, pinned by test_encoding_is_order_independent).

Output table `segments`:
    (term, term_bucket, salt_id, n_postings, df_shard, blob binary,
     block_last_doc array<long>, block_max_tfn array<double>)
written as Parquet partitioned by term_bucket -> query-time partition
pruning reads only the buckets of the query's terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1
from ckanext_extractor_spark.operators.codec import (
    encode_posting_list,  # noqa: F401 (single-list API, tests/tools)
    encode_posting_lists_grouped,
)

SEGMENT_SCHEMA = (
    "term string, term_bucket int, salt_id int, n_postings long, "
    "blob binary, block_last_doc array<long>, block_max_tfn array<double>"
)

DEFAULT_SALT_THRESHOLD = 100_000  # df above which a term's encode is sharded


def salted_postings(
    postings: DataFrame,
    dictionary: DataFrame,
    n_buckets: int = 64,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
) -> DataFrame:
    """Attach (term_bucket, salt_id) using df-driven salt factors."""
    salt = dictionary.select(
        "term",
        F.greatest(
            F.lit(1), F.ceil(F.col("df") / F.lit(salt_threshold)).cast("int")
        ).alias("salt_factor"),
    )
    return (
        postings.join(F.broadcast(salt), "term")
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        .withColumn(
            "salt_id",
            F.pmod(F.xxhash64("doc_id"), F.col("salt_factor")).cast("int"),
        )
    )


def encode_segments(
    salted: DataFrame,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    with_positions: bool = True,
    n_tasks: int | None = None,
) -> DataFrame:
    """Encode posting blobs: repartition by (term_bucket, salt_id), sort
    within partitions by (bucket, salt, term, doc_id), then a STREAMING
    mapInPandas encoder with carry-over stitching at batch boundaries.

    Why streaming, not groupBy().applyInPandas: applyInPandas materializes
    each group as ONE pandas frame — at segment granularity that's
    10^5..10^6 rows of python bytes objects per task, which (measured)
    thrashes the allocator and anti-scales with worker count. The
    streaming encoder sees bounded Arrow batches (session cap 1024 rows),
    keeps only the current in-progress term as carry, and emits encoded
    rows batch by batch. A term's rows are contiguous (sorted), so the
    only stitching needed is the tail term of each batch.

    Salting still spreads hot terms' rows across salt shards; skew beyond
    that is bounded by the batch size, not the group size. The shuffle is
    ONE exchange; determinism comes from the in-kernel (term, doc_id)
    ordering, not shuffle order."""

    def encode_stream(batches):
        carry: pd.DataFrame | None = None

        def encode_keys(pdf: pd.DataFrame) -> pd.DataFrame:
            # pdf rows sorted by (bucket, salt, term, doc_id), all keys
            # complete. Encode per (bucket, salt) slice via the grouped
            # vectorized encoder.
            out = []
            bs = pdf["term_bucket"].to_numpy()
            ss = pdf["salt_id"].to_numpy()
            key_change = np.flatnonzero((bs[1:] != bs[:-1]) | (ss[1:] != ss[:-1])) + 1
            part_starts = np.concatenate(([0], key_change, [len(pdf)]))
            for pi in range(len(part_starts) - 1):
                s, e = part_starts[pi], part_starts[pi + 1]
                sub = pdf.iloc[s:e]
                terms = sub["term"].to_numpy()
                bounds = np.flatnonzero(terms[1:] != terms[:-1]) + 1
                g_starts = np.concatenate(([0], bounds))
                g_ends = np.concatenate((bounds, [len(sub)]))
                blobs, ns, last_docs, max_tfns = encode_posting_lists_grouped(
                    sub["doc_id"].to_numpy(dtype=np.int64),
                    sub["tf"].to_numpy(dtype=np.int64),
                    sub["doc_len"].to_numpy(dtype=np.int64),
                    sub["positions"].to_numpy() if with_positions else None,
                    g_starts, g_ends, avgdl, k1=k1, b=b,
                )
                out.append(
                    pd.DataFrame(
                        {
                            "term": terms[g_starts],
                            "term_bucket": np.full(
                                len(ns), sub["term_bucket"].iat[0], dtype=np.int32
                            ),
                            "salt_id": np.full(
                                len(ns), sub["salt_id"].iat[0], dtype=np.int32
                            ),
                            "n_postings": ns,
                            "blob": blobs,
                            "block_last_doc": last_docs,
                            "block_max_tfn": max_tfns,
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            # hold back the trailing (bucket, salt, term) key — it may
            # continue in the next batch
            last_b = pdf["term_bucket"].iat[-1]
            last_s = pdf["salt_id"].iat[-1]
            last_t = pdf["term"].iat[-1]
            tail_mask = (
                (pdf["term_bucket"] == last_b)
                & (pdf["salt_id"] == last_s)
                & (pdf["term"] == last_t)
            ).to_numpy()
            # sorted input -> the matching rows form a contiguous suffix;
            # worst-case carry is one term's shard (<= salt_threshold rows)
            n_tail = int(tail_mask.sum())
            head = pdf.iloc[: len(pdf) - n_tail]
            carry = pdf.iloc[len(pdf) - n_tail :]
            if len(head):
                yield encode_keys(head)
        if carry is not None and len(carry):
            yield encode_keys(carry)

    nt = n_tasks or salted.sparkSession.conf.get("spark.sql.shuffle.partitions")
    arranged = salted.repartition(int(nt), "term_bucket", "salt_id").sortWithinPartitions(
        "term_bucket", "salt_id", "term", "doc_id"
    )
    return arranged.mapInPandas(encode_stream, schema=SEGMENT_SCHEMA)


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist partitioned by term_bucket (query-time partition pruning).

    The encoded rows are tiny relative to postings (compressed blobs), so
    an extra exchange keyed by term_bucket is cheap — it collapses the
    [encode_tasks x buckets] small-file explosion into one sorted file per
    bucket (driver-side file commits were a measurable serial cost), and
    term-sorted row groups give min/max pruning on `term` at read."""
    (
        segments.repartition("term_bucket")
        .sortWithinPartitions("term", "salt_id")
        .write.mode(mode)
        .partitionBy("term_bucket")
        .parquet(path)
    )


def read_segments(spark, path: str, terms: list[str] | None = None,
                  n_buckets: int = 64) -> DataFrame:
    """Read back, pruning to the buckets of `terms` when given.

    The bucket filter is a partition-pruning predicate (term_bucket is a
    Hive-style partition column), so only the relevant directories are
    listed and scanned; the residual term IN filter prunes row groups via
    parquet min/max on `term`.
    """
    df = spark.read.parquet(path)
    if terms:
        hashes = _xxhash64_strs(list(terms))
        buckets = sorted({hashes[t] % n_buckets for t in terms})
        df = df.where(F.col("term_bucket").isin(buckets)).where(
            F.col("term").isin(terms)
        )
    return df


_XXHASH_CACHE: dict[str, int] = {}


def _xxhash64_strs(strings: list[str]) -> dict[str, int]:
    """Driver-side xxhash64 matching Spark's `xxhash64(string)` (seed 42).

    Used only to compute bucket ids for partition pruning at query time;
    correctness does not depend on it (the residual term filter is exact) —
    a wrong bucket mapping would only read more data. One batched local
    JVM round-trip for all uncached terms, memoized per process.
    """
    missing = [s for s in strings if s not in _XXHASH_CACHE]
    if missing:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        rows = (
            spark.createDataFrame([(s,) for s in missing], "t string")
            .select("t", F.xxhash64("t").alias("h"))
            .collect()
        )
        for r in rows:
            _XXHASH_CACHE[r["t"]] = r["h"]
    return {s: _XXHASH_CACHE[s] for s in strings}
