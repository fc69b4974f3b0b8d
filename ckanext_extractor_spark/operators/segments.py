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
from ckanext_extractor_spark.operators.codec import encode_posting_list

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
) -> DataFrame:
    """Group by (term_bucket, term, salt_id) shard and encode each term's
    posting list into one blob row. Shuffle is ONE exchange keyed by the
    salted grouping key; encoding is a numpy kernel per group."""

    def encode_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        term, bucket, salt_id = keys
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        doc_lens = pdf["doc_len"].to_numpy(dtype=np.int64)
        positions = (
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
            if with_positions
            else None
        )
        enc = encode_posting_list(
            doc_ids, tfs, positions, doc_lens, avgdl, k1=k1, b=b
        )
        return pd.DataFrame(
            {
                "term": [term],
                "term_bucket": np.array([bucket], dtype=np.int32),
                "salt_id": np.array([salt_id], dtype=np.int32),
                "n_postings": np.array([enc["n_postings"]], dtype=np.int64),
                "blob": [enc["blob"]],
                "block_last_doc": [enc["block_last_doc"].tolist()],
                "block_max_tfn": [enc["block_max_tfn"].tolist()],
            }
        )

    return salted.groupBy("term", "term_bucket", "salt_id").applyInPandas(
        encode_group, schema=SEGMENT_SCHEMA
    )


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist partitioned by term_bucket (query-time partition pruning)."""
    segments.write.mode(mode).partitionBy("term_bucket").parquet(path)


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
