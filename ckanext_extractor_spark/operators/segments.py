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
    "blob binary, block_last_doc array<long>, block_max_tfn array<double>, "
    "block_offs array<long>"
)
# kernel output before Catalyst re-attaches term_bucket (see encode_segments)
KERNEL_SCHEMA = (
    "term string, salt_id int, n_postings long, "
    "blob binary, block_last_doc array<long>, block_max_tfn array<double>, "
    "block_offs array<long>"
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


def salted_postings_auto(
    postings: DataFrame,
    n_buckets: int = 64,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
) -> DataFrame:
    """salted_postings without a precomputed dictionary: the broadcast
    side is ONLY the hot terms (df > salt_threshold — usually a handful),
    cold terms default to salt_factor 1 via the left join, and the
    salt_factor column is dropped before the big exchange (it would ride
    every posting row through the shuffle otherwise)."""
    hot = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > salt_threshold)
        .select(
            "term",
            F.ceil(F.col("df") / F.lit(salt_threshold)).cast("int").alias(
                "_salt_factor"
            ),
        )
    )
    return (
        postings.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        .withColumn(
            "salt_id",
            F.pmod(
                F.xxhash64("doc_id"),
                F.coalesce(F.col("_salt_factor"), F.lit(1)),
            ).cast("int"),
        )
        .drop("_salt_factor")
    )


def encode_segments(
    salted: DataFrame,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    with_positions: bool = True,
    n_tasks: int | None = None,
    n_buckets: int = 64,
    hash_terms: bool = False,
) -> DataFrame:
    """Encode posting blobs: repartition by (term_bucket, salt_id), then a
    mapInArrow kernel that sorts and encodes each partition in one
    vectorized pass.

    The exchange payload is SLIM by design: term_bucket and salt_id act
    only as repartition KEY EXPRESSIONS (projected away before the
    shuffle), and tf/doc_len travel packed into one long — measured on
    this host, the post-shuffle UnsafeRow->Arrow transpose that feeds
    mapInArrow costs per CELL, so 4 columns (term, doc_id, packed,
    positions) instead of 7 is the single biggest lever on the encode
    stage's wall time AND its multi-worker scaling (the transpose is
    memory-bandwidth-bound). The kernel recovers grouping from the term
    column alone; `salt_id` in the output becomes the task's partition id
    (deterministic under fixed partitioning) — shards of a hot term land
    in different tasks via the salt key expression, and read-time shard
    merging (wand.term_postings_from_rows) already accepts any sharding.
    `term_bucket` is re-attached by Catalyst AFTER the kernel, on the
    ~#groups-sized output, with the same pmod(xxhash64(term), n_buckets)
    the query-time pruner uses.

    Why not groupBy().applyInPandas: it materializes each group as ONE
    pandas frame of python objects — measured to thrash the allocator and
    anti-scale with workers.

    Why the kernel sorts (numpy lexsort over int arrays), not
    sortWithinPartitions: Spark's UnsafeRow sort copies every row into
    sort buffers and back, then re-serializes to Arrow — measured as the
    dominant, memory-bandwidth-bound, WORST-scaling stage of the whole
    build. Rows leave the kernel term-lexically sorted, so the engine
    writes partitionBy(term_bucket) with NO further exchange while
    keeping row-group min/max pruning on `term`.

    Why Arrow, not pandas: positions stay ONE contiguous buffer sliced per
    term by offsets (codec pos_data/pos_offsets path); only the ~#terms
    group heads ever become python strings. No per-row python objects
    exist anywhere in the kernel.

    Partition memory is bounded by construction: _encode_tasks sizes the
    exchange to ~ENCODE_ROWS_PER_TASK rows/task and df-driven salting
    caps any single (bucket, salt) key, so "the whole partition" is tens
    of MB, same order as one sort buffer.

    Packing bound: doc_len < 2^31 tokens per doc and tf < 2^32 (packed =
    doc_len << 32 | tf) — far beyond any real document.

    ``n_buckets`` MUST equal the n_buckets used by salted_postings /
    query-time pruning (read_segments) — it re-derives the term_bucket
    partition column on the kernel output."""

    def encode_stream(batches):
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("term", pa.string()),
                ("salt_id", pa.int32()),
                ("n_postings", pa.int64()),
                ("blob", pa.binary()),
                ("block_last_doc", pa.list_(pa.int64())),
                ("block_max_tfn", pa.list_(pa.float64())),
                ("block_offs", pa.list_(pa.int64())),
            ]
        )

        def binary_buffer(arr: "pa.Array"):
            """(data memoryview, absolute per-row offsets) of a
            Binary/LargeBinary chunk, honoring the chunk's slice offset."""
            odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            off = arr.offset
            offsets = np.frombuffer(arr.buffers()[1], dtype=odt)[
                off : off + len(arr) + 1
            ].astype(np.int64)
            data = memoryview(arr.buffers()[2])
            return data, offsets

        acc = []
        for rb in batches:
            if rb.num_rows:
                acc.append(rb)
        if not acc:
            return
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        tbl = pa.Table.from_batches(acc)
        acc = None
        # 32-bit-offset string/binary columns cap a single chunk's payload
        # at ~2 GiB — combine_chunks on a partition whose term/positions
        # bytes exceed that either errors or stays multi-chunk, and the
        # kernel's chunk(0) reads would then silently drop rows (ADVICE
        # r2, segments.py:210). Casting to 64-bit-offset large types makes
        # combine_chunks single-chunk by construction — but the cast
        # rebuilds offset arrays for every row, so it runs ONLY when a
        # column is actually near the limit (ordinary data-sized
        # partitions are ~64 MB and never pay it).
        LARGE_CUTOFF = 1_800_000_000  # < 2^31, with offset-array headroom
        if any(
            (pa.types.is_string(f.type) or pa.types.is_binary(f.type))
            and tbl.column(f.name).nbytes > LARGE_CUTOFF
            for f in tbl.schema
        ):
            tbl = tbl.cast(
                pa.schema(
                    [
                        pa.field(f.name, pa.large_string())
                        if pa.types.is_string(f.type)
                        else pa.field(f.name, pa.large_binary())
                        if pa.types.is_binary(f.type)
                        else f
                        for f in tbl.schema
                    ]
                )
            )
        tbl = tbl.combine_chunks()
        import pyarrow.compute as pc

        docs_all = tbl.column("doc_id").chunk(0).to_numpy()
        if hash_terms:
            # hash-keyed exchange: posting rows carry xxhash64(term), the
            # term STRING crossed the shuffle only once per (term, shard)
            # as a sentinel dictionary row (packed == -1, UTF-8 term
            # bytes in the positions column). Recover term strings from
            # the dictionary rows, rank them lexically (UTF-8 byte order
            # == code-point order), map postings th -> lexical code via
            # searchsorted. A th collision between two distinct terms is
            # DETECTED here (their dictionary rows co-land with any mixed
            # shard) and aborts the build — the caller retries with the
            # string exchange.
            th_all = tbl.column("th").chunk(0).to_numpy()
            packed_all = tbl.column("packed").chunk(0).to_numpy()
            dmask = packed_all == -1
            dict_idx = np.flatnonzero(dmask)
            post_idx = np.flatnonzero(~dmask)
            if post_idx.size == 0:
                return
            pos_col = tbl.column("positions").chunk(0)
            dterms = np.array(
                pos_col.take(pa.array(dict_idx, type=pa.int64())).to_pylist(),
                dtype=object,
            )
            dth = th_all[dict_idx]
            uth, first_i, inv = np.unique(
                dth, return_index=True, return_inverse=True
            )
            same = dterms == dterms[first_i][inv]
            if not bool(np.all(same)):
                j = int(np.flatnonzero(~same)[0])
                raise ValueError(
                    "term-hash collision: "
                    f"{dterms[j]!r} vs {dterms[first_i[inv[j]]]!r}"
                )
            uterms = dterms[first_i]  # aligned with uth (ascending th)
            lex = np.argsort(uterms)
            rank = np.empty(len(uth), dtype=np.int64)
            rank[lex] = np.arange(len(uth))
            th_post = th_all[post_idx]
            pos_in = np.searchsorted(uth, th_post)
            if pos_in.size and (
                (pos_in >= len(uth)).any()
                or (uth[np.minimum(pos_in, len(uth) - 1)] != th_post).any()
            ):
                raise ValueError(
                    "posting row with no dictionary row for its term hash"
                )
            codes = rank[pos_in]
            docs = docs_all[post_idx]
            order_local = np.lexsort((docs, codes))
            order = post_idx[order_local]
            codes_unsorted = None
            docs_s = docs[order_local]
            codes = codes[order_local]
            sorted_dict = pa.array(
                uterms[lex].tolist(), type=pa.binary()
            ).cast(pa.string())
        else:
            denc = tbl.column("term").chunk(0).dictionary_encode()
            # LEXICAL term codes (not raw dictionary codes): the kernel's
            # output is written partitionBy(term_bucket) with no further
            # exchange, so the row order here IS the file order — lexical
            # order gives parquet row-group min/max pruning on `term` at
            # read time. Ranking costs one string sort over the ~#unique
            # terms of the partition, never over the posting rows.
            dict_order = pc.sort_indices(denc.dictionary)
            rank = np.empty(len(denc.dictionary), dtype=np.int64)
            rank[dict_order.to_numpy()] = np.arange(len(denc.dictionary))
            codes_unsorted = rank[denc.indices.to_numpy()]
            # grouped sort: term (lexical), doc_id within. Shards of the
            # same term that hash-collide into this task merge into one
            # group — read-time shard merging makes that equivalent (and
            # the codec sorts per group, so the blob is deterministic
            # either way).
            order = np.lexsort((docs_all, codes_unsorted))
            sorted_dict = pc.take(denc.dictionary, dict_order).cast(
                pa.string()
            )
        # per-column numpy gathers instead of a full-table Arrow take:
        # a table take would copy EVERY posting row's term string, but
        # only group heads ever need one — positions is the lone column
        # whose bytes genuinely must be gathered (memory bandwidth is
        # this kernel's scaling ceiling at >1 concurrent worker)
        if codes_unsorted is not None:
            docs_s = docs_all[order]
        packed_s = tbl.column("packed").chunk(0).to_numpy()[order]
        tfs_s = (packed_s & np.int64(0xFFFFFFFF)).astype(np.int64)
        dls_s = (packed_s >> np.int64(32)).astype(np.int64)
        if codes_unsorted is not None:
            codes = codes_unsorted[order]
        change = codes[1:] != codes[:-1]
        bounds = np.flatnonzero(change) + 1
        g_starts = np.concatenate(([0], bounds))
        g_ends = np.concatenate((bounds, [len(docs_s)]))
        if with_positions:
            pos_data, pos_offsets = binary_buffer(
                tbl.column("positions").chunk(0).take(
                    pa.array(order, type=pa.int64())
                )
            )
        else:
            pos_data, pos_offsets = None, None
        blobs, ns, last_docs, max_tfns, block_offs = encode_posting_lists_grouped(
            docs_s, tfs_s, dls_s,
            None,
            g_starts, g_ends, avgdl, k1=k1, b=b,
            pos_data=pos_data, pos_offsets=pos_offsets,
        )
        # group-head term strings: codes are lexical ranks into the
        # sorted dictionary, so one ~#groups-sized take resolves them
        yield pa.record_batch(
            [
                pc.take(
                    sorted_dict, pa.array(codes[g_starts], type=pa.int64())
                ),
                pa.array(
                    np.full(len(g_starts), pid, dtype=np.int32),
                    type=pa.int32(),
                ),
                pa.array(ns, type=pa.int64()),
                pa.array(blobs, type=pa.binary()),
                pa.array(last_docs, type=pa.list_(pa.int64())),
                pa.array(max_tfns, type=pa.list_(pa.float64())),
                pa.array(block_offs, type=pa.list_(pa.int64())),
            ],
            schema=out_schema,
        )

    nt = n_tasks or salted.sparkSession.conf.get("spark.sql.shuffle.partitions")
    packed_expr = (
        F.shiftleft(F.col("doc_len").cast("long"), 32)
        + F.col("tf").cast("long")
    ).alias("packed")
    if hash_terms and with_positions:
        # slimmest exchange: 4 columns, all but positions fixed-width —
        # the term STRING rides the shuffle once per (term, shard) as a
        # sentinel dictionary row (packed == -1, term bytes in the
        # positions column; real packed is always > 0 since tf >= 1), not
        # once per posting row. The dictionary branch re-scans staging
        # but projects only (term_bucket, salt_id, term) and its partial
        # distinct collapses map-side to ~vocabulary rows.
        posting_rows = salted.select(
            "term_bucket",
            "salt_id",
            F.xxhash64("term").alias("th"),
            F.col("doc_id"),
            packed_expr,
            F.col("positions"),
        )
        dict_rows = (
            salted.select("term_bucket", "salt_id", "term")
            .distinct()
            .select(
                "term_bucket",
                "salt_id",
                F.xxhash64("term").alias("th"),
                F.lit(0).cast("long").alias("doc_id"),
                F.lit(-1).cast("long").alias("packed"),
                F.encode(F.col("term"), "UTF-8").alias("positions"),
            )
        )
        arranged = (
            posting_rows.unionByName(dict_rows)
            .repartition(int(nt), "term_bucket", "salt_id")
            .select("th", "doc_id", "packed", "positions")
        )
    else:
        hash_terms = False  # positions column is the dict-row carrier
        cols = [F.col("term"), F.col("doc_id"), packed_expr]
        if with_positions:
            cols.append(F.col("positions"))
        arranged = (
            salted.repartition(int(nt), "term_bucket", "salt_id").select(*cols)
        )
    encoded = arranged.mapInArrow(encode_stream, schema=KERNEL_SCHEMA)
    return encoded.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
    )


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

    Computes bucket ids for partition pruning at query time. Optimization
    r6: pure-python XXH64 (analysis/xxh64.py, identity vs the JVM
    expression pinned by tests/test_xxh64.py) replaces the per-batch
    createDataFrame+collect Spark job — the hash is on every cold query's
    critical path and the JVM round-trip dominated it."""
    missing = [s for s in strings if s not in _XXHASH_CACHE]
    if missing:
        from ckanext_extractor_spark.analysis.xxh64 import xxh64_str

        for s in missing:
            _XXHASH_CACHE[s] = xxh64_str(s)
    return {s: _XXHASH_CACHE[s] for s in strings}
