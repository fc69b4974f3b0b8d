"""Document chunking for training-data pipelines: token-window
splitting with overlap — the sample-windowing step that turns long
documents into model-sized training chunks.

Pure Catalyst (sequence -> posexplode -> slice -> array_join): no UDF,
no shuffle — chunking is embarrassingly parallel per input partition,
and output partitioning inherits the input's, so a 100 TB corpus chunks
in one map stage. Tokens come from the same simple lowercase
``[^a-z0-9]+`` splitter the textstats family uses (DuckDB-checkable);
swap in the code-aware analyzer upstream for identifier-aware windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.textstats import _tokens


def _h120(md5_col: Column) -> tuple[Column, Column]:
    """Split an md5 hex column into two 60-bit longs — a 16 B
    fixed-width exchange key whose birthday bound stays negligible at
    trillion-row shingle volumes (one 60-bit long would false-merge
    ~1e6 groups at 1e12 keys)."""
    return (
        F.conv(F.substring(md5_col, 1, 15), 16, 10)
        .cast("long").alias("_h1"),
        F.conv(F.substring(md5_col, 16, 15), 16, 10)
        .cast("long").alias("_h2"),
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each doc into token windows of ``size`` tokens starting
    every ``size - overlap`` tokens (the final window may be shorter).
    Returns (id, chunk_id, n_tokens, chunk_text); docs with zero
    tokens produce zero chunks (pinned). chunk_id counts windows from
    0 in token order."""
    if isinstance(size, bool) or not isinstance(size, int) or size <= 0:
        raise ValueError(f"size must be a positive int, got {size!r}")
    if isinstance(overlap, bool) or not isinstance(overlap, int) \
            or overlap < 0 or overlap >= size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size, got {overlap!r}"
        )
    stride = size - overlap
    base = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    starts = F.sequence(
        F.lit(0), F.size("_toks") - 1, F.lit(stride)
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def remove_repeated_segments(
    df: DataFrame,
    size: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-corpus boilerplate removal: split every doc into
    non-overlapping ``size``-token segments, count how many DISTINCT
    docs each segment occurs in corpus-wide, and drop every segment
    seen in >= ``min_docs`` docs (headers, license blocks, navigation
    chrome — the spans that repeat verbatim across pages). Returns
    (id, clean_text, n_segments, n_dropped_segments); docs whose
    segments are all boilerplate keep an empty clean_text, zero-token
    docs pass through unchanged.

    Shape for scale: one corpus-wide count shuffle keyed by the segment
    hash (md5 split into two 60-bit longs, 16 B fixed — segment strings
    never cross the exchange, and 120 bits keeps the birthday bound
    negligible even at ~1e12 segments, where a single 60-bit key would
    produce ~1e6 false merges) with partial distinct aggregation, one
    equi-join of the windows against the over-threshold hash set, one
    per-doc reassembly aggregate.
    Candidate volume is bounded by corpus tokens / size, never
    quadratic. The same pass with ``min_docs`` scaled to a ppm of
    corpus size is the 100 TB deployment shape.
    """
    if isinstance(min_docs, bool) or not isinstance(min_docs, int) \
            or min_docs < 2:
        raise ValueError(
            f"min_docs must be an int >= 2, got {min_docs!r}"
        )
    wins = chunk_documents(
        df, size=size, overlap=0, text_col=text_col, id_col=id_col
    ).select(
        F.col(id_col),
        "chunk_id",
        "chunk_text",
        *_h120(F.md5("chunk_text")),
    )
    hot = (
        wins.groupBy("_h1", "_h2")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h1", "_h2")
    )
    marked = wins.join(hot.withColumn("_drop", F.lit(True)),
                       ["_h1", "_h2"], "left")
    rebuilt = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_drop").isNull(),
                            F.struct(
                                F.col("chunk_id"), F.col("chunk_text")
                            ),
                        )
                    )
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_segments"),
        F.sum(
            F.when(F.col("_drop").isNotNull(), 1).otherwise(0)
        ).alias("n_dropped_segments"),
    )
    return (
        df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("n_segments").isNotNull(), F.col("clean_text"))
            .otherwise(F.array_join(F.col("_t"), " "))
            .alias("clean_text"),
            F.coalesce("n_segments", F.lit(0)).cast("long")
            .alias("n_segments"),
            F.coalesce("n_dropped_segments", F.lit(0)).cast("long")
            .alias("n_dropped_segments"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    size: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    OVERLAPPING ``size``-token shingle (stride 1 — unlike
    remove_repeated_segments' aligned windows, a duplicated span is
    found at ANY offset), hashed corpus-wide; spans whose shingle
    occurs in >= ``min_docs`` distinct docs come back as
    (id, start_pos, n_docs) rows in token coordinates, ready for a
    downstream trim/merge pass.

    Scale shape: shingle volume is ~1 row per corpus token (each
    position starts one shingle), so the count shuffle is linear in
    corpus tokens and keyed by the 120-bit (two-long) shingle hash —
    shingle strings never cross the exchange, and at trillion-shingle
    volumes the birthday bound stays negligible (a single 60-bit key
    would false-merge ~1e6 groups); the suffix-array machinery of
    the paper is replaced by the hash-count + equi-join Spark already
    parallelizes. Tail shingles shorter than ``size`` are not emitted
    (the paper's minimum-match-length floor)."""
    if isinstance(size, bool) or not isinstance(size, int) or size < 2:
        raise ValueError(f"size must be an int >= 2, got {size!r}")
    if isinstance(min_docs, bool) or not isinstance(min_docs, int) \
            or min_docs < 2:
        raise ValueError(f"min_docs must be an int >= 2, got {min_docs!r}")
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))
    starts = F.sequence(
        F.lit(0), F.size("_t") - F.lit(size), F.lit(1)
    )
    # posexplode carries _t through the generator so the slice+hash
    # happens in the same whole-stage-codegen pipeline — no self-join,
    # no shuffle before the count aggregate.
    shingles = (
        toks.where(F.size("_t") >= size)
        .select(
            F.col(id_col),
            F.col("_t"),
            F.posexplode(starts).alias("_i", "start_pos"),
        )
        .select(
            F.col(id_col),
            "start_pos",
            *_h120(
                F.md5(
                    F.array_join(
                        F.slice(
                            F.col("_t"), F.col("start_pos") + 1, size
                        ),
                        " ",
                    )
                )
            ),
        )
    )
    hot = (
        shingles.groupBy("_h1", "_h2")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    return shingles.join(hot, ["_h1", "_h2"]).select(
        F.col(id_col),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )
