"""Inverted-index build pipeline (SURVEY.md §2.1, §2.4, §2.6).

Dataflow (entry point A, SURVEY.md §3.1):

    corpus (repo,path,commit,lang,content)
      -> prepare_corpus: doc_id, content_sha256, size_bytes, lang filter
      -> tokenize_postings: ONE mapInPandas kernel emitting per-doc
         pre-aggregated postings (term, doc_id, tf, positions, doc_len)
      -> build_dictionary / build_doc_stats / build_corpus_stats
      -> segments (operators/segments.py): skew-salted repartition +
         delta+varbyte encoded posting blobs with block-max metadata

Scale notes (the design points that matter at 100 TB, not at sf0.01):
  * The tokenizer kernel pre-aggregates (term, doc) INSIDE each Arrow
    batch, so the only token-granularity data ever in flight lives in a
    pandas frame; Spark shuffles posting rows, not token rows.
  * (term, doc_id) pairs are already unique coming out of the kernel —
    there is NO groupBy-to-build-postings shuffle at all.  The only wide
    exchanges in the whole build are (a) the dictionary aggregation,
    which Catalyst executes partial+final so only per-partition partial
    (term, df, cf) rows shuffle, and (b) the salted repartition that
    feeds segment encoding.
  * Filters (lang pruning) sit before the UDF so Catalyst pushes them
    into the parquet scan (reference analog: format filter before any
    download, action.py:124,135 / config.py:94-112).
"""

from __future__ import annotations

import fnmatch
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    AnalyzerConfig,
    postings_for_batch,
)

# positions is BINARY: per-(doc, term) gap+varbyte-encoded position list
# (the segment codec's exact byte layout — see tokenizer.postings_for_batch)
POSTINGS_SCHEMA = (
    "doc_id long, term string, tf long, positions binary, doc_len long"
)

BM25_K1 = 1.2
BM25_B = 0.75


def glob_filter_expr(col: Column, patterns: Iterable[str]) -> Column:
    """Case-insensitive fnmatch-any predicate as a Catalyst expression.

    Re-expresses the reference's `_any_match` (config.py:94-105, used for
    `indexed_formats`/`indexed_fields`) so lang pruning stays JVM-side and
    pushes down to the scan.
    """
    pats = [p.lower() for p in patterns]
    if not pats or any(p == "*" for p in pats):
        return F.lit(True)
    # \A-anchor every branch: fnmatch.translate only emits the END
    # anchor (\Z) and rlike has search semantics, so without it any
    # lang whose SUFFIX matches a pattern would pass (lang='numpy'
    # vs pattern 'py' — code-review r5 finding)
    regex = "|".join(f"(?:\\A{fnmatch.translate(p)})" for p in pats)
    return F.lower(col).rlike(regex)


def prepare_corpus(
    corpus: DataFrame,
    indexed_langs: Iterable[str] = ("*",),
) -> DataFrame:
    """Assign doc identity + fidelity columns and prune non-indexed langs.

    doc_id = xxhash64(repo, path, commit): stable, partitioning-independent.
    content_sha256: the per-row extraction-fidelity invariant (input_hint),
    playing the role of the reference's last_url/last_format change
    detection (logic/action.py:129-133).
    """
    return (
        corpus.where(glob_filter_expr(F.col("lang"), indexed_langs))
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("size_bytes", F.octet_length("content"))
    )


def tokenize_postings(
    corpus: DataFrame,
    config: AnalyzerConfig = INDEX_CONFIG,
    content_col: str = "content",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The analysis kernel: corpus -> per-doc pre-aggregated postings.

    One mapInPandas over Arrow batches (SURVEY.md T1-T5 in a single UDF);
    output rows are unique on (term, doc_id) by construction.
    """
    cols = [id_col, content_col, lang_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            agg = postings_for_batch(pdf[content_col], pdf[lang_col], config)
            if agg.empty:
                continue
            agg["doc_id"] = pdf[id_col].to_numpy()[agg["idx"].to_numpy()]
            yield agg[["doc_id", "term", "tf", "positions", "doc_len"]]

    return corpus.select(*cols).mapInPandas(kernel, schema=POSTINGS_SCHEMA)


def build_doc_stats(
    prepared: DataFrame,
    postings: DataFrame,
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """Per-doc metadata table (reference analog: ResourceMetadatum EAV rows,
    model.py:117-127, collapsed to the fixed columns a code corpus needs).

    Docs whose analysis emitted zero tokens keep doc_len=0 — they are part
    of N and avgdl, matching the oracle's definition.

    ``doc_lens`` — optional (doc_id, doc_len) table (the tokenize kernel's
    per-doc marker rows). When given, the doc_len join reads ~N_docs rows
    instead of aggregating the full posting table (a non-scaling re-scan
    at scale).
    """
    lens = (
        doc_lens
        if doc_lens is not None
        else postings.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
    )
    meta_cols = [
        c for c in ("doc_id", "repo", "path", "commit", "lang",
                    "content_sha256", "size_bytes", "metadata")
        if c in prepared.columns
    ]
    return (
        prepared.select(*meta_cols)
        .join(lens, "doc_id", "left")
        .withColumn("doc_len", F.coalesce("doc_len", F.lit(0)))
    )


def build_dictionary(postings: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Term dictionary: df (doc freq), cf (collection freq), term_bucket.

    Partial+final hash aggregation via Catalyst; the shuffle carries only
    per-partition partial aggregates (term cardinality ≪ posting count).
    """
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("term_bucket"),
    )


def build_corpus_stats(doc_stats: DataFrame) -> DataFrame:
    """Singleton stats row: N, avgdl, total_tokens, total_bytes."""
    return doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
        F.sum("size_bytes").alias("total_bytes"),
    )
