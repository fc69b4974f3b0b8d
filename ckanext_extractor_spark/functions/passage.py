"""Passage retrieval: BM25 over token-window chunks with per-document
collapse — the RAG retrieval shape (find the best PASSAGE, return one
row per doc ranked by its best passage, like Solr collapse/grouping
over a chunk index or a vector store's per-doc dedup).

Spark-first plan, deliberately shuffle-light:

* chunking reuses :func:`chunking.chunk_documents` (pure projection —
  zero shuffle);
* per-chunk term frequencies come from higher-order array expressions
  (``size(filter(toks, x -> x = term))``) — NO token explode, NO
  (chunk, term) shuffle; the scan stays one WholeStageCodegen pass
  with q extra integer columns (q = #query terms);
* chunk-corpus stats (N, avgdl) and per-term chunk dfs are ONE
  aggregate row folded back as a lazy broadcast cross join;
* BM25 (k1=1.2, b=0.75) per chunk = sum over matched terms of
  idf * tf-saturation — a pure projection;
* collapse = row_number window partitioned by doc (per-doc, fully
  parallel) keeping ``per_doc`` best passages, then a global top-k
  TakeOrdered.

Total wide operations at ANY corpus size: the two tiny aggregates, the
per-doc window, and the final top-k. Query-term count bounds the extra
column width, not the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.chunking import chunk_documents

BM25_K1 = 1.2
BM25_B = 0.75


def passage_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    size: int = 64,
    overlap: int = 0,
    k: int = 10,
    per_doc: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` passages for a disjunctive BM25 query over
    ``size``-token windows (stride ``size - overlap``), collapsed to at
    most ``per_doc`` passages per document (best-first).

    BM25 statistics are the CHUNK corpus's (N = number of chunks,
    avgdl = mean chunk length, df = chunks containing the term) — the
    standard passage-ranking formulation. Returns (id, chunk_id,
    n_tokens, score) with score = ROUND(bm25, 4), ranked by
    (ROUND(score, 6) DESC, id ASC, chunk_id ASC); only chunks matching
    at least one term appear. Ties collapse deterministically (lowest
    chunk_id wins within a doc)."""
    terms = list(dict.fromkeys(query_terms))
    if not terms or any(not isinstance(t, str) or not t for t in terms):
        raise ValueError(
            f"query_terms must be non-empty strings, got {query_terms!r}"
        )
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise ValueError(f"k must be a positive int, got {k!r}")
    if isinstance(per_doc, bool) or not isinstance(per_doc, int) \
            or per_doc < 1:
        raise ValueError(f"per_doc must be a positive int, got {per_doc!r}")
    chunks = chunk_documents(
        df, size=size, overlap=overlap, text_col=text_col, id_col=id_col
    )
    # chunk_text is array_join(normalized_tokens, " ") — split on the
    # single joining space recovers the token array exactly, without
    # re-paying lower() + the regex split per chunk (r5 review)
    toks = F.split(F.col("chunk_text"), " ")

    def _eq(term: str):
        # NB: a 2-arg lambda would get (element, index) from F.filter
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _eq(t))).cast("double").alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    base = chunks.select(
        F.col(id_col),
        "chunk_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_tokens").cast("double").alias("_dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("double").alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            1.0 + (F.col("_n") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        sat = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("_dl") / F.col("_avgdl"))
        )
        contribs.append(F.when(tf > 0, idf * sat).otherwise(F.lit(0.0)))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    scored = (
        base.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col), "chunk_id", "n_tokens", score.alias("_s")
        )
        .where(F.col("_s") > 0.0)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("_s"), 6).desc(), F.col("chunk_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_doc)
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_tokens",
            F.round("_s", 4).alias("score"),
        )
        .orderBy(
            F.round(F.col("score"), 6).desc(),
            F.col(id_col).asc(),
            F.col("chunk_id").asc(),
        )
        .limit(k)
    )
