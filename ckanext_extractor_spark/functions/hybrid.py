"""Hybrid retrieval: reciprocal-rank fusion (RRF) of lexical (BM25)
and dense (embedding-cosine) result lists.

The modern retrieval stack a reference user migrating off Solr would
reach for next: run BM25 over the inverted index AND approximate
cosine over an embedding column, then fuse the two rankings without
score calibration. RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is
the standard fusion rule precisely because it is scale-free:

    rrf(d) = sum_i  w_i / (k + rank_i(d))

so a BM25 score of 17.3 and a cosine of 0.91 never need to share a
unit — only their RANKS matter. Elasticsearch/OpenSearch ship exactly
this rule for their hybrid endpoints (k = 60 default, same here).

Spark-first shape: each input list is ranked with a row_number window
ordered by (ROUND(score, 6) DESC, id ASC) — the same rounded-score
tie-break every top-k surface in this repo pins, so fusion is
deterministic across engines and partitionings. The fused score is one
union + one hash aggregate.

Scale note: RRF is defined over RETRIEVED lists (top-N per system),
not whole corpora — inputs are expected to be top-N results (hundreds
to thousands of rows), so the un-partitioned ranking window is a
single small sort per list, and the union/agg is trivial.
``max_list_rows`` bounds each list IN-PLAN (rank <= cap after the
ranking window) so a misused full-corpus score table degrades to a
spilling single-partition sort followed by a hard truncation rather
than an unbounded fusion — no extra action, no double execution of
the (possibly expensive) retrieval legs.

Reference parity anchor: the reference exposes one ranked list via
Solr (`plugin.py` search hooks); this module is the composition layer
the reference delegates to Solr's single ranker — fusion itself has no
reference analog and follows the public RRF formulation.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # Cormack et al. 2009 / Elasticsearch default


def rrf_fuse(
    ranked: Sequence[DataFrame],
    k: int = RRF_K,
    weights: Optional[Sequence[float]] = None,
    topk: Optional[int] = None,
    id_col: str = "doc_id",
    score_col: str = "score",
    max_list_rows: int = 1_000_000,
) -> DataFrame:
    """Fuse N ranked result lists into (id, rrf_score, n_lists).

    Each input needs (id_col, score_col). Ranks are 1-based per list,
    ordered by (ROUND(score, 6) DESC, id ASC). A doc absent from a
    list simply contributes nothing for that list (the standard RRF
    convention). ``weights`` scales each list's contribution
    (convex-combination hybrid tuning); default all-1.0.

    Output: id, rrf_score = ROUND(sum w_i/(k + rank_i), 6), n_lists =
    number of lists containing the doc; ordered by (rrf_score DESC,
    id ASC), optionally LIMIT topk.

    Rows ranked beyond ``max_list_rows`` are dropped in-plan (they
    would contribute < w/(k + cap) anyway); retrieved top-N inputs
    never hit the cap.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    if weights is None:
        weights = [1.0] * len(ranked)
    if len(weights) != len(ranked):
        raise ValueError(
            f"{len(weights)} weights for {len(ranked)} lists"
        )
    contribs = []
    order = Window.orderBy(
        F.round(F.col(score_col), 6).desc(), F.col(id_col).asc()
    )
    if max_list_rows < 1:
        raise ValueError(f"max_list_rows must be >= 1, got {max_list_rows!r}")
    for w, df in zip(weights, ranked):
        contribs.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.row_number().over(order).alias("_rank"),
            )
            .where(F.col("_rank") <= max_list_rows)
            .select(
                "_id",
                (
                    F.lit(float(w)) / (F.lit(k) + F.col("_rank"))
                ).alias("_c"),
            )
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    out = (
        allc.groupBy("_id")
        .agg(
            F.round(F.sum("_c"), 6).alias("rrf_score"),
            F.count("*").cast("int").alias("n_lists"),
        )
        .select(
            F.col("_id").alias(id_col), "rrf_score", "n_lists"
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    )
    if topk is not None:
        out = out.limit(topk)
    return out


def hybrid_topk(
    lexical: DataFrame,
    dense: DataFrame,
    topk: Optional[int] = 10,
    k: int = RRF_K,
    lexical_weight: float = 1.0,
    dense_weight: float = 1.0,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Two-list convenience wrapper: BM25 hits + ANN hits -> fused
    top-k. Exactly ``rrf_fuse([lexical, dense], ...)``."""
    return rrf_fuse(
        [lexical, dense],
        k=k,
        weights=[lexical_weight, dense_weight],
        topk=topk,
        id_col=id_col,
        score_col=score_col,
    )
