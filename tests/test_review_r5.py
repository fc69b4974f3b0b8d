"""Round-5 self-review regressions (code-review findings, each fixed):

1. ivf_topk/ivfpq_topk driver-side probe ranking raised
   ZeroDivisionError on zero-norm query/centroid vectors.
2. bm25_search_synonyms silently dropped multi-token synonyms when the
   caller did not pass phrase_rows.
3. nb-train/nb-classify dim mismatch silently joined wrong log-probs.
4. kmeans_centroids localCheckpointed the whole corpus even at
   rounds=0 where the frame is scanned once (plan-shape fix; pinned
   here by identical results only).
"""

from __future__ import annotations

import math

import pytest

from ckanext_extractor_spark.functions.classify import nb_classify, nb_train
from ckanext_extractor_spark.functions.similarity import (
    ivf_topk,
    kmeans_centroids,
    rank_centroids,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_rank_centroids_zero_query_raises():
    with pytest.raises(ValueError):
        rank_centroids([[1.0, 0.0]], [0.0, 0.0], 1)


def test_rank_centroids_zero_centroid_never_wins():
    cents = [[0.0, 0.0], [0.0, 1.0], [1.0, 0.0]]
    assert rank_centroids(cents, [1.0, 0.1], 2) == [2, 1]
    # even a NEGATIVE-cosine centroid beats the zero-norm one
    assert rank_centroids([[0.0, 0.0], [-1.0, 0.0]], [1.0, 0.0], 2) \
        == [1, 0]


def test_ivf_topk_zero_centroid_survives(spark):
    # a degenerate all-zero centroid must not crash the query
    emb = _emb_df(spark, [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]])
    out = ivf_topk(emb, [1.0, 0.0], k=2, nprobe=1,
                   centroids=[[0.0, 0.0], [1.0, 0.05]]).collect()
    assert [r["vec_id"] for r in out] == [0, 1]


def test_ivfpq_zero_query_raises(spark):
    from ckanext_extractor_spark.functions.projection import (
        ivfpq_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = _emb_df(spark, [[1.0, 0.0], [0.0, 1.0]])
    books = pq_codebooks(emb, m=1, n_codes=2)
    codes = pq_encode(emb, books)
    with pytest.raises(ValueError):
        ivfpq_topk(codes, books, [0.0, 0.0], nprobe=1, embeddings=emb,
                   n_clusters=2)


def test_multiword_synonym_without_phrase_rows_raises(spark):
    from ckanext_extractor_spark.operators.query import (
        bm25_search_synonyms,
    )

    postings = spark.createDataFrame(
        [(1, "spark", 2, 10)], "doc_id long, term string, tf long, "
                               "doc_len long")
    dictionary = spark.createDataFrame(
        [("spark", 1)], "term string, df long")
    with pytest.raises(ValueError, match="phrase_rows"):
        bm25_search_synonyms(
            postings, dictionary, 1, 10.0, "spark",
            {"spark": ["merge join"]})
    # single-token synonyms still fine without phrase_rows
    out = bm25_search_synonyms(
        postings, dictionary, 1, 10.0, "spark", {"spark": ["flink"]})
    assert out.count() == 1


def test_nb_dim_mismatch_raises(spark):
    df = spark.createDataFrame(
        [(0, "aaa bbb", "x"), (1, "ccc ddd", "y")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(df, dim=128)
    with pytest.raises(ValueError, match="dim=128"):
        nb_classify(df, model, dim=64)
    # matching dim passes and the recorded row does not perturb scores
    out = {r["doc_id"]: r["pred_label"]
           for r in nb_classify(df, model, dim=128).collect()}
    assert out == {0: "x", 1: "y"}


def test_kmeans_rounds0_results_unchanged(spark):
    emb = _emb_df(spark, [[1.0, 0.0], [0.0, 1.0], [0.9, 0.1]])
    cents = kmeans_centroids(emb, n_clusters=2, rounds=0)
    assert cents == [[1.0, 0.0], [0.0, 1.0]]  # pinned smallest-id seeds
    one = kmeans_centroids(emb, n_clusters=2, rounds=1)
    # round 1 still checkpoint-backed; mean of cluster-0 members
    assert one[0] == pytest.approx([0.95, 0.05])
