"""Phrase retrieval (positions-aware AND) + embedding-cosine near-dup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.functions.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
)

DOCS = [
    # (repo, path, commit, lang, content)
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma delta"),
    ("r/a", "p1", "c1", "markdown", "beta alpha gamma delta"),  # scrambled
    ("r/a", "p2", "c2", "markdown", "zz alpha beta zz gamma"),  # partial phrase
    ("r/a", "p3", "c3", "markdown", "alpha beta alpha beta gamma"),  # repeat + tail match
    ("r/a", "p4", "c4", "markdown", "alphaBeta gamma"),  # split identifier -> alpha beta adjacent
    ("r/a", "p5", "c5", "python", "alpha def beta"),  # stopword gap between terms
    ("r/a", "p6", "c6", "markdown", "unrelated words entirely"),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("phraseidx"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    corpus = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    eng.extract(corpus, build_id="phrase")
    eng.warm()
    return eng


def _doc_ids_by_path(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_phrase_matches_consecutive_only(engine):
    ids = _doc_ids_by_path(engine)
    hits = engine.phrase_search("alpha beta gamma", k=10)
    got = {d for d, _ in hits}
    # p0: consecutive; p3: '... alpha beta gamma' tail; p1 scrambled no;
    # p2 has alpha beta but gamma not adjacent; p4: alphaBeta splits to
    # alpha(0) beta(1) with the catenated alphabeta INJECTED at posInc=0
    # (stacked on beta@1, classic WDF parity) so gamma stays at 2 ->
    # the phrase spans the split identifier and MATCHES
    assert got == {ids["p0"], ids["p3"], ids["p4"]}


def test_phrase_two_terms(engine):
    ids = _doc_ids_by_path(engine)
    got = {d for d, _ in engine.phrase_search("alpha beta", k=10)}
    assert ids["p0"] in got and ids["p3"] in got and ids["p2"] in got
    assert ids["p4"] in got  # alpha(0) beta(1) adjacent from the split
    assert ids["p1"] not in got  # 'beta alpha' is not 'alpha beta'


def test_phrase_stopword_gap_blocks(engine):
    """'alpha def beta' (python): def removed leaves a position gap, so
    the phrase 'alpha beta' must NOT match across it."""
    ids = _doc_ids_by_path(engine)
    got = {d for d, _ in engine.phrase_search("alpha beta", k=10)}
    assert ids["p5"] not in got


def test_phrase_scores_match_and_query(engine):
    """Phrase ranking = conjunctive BM25 scores of the same terms."""
    hits_p = engine.phrase_search("alpha beta gamma", k=10)
    hits_and = dict(engine.search("alpha beta gamma", k=100))
    for d, s in hits_p:
        assert abs(hits_and[d] - s) < 1e-12


def test_phrase_no_match(engine):
    assert engine.phrase_search("gamma alpha", k=10) == []
    assert engine.phrase_search("nosuchterm alpha", k=10) == []


@pytest.mark.parametrize(
    "q", ["alpha beta gamma", "alpha beta", "gamma alpha", "nosuchterm alpha"]
)
def test_phrase_distributed_matches_driver(engine, q):
    """Cluster-scale phrase plan (decode kernel -> doc_id exchange ->
    vectorized verify -> global top-k) ranks identically to the
    driver-side path, scores equal to 1e-9."""
    want = engine.phrase_search(q, k=10)
    got = engine.phrase_search(q, k=10, distributed=True)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(5)
    base = rng.normal(size=(40, 12)).astype(np.float64)
    base[11] = base[3] + 0.01 * rng.normal(size=12)  # planted near-dup
    base[22] = base[7] * 1.0  # exact dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_neardup_multitable_and_bucket_cap(emb):
    df, base = emb
    # coarse buckets (n_planes=2 -> 4/table) but 6 independent tables:
    # planted pairs must still collide in at least one family
    pairs = embedding_neardup_pairs(
        df, dim=12, threshold=0.98, n_planes=2, n_tables=6,
        max_bucket_size=40,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (3, 11) in got and (7, 22) in got
    # cap pinning: max_bucket_size=1 drops every >=2-vector bucket, so no
    # candidate pair can survive — the join is provably bounded by the cap
    none = embedding_neardup_pairs(
        df, dim=12, threshold=0.0, n_planes=2, n_tables=6, max_bucket_size=1
    )
    assert none.count() == 0


def test_embedding_neardup_pairs(emb):
    df, base = emb
    pairs = embedding_neardup_pairs(df, dim=12, threshold=0.98, n_planes=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (3, 11) in got
    assert (7, 22) in got
    # verify all returned pairs truly exceed the threshold (numpy oracle)
    for a, b in got:
        va, vb = base[a], base[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert cos >= 0.98 - 1e-6
