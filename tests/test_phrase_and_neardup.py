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


# -- ordered proximity (slop) ------------------------------------------------


def test_slop_zero_equals_phrase(engine):
    ids = _doc_ids_by_path(engine)
    # alpha..gamma consecutive only in p1 (beta alpha gamma delta)
    got = {d for d, _ in engine.phrase_search("alpha gamma", k=10, slop=0)}
    assert got == {ids["p1"]}


def test_slop_widens_window(engine):
    ids = _doc_ids_by_path(engine)
    # slop=1: p0 alpha@0..gamma@2 (1 intervening), p3 alpha@2..gamma@4,
    # p4 alpha@0..gamma@2 across the split identifier; p2 needs slop=2
    got1 = {d for d, _ in engine.phrase_search("alpha gamma", k=10, slop=1)}
    assert got1 == {ids["p0"], ids["p1"], ids["p3"], ids["p4"]}
    got2 = {d for d, _ in engine.phrase_search("alpha gamma", k=10, slop=2)}
    assert got2 == got1 | {ids["p2"]}


def test_slop_bridges_stopword_gap(engine):
    ids = _doc_ids_by_path(engine)
    # p5 'alpha def beta' (python): def leaves a gap at position 1 —
    # slop=0 must not match across it (pinned), slop=1 must
    got0 = {d for d, _ in engine.phrase_search("alpha beta", k=10, slop=0)}
    assert ids["p5"] not in got0
    got1 = {d for d, _ in engine.phrase_search("alpha beta", k=10, slop=1)}
    assert ids["p5"] in got1


def test_slop_is_ordered(engine):
    ids = _doc_ids_by_path(engine)
    # window is ORDERED: beta must come after alpha's match
    got = {d for d, _ in engine.phrase_search("beta alpha", k=10, slop=5)}
    assert got == {ids["p1"], ids["p3"]}


def test_slop_distributed_matches_driver(engine):
    for q, s in [("alpha gamma", 1), ("alpha gamma", 2),
                 ("alpha beta", 1), ("beta alpha", 5)]:
        drv = engine.phrase_search(q, k=10, slop=s)
        dist = engine.phrase_search(q, k=10, slop=s, distributed=True)
        assert drv == dist, (q, s, drv, dist)


def test_slop_validation(engine):
    from ckanext_extractor_spark.api import ValidationError

    for bad in (-1, 1.5, "2", True):
        with pytest.raises(ValidationError):
            engine.phrase_search("alpha beta", slop=bad)


# -- negative terms (Lucene MUST_NOT / Solr -term) ---------------------------


def test_exclude_filters_docs(engine):
    ids = _doc_ids_by_path(engine)
    base = {d for d, _ in engine.search("alpha", k=10)}
    got = {d for d, _ in engine.search("alpha", k=10, exclude="gamma")}
    # every doc with gamma dropped; p5 ('alpha def beta') is gamma-free
    assert got == {ids["p5"]}
    assert got < base


def test_exclude_does_not_rescore(engine):
    """A prohibited clause filters — surviving docs keep the exact score
    of the unfiltered query (Lucene MUST_NOT parity)."""
    full = dict(engine.search("alpha", k=10))
    got = engine.search("alpha", k=10, exclude="gamma")
    for d, s in got:
        assert abs(full[d] - s) < 1e-12


def test_exclude_mode_parity(engine):
    want = engine.search("alpha beta", k=10, exclude="zz")
    for mode in ("exact", "wand", "maxscore", "slow"):
        got = engine.search("alpha beta", k=10, exclude="zz", mode=mode)
        assert [d for d, _ in got] == [d for d, _ in want], mode
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9
    # disjunctive parity too (the lazy fast path must be bypassed)
    want_or = engine.search("alpha zz", k=10, exclude="gamma",
                            conjunctive=False)
    got_or = engine.search("alpha zz", k=10, exclude="gamma",
                           conjunctive=False, mode="slow")
    assert [d for d, _ in got_or] == [d for d, _ in want_or]


def test_exclude_edge_cases(engine):
    ids = _doc_ids_by_path(engine)
    # unknown excluded term: no-op
    assert engine.search("alpha", k=10, exclude="nosuchterm") == \
        engine.search("alpha", k=10)
    # excluding a positive term empties the result
    assert engine.search("alpha", k=10, exclude="alpha") == []
    # exclusion analyzed with the query chain: 'zzGamma' splits and
    # excludes both zz and gamma docs
    got = {d for d, _ in engine.search("alpha", k=10, exclude="zzGamma")}
    assert got == {ids["p5"]}


def test_exclude_validation(engine):
    from ckanext_extractor_spark.api import ValidationError

    with pytest.raises(ValidationError):
        engine.search("alpha", exclude="")
    with pytest.raises(ValidationError):
        engine.search("alpha", exclude="x", synonyms={"alpha": ["beta"]})


def test_sparse_phrase_fallback_routes_to_distributed(spark, tmp_path):
    """When phrase matches are sparser than k within the over-fetch
    window, the driver path delegates the full conjunctive verify to
    the vectorized distributed kernel (r5 prune follow-up) — pinned:
    the delegation happens AND the results equal an explicit
    distributed run."""
    import ckanext_extractor_spark.operators.phrase as ph

    # >100 docs hold both terms; only 3 hold them adjacently, and those
    # 3 are long docs (low BM25) so they sit beyond the top-100 window
    docs = []
    for i in range(120):
        docs.append(("r/a", f"n{i}", f"c{i}", "markdown",
                     f"alpha filler{i} beta"))
    for i in range(3):
        pad = " ".join(f"pad{j}" for j in range(60))
        docs.append(("r/a", f"m{i}", f"d{i}", "markdown",
                     f"{pad} alpha beta"))
    eng = ExtractorEngine(spark, str(tmp_path / "sparse"), n_buckets=8,
                          salt_threshold=10_000)
    eng.extract(spark.createDataFrame(
        docs, "repo string, path string, commit string, lang string, "
              "content string"), build_id="sp")
    eng.warm()
    called = {"n": 0}
    orig = ph.phrase_search_distributed

    def spy(*a, **kw):
        called["n"] += 1
        return orig(*a, **kw)

    ph.phrase_search_distributed = spy
    try:
        got = eng.phrase_search("alpha beta", k=10)
    finally:
        ph.phrase_search_distributed = orig
    assert called["n"] == 1
    want = eng.phrase_search("alpha beta", k=10, distributed=True)
    assert [d for d, _ in got] == [d for d, _ in want]
    ids = _doc_ids_by_path(eng)
    assert {d for d, _ in got} == {ids[f"m{i}"] for i in range(3)}
