"""Multi-term and range leaves in the boolean query language — the
Lucene classic-QueryParser rewrites: ``te*t`` (WildcardQuery), ``term~n``
(FuzzyQuery, ``~`` = maxEdits 2), ``field:[a TO b]`` (TermRangeQuery,
constant-score). Wildcard/fuzzy leaves rewrite to a scoring-boolean OR
over concrete index terms BEFORE evaluation (rewrite_expansions —
Lucene MultiTermQuery rewrite); range clauses compare the RAW metadata
value lexicographically (the reference's dynamic fields are Solr
strings, schema.xml:161) and score ``1.0 * boost`` per match."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    # (repo, path, commit, lang, content, metadata)
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma",
     {"Source_Name": ["web"], "Lang": ["en"]}),
    ("r/a", "p1", "c1", "markdown", "alpha beta",
     {"Source_Name": ["web"], "Lang": ["de"]}),
    ("r/a", "p2", "c2", "markdown", "alpha delta",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p3", "c3", "markdown", "beta gamma delta",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p4", "c4", "markdown", "delta epsilon",
     {"Source_Name": ["wiki"], "Lang": ["en"]}),
    ("r/a", "p5", "c5", "markdown", "alphabet alpha soup",
     {"Source_Name": ["wiki"], "Lang": ["de"]}),
    ("r/a", "p6", "c6", "markdown", "epsilon zeta",
     {"Source_Name": ["deep web"], "Lang": ["en"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exprmulti"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="em")
    eng.warm()
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_pure_wildcard_expr_matches_wildcard_search(engine):
    # 'alph*' expands to {alpha, alphabet}; the expr leaf must score
    # exactly the engine's pinned wildcard rewrite (per-expansion idf)
    got = engine.search_expr("alph*", k=10)
    want = engine.wildcard_search("alph*", k=10)
    assert got == want and got


def test_wildcard_composes_with_body_term(engine):
    ids = _ids(engine)
    plain = dict(engine.search_expr("beta", k=10))
    wc = dict(engine.search_expr("alph*", k=10))
    got = dict(engine.search_expr("alph* AND beta", k=10))
    # alph* docs: p0,p1,p2,p5; beta docs: p0,p1,p3
    assert set(got) == {ids["p0"], ids["p1"]}
    for d in got:
        assert got[d] == pytest.approx(wc[d] + plain[d], rel=1e-12)


def test_pure_fuzzy_expr_matches_fuzzy_search(engine):
    # beta~1 expands to {beta, zeta} (zeta is 1 substitution away)
    got = engine.search_expr("beta~1", k=10)
    want = engine.fuzzy_search("beta", k=10, max_edits=1)
    assert got == want and got
    matched = {d for d, _ in got}
    ids = _ids(engine)
    assert ids["p6"] in matched  # via zeta


def test_bare_tilde_defaults_to_two_edits(engine):
    got = engine.search_expr("beta~", k=10)
    want = engine.fuzzy_search("beta", k=10, max_edits=2)
    assert got == want
    # delta is 2 edits from beta: present at ~ but not at ~1
    ids = _ids(engine)
    assert {d for d, _ in got} > {d for d, _ in engine.search_expr("beta~1", k=10)}
    assert ids["p4"] in {d for d, _ in got}


def test_tilde_zero_is_exact_term(engine):
    assert engine.search_expr("beta~0", k=10) == \
        engine.search_expr("beta", k=10)


def test_empty_expansion_matches_nothing_not_error(engine):
    assert engine.search_expr("zz*", k=10) == []
    assert engine.search_expr("alpha OR zz*", k=10) == \
        engine.search_expr("alpha", k=10)


def test_wildcard_boost_scales_contribution(engine):
    base = dict(engine.search_expr("alph*", k=10))
    boosted = dict(engine.search_expr("alph*^3", k=10))
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(3.0 * s, rel=1e-12)


def test_range_clause_matches_and_scores_constant(engine):
    ids = _ids(engine)
    got = dict(engine.search_expr("lang:[de TO de]", k=10))
    assert got == {ids["p1"]: 1.0, ids["p5"]: 1.0}
    boosted = dict(engine.search_expr("lang:[de TO de]^3", k=10))
    assert boosted == {ids["p1"]: 3.0, ids["p5"]: 3.0}


def test_range_bounds_exclusive_and_open(engine):
    ids = _ids(engine)
    # {de TO en] excludes the lower bound
    got = {d for d, _ in engine.search_expr("lang:{de TO en]", k=10)}
    assert got == {ids[p] for p in ("p0", "p2", "p3", "p4", "p6")}
    # open lower bound
    lo = {d for d, _ in engine.search_expr("lang:[* TO de]", k=10)}
    assert lo == {ids["p1"], ids["p5"]}
    # exists form
    ex = {d for d, _ in engine.search_expr("lang:[* TO *]", k=10)}
    assert len(ex) == len(DOCS)


def test_range_composes_with_body_term(engine):
    ids = _ids(engine)
    plain = dict(engine.search_expr("alpha", k=10))
    # raw source-name values: web, book, wiki, 'deep web';
    # [web TO wiki] keeps web + wiki only (lexicographic)
    got = dict(engine.search_expr(
        "alpha AND source-name:[web TO wiki]", k=10))
    assert set(got) == {ids["p0"], ids["p1"], ids["p5"]}
    for d in got:
        assert got[d] == pytest.approx(plain[d] + 1.0, rel=1e-12)


def test_negated_range_filters_without_scoring(engine):
    ids = _ids(engine)
    plain = dict(engine.search_expr("alpha", k=10))
    got = dict(engine.search_expr("alpha -lang:[de TO de]", k=10))
    assert set(got) == {ids["p0"], ids["p2"]}
    for d, s in got.items():
        assert s == pytest.approx(plain[d], rel=1e-12)


def test_multiterm_syntax_rejections(engine):
    with pytest.raises(ValidationError, match="wildcard and fuzzy"):
        engine.search_expr("te*t~1", k=10)
    with pytest.raises(ValidationError, match="wildcard/fuzzy field"):
        engine.search_expr("lang:de*", k=10)
    with pytest.raises(ValidationError, match="malformed range"):
        engine.search_expr("lang:[de TO]", k=10)
    with pytest.raises(ValidationError, match="max_edits"):
        engine.search_expr("beta~5", k=10)
    with pytest.raises(ValidationError, match="pure-negative"):
        engine.search_expr("alpha OR -lang:[de TO de]", k=10)


def test_range_without_metadata_matches_nothing(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exprmultinometa"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50)
    eng.extract(
        spark.createDataFrame(DOCS, SCHEMA).select(
            "repo", "path", "commit", "lang", "content"
        ),
        build_id="emn",
    )
    assert eng.search_expr("alpha AND lang:[a TO z]", k=10) == []
    assert eng.search_expr("alpha OR lang:[a TO z]", k=10) == \
        eng.search_expr("alpha", k=10)
