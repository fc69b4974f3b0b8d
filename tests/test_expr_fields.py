"""Fielded clauses in the boolean query language (Lucene classic
QueryParser ``field:value`` syntax — the reference's dynamic metadata
fields answer exactly this through Solr, plugin.py:40,140 /
schema.xml:161). A fielded leaf matches docs whose extracted-metadata
field contains ALL field-analyzed value tokens (search_field semantics)
and scores per-field BM25 (the dismax statistics) times its boost;
unknown fields match nothing; fielded phrases are rejected (field
postings carry no positions, pinned)."""

from __future__ import annotations

import math

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
    root = str(tmp_path_factory.mktemp("exprfield"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ef")
    eng.warm()
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def _field_bm25(eng, field, token, doc_path, k1=1.2, b=0.75):
    """Independent per-field BM25 for a single-token value, straight
    from the field_postings parquet."""
    fp = [
        (r["doc_id"], r["term"], r["tf"])
        for r in eng.spark.read.parquet(
            eng._p("field_postings")
        ).where(f"field = '{field}'").collect()
    ]
    ids = _ids(eng)
    doc_id = ids[doc_path]
    dl = {}
    for d, _t, tf in fp:
        dl[d] = dl.get(d, 0) + tf
    n, avgdl = len(dl), sum(dl.values()) / len(dl)
    df = sum(1 for d, t, _ in fp if t == token)
    tf = next(tf for d, t, tf in fp if d == doc_id and t == token)
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[doc_id] / avgdl))


def test_field_clause_filters_and_scores_per_field_bm25(engine):
    ids = _ids(engine)
    got = dict(engine.search_expr("lang:de", k=10))
    assert set(got) == {ids["p1"], ids["p5"]}
    for p in ("p1", "p5"):
        assert got[ids[p]] == pytest.approx(
            _field_bm25(engine, "lang", "de", p), rel=1e-9
        )


def test_field_clause_conjoins_with_body_terms(engine):
    ids = _ids(engine)
    body = dict(engine.search_expr("alpha", k=10))
    got = dict(engine.search_expr("alpha AND lang:en", k=10))
    # alpha docs: p0,p1,p2,p5; lang=en: p0,p2,p3,p4,p6
    assert set(got) == {ids["p0"], ids["p2"]}
    for p in ("p0", "p2"):
        want = body[ids[p]] + _field_bm25(engine, "lang", "en", p)
        assert got[ids[p]] == pytest.approx(want, rel=1e-9)


def test_field_boost_multiplies_contribution(engine):
    base = dict(engine.search_expr("lang:de", k=10))
    boosted = dict(engine.search_expr("lang:de^2", k=10))
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(2.0 * s, rel=1e-12)


def test_multitoken_field_value_is_conjunctive(engine):
    ids = _ids(engine)
    # 'deep-web' field-analyzes to [deep, web]: only p6 has both tokens
    # in source-name; plain 'web' also matches p0/p1
    got = {d for d, _ in engine.search_expr("source-name:deep-web", k=10)}
    assert got == {ids["p6"]}
    web = {d for d, _ in engine.search_expr("source-name:web", k=10)}
    assert web == {ids["p0"], ids["p1"], ids["p6"]}


def test_negated_field_clause_filters_without_scoring(engine):
    ids = _ids(engine)
    plain = dict(engine.search_expr("alpha", k=10))
    got = dict(engine.search_expr("alpha -lang:de", k=10))
    assert set(got) == {ids["p0"], ids["p2"]}
    for d, s in got.items():
        assert s == pytest.approx(plain[d], rel=1e-12)


def test_unknown_field_matches_nothing(engine):
    assert engine.search_expr("alpha AND nosuch:x", k=10) == []
    # OR with an empty fielded side degrades to the body term alone
    assert engine.search_expr("alpha OR nosuch:x", k=10) == \
        engine.search_expr("alpha", k=10)


def test_pure_field_query_builds_its_own_universe(engine):
    ids = _ids(engine)
    got = {d for d, _ in engine.search_expr("source-name:book", k=10)}
    assert got == {ids["p2"], ids["p3"]}


def test_fielded_phrase_and_empty_value_rejected(engine):
    with pytest.raises(ValidationError, match="fielded phrases"):
        engine.search_expr('source-name:"deep web"', k=10)
    with pytest.raises(ValidationError, match="needs a value"):
        engine.search_expr("lang: de", k=10)
    with pytest.raises(ValidationError, match="pure-negative"):
        engine.search_expr("alpha OR -lang:en", k=10)


def test_field_clause_respects_deletes(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exprfielddel"))
    eng = ExtractorEngine(
        spark, root, n_buckets=4, salt_threshold=50,
        indexed_fields=("lang",),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="efd")
    ids = _ids(eng)
    before = {d for d, _ in eng.search_expr("lang:de", k=10)}
    assert before == {ids["p1"], ids["p5"]}
    eng.delete([ids["p1"]])
    after = {d for d, _ in eng.search_expr("lang:de", k=10)}
    assert after == {ids["p5"]}


def test_store_without_field_postings_matches_nothing(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("exprnofields"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50)
    eng.extract(
        spark.createDataFrame(DOCS, SCHEMA).select(
            "repo", "path", "commit", "lang", "content"
        ),
        build_id="efn",
    )
    assert eng.search_expr("alpha AND lang:en", k=10) == []
    assert eng.search_expr("alpha OR lang:en", k=10) == \
        eng.search_expr("alpha", k=10)
