"""Lucene SpanFirstQuery: single-term span constrained to analyzer
positions < end. Matching docs keep their normal single-term BM25
score — the position constraint changes the match set, never scores.
Reference analog: Solr/Lucene SpanFirstQuery over the `text` field the
reference's schema copies everything into (schema.xml:161,188)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.phrase import span_first_filter_docs

DOCS = [
    ("r", "p0", "c0", "python", "alpha beta gamma"),        # alpha @ 0
    ("r", "p1", "c1", "python", "beta alpha"),              # alpha @ 1
    ("r", "p2", "c2", "python", "beta gamma delta alpha"),  # alpha @ 3
    ("r", "p3", "c3", "python", "def alpha"),               # stopword gap: @ 1
    ("r", "p4", "c4", "python", "beta gamma"),              # no alpha
]

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spanfirst"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="sf")
    return eng


def _paths(eng, hits):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    by_id = {r["doc_id"]: r["path"] for r in rows}
    return sorted(by_id[d] for d, _ in hits)


def test_end_one_matches_only_position_zero(engine):
    assert _paths(engine, engine.span_first_search("alpha", end=1)) == ["p0"]


def test_stopword_gap_counts_as_position(engine):
    # "def alpha": def removed at index time but leaves a gap, so alpha
    # sits at position 1 — inside end=2, outside end=1
    assert _paths(engine, engine.span_first_search("alpha", end=2)) == [
        "p0", "p1", "p3",
    ]
    assert "p3" not in _paths(engine, engine.span_first_search("alpha", end=1))


def test_large_end_equals_plain_search(engine):
    span = engine.span_first_search("alpha", end=1000)
    plain = engine.search("alpha", k=10)
    assert span == plain


def test_scores_identical_to_search(engine):
    plain = dict(engine.search("alpha", k=10))
    for d, s in engine.span_first_search("alpha", end=2):
        assert s == pytest.approx(plain[d], abs=1e-9)


def test_no_match_term_empty(engine):
    assert engine.span_first_search("zzznope", end=5) == []


def test_multi_term_query_rejected(engine):
    with pytest.raises(ValidationError):
        engine.span_first_search("alpha beta", end=5)


def test_end_validation(engine):
    for bad in (0, -1, "5", 1.5, True):
        with pytest.raises(ValidationError):
            engine.span_first_search("alpha", end=bad)


def test_delete_purges_span_matches(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spanfirst_del"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="sfd")
    rows = spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    ids = {r["path"]: r["doc_id"] for r in rows}
    eng.delete([ids["p0"]])
    assert _paths(eng, eng.span_first_search("alpha", end=2)) == ["p1", "p3"]


def test_filter_kernel_first_position_only():
    # kernel unit: only the FIRST occurrence decides (Lucene span end)
    import numpy as np

    class Row(dict):
        pass

    # fabricate via the public decode path is engine-tested above; here
    # pin the pure selection given decoded position maps
    merged = {1: np.array([0, 9]), 2: np.array([4]), 3: np.array([7])}
    import ckanext_extractor_spark.operators.phrase as ph

    orig = ph._positions_by_doc
    try:
        ph._positions_by_doc = lambda row, dead: merged
        out = span_first_filter_docs([1, 2, 3], {"t": [object()]}, "t", 5)
        assert out == [1, 2]
    finally:
        ph._positions_by_doc = orig
