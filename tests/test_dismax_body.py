"""edismax qf including the MAIN content index (`_text_` pseudo-field) —
Solr's usual qf shape (catch-all text + boosted metadata fields,
reference schema.xml:161). Closes the r3-pinned divergence 'the engine's
main content index is not a qf target'."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

NOMATCH = "qqqzzz"

DOCS = [
    # Tag = first body word (so some terms live in BOTH body and field)
    ("r/a", "p0", "c0", "markdown", "spark alpha beta",
     {"Tag": ["spark"], "Lang": ["python"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Tag": ["alpha"], "Lang": ["java"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream stream",
     {"Tag": ["spark"], "Lang": ["python"]}),
    ("r/a", "p3", "c3", "markdown", "join stream",
     {"Tag": ["join"], "Lang": ["rust"]}),
    ("r/a", "p4", "c4", "markdown", "plain words only",
     {"Tag": ["plain"], "Lang": ["python"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = ExtractorEngine(
        spark, str(tmp_path_factory.mktemp("dmbody")), n_buckets=4,
        salt_threshold=50, analyzer=SIMPLE_CONFIG,
        indexed_fields=("tag", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="db")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _body(engine, q):
    """Disjunctive per-doc body scores under the distributed scored-head
    convention (pre-merge docFreq idf)."""
    return dict(engine.boost_query_search(
        q, NOMATCH, k=100, weight=0.0, conjunctive=False))


def _field(engine, q, field, w=1.0):
    return dict(engine.dismax_search(q, {field: w}, k=100))


def test_body_only_qf_equals_plain_bm25(engine):
    got = dict(engine.dismax_search("spark join", {"_text_": 1.0}, k=100))
    want = _body(engine, "spark join")
    assert set(got) == set(want)
    for d, s in got.items():
        assert s == pytest.approx(want[d])


def test_body_boost_scales(engine):
    one = dict(engine.dismax_search("spark", {"_text_": 1.0}, k=100))
    three = dict(engine.dismax_search("spark", {"_text_": 3.0}, k=100))
    for d, s in three.items():
        assert s == pytest.approx(3.0 * one[d])


def test_disjoint_fields_sum(engine, ids):
    # 'python' lives only in lang; 'stream' only in the body
    got = dict(engine.dismax_search(
        "stream python", {"_text_": 1.0, "lang": 2.0}, k=100))
    body = _body(engine, "stream")
    lang = _field(engine, "python", "lang", 2.0)
    assert set(got) == set(body) | set(lang)
    for d, s in got.items():
        assert s == pytest.approx(body.get(d, 0.0) + lang.get(d, 0.0))


def test_overlap_term_dismax_with_tie(engine, ids):
    # 'spark' lives in the body AND in tag for p0/p2
    tie = 0.3
    got = dict(engine.dismax_search(
        "spark", {"_text_": 1.0, "tag": 2.0}, k=100, tie=tie))
    body = _body(engine, "spark")
    tag = _field(engine, "spark", "tag", 2.0)
    for d, s in got.items():
        parts = [p for p in (body.get(d), tag.get(d)) if p is not None]
        want = max(parts) + tie * (sum(parts) - max(parts))
        assert s == pytest.approx(want)
    assert set(got) == set(body) | set(tag)


def test_min_match_counts_clauses(engine, ids):
    # two clauses: 'spark' (body+tag), 'python' (lang only)
    got = dict(engine.dismax_search(
        "spark python", {"_text_": 1.0, "lang": 1.0, "tag": 1.0},
        k=100, min_match=2))
    # only docs matching BOTH clauses in some field survive: p0, p2
    assert set(got) == {ids["p0"], ids["p2"]}


def test_tombstoned_docs_excluded(spark, tmp_path):
    eng = ExtractorEngine(
        spark, str(tmp_path / "dmb2"), n_buckets=4, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("tag", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="db2")
    pid = {r["path"]: int(r["doc_id"])
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    eng.delete([pid["p0"]])
    got = dict(eng.dismax_search("spark", {"_text_": 1.0, "tag": 2.0},
                                 k=100))
    assert pid["p0"] not in got
    assert pid["p2"] in got


def test_pf_with_body_field_rejected(engine):
    with pytest.raises(ValidationError):
        engine.dismax_search("spark join", {"_text_": 1.0},
                             pf={"tag": 2.0})


def test_unknown_metadata_field_contributes_nothing(engine):
    got = dict(engine.dismax_search(
        "spark", {"_text_": 1.0, "nosuch": 9.0}, k=100))
    want = _body(engine, "spark")
    for d, s in got.items():
        assert s == pytest.approx(want[d])
