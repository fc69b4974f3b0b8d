"""Multi-word synonym expansion (VERDICT r4 #4; Solr
SynonymGraphFilter expand=true, reference schema.xml:61).

A synonym that analyzes to >= 2 tokens joins its OR-group as a PHRASE
member: docs containing the tokens ADJACENTLY match the group (and
score PhraseWeight BM25 — idf = sum of member-token idfs, tf = phrase
start count, same dl norms); docs holding the words apart do NOT match
through the synonym. Single-token synonyms keep the existing member
semantics."""

from __future__ import annotations

import math

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine

DOCS = [
    # p0: base term only; p1: adjacent phrase only; p2: words apart;
    # p3: base term AND phrase; p4: nothing relevant
    ("r/a", "p0", "c0", "markdown", "ml systems rock", {}),
    ("r/a", "p1", "c1", "markdown", "machine learning systems", {}),
    ("r/a", "p2", "c2", "markdown", "machine beats learning", {}),
    ("r/a", "p3", "c3", "markdown", "ml machine learning twice machine learning", {}),
    ("r/a", "p4", "c4", "markdown", "unrelated words here", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

SYN = {"ml": ["machine learning"]}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synph"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          analyzer=SIMPLE_CONFIG)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="sp")
    return eng


def _ids(eng):
    return {r["path"]: r["doc_id"]
            for r in eng.spark.read.parquet(eng._p("doc_stats"))
            .select("path", "doc_id").collect()}


def test_phrase_synonym_admits_adjacent_only(engine):
    ids = _ids(engine)
    got = {d for d, _ in engine.search("ml", k=10, synonyms=SYN)}
    assert ids["p0"] in got          # base term
    assert ids["p1"] in got          # adjacent phrase, no 'ml'
    assert ids["p3"] in got          # both
    assert ids["p2"] not in got      # words apart: NOT a synonym match
    assert ids["p4"] not in got


def test_phrase_synonym_scoring_is_phraseweight_bm25(engine):
    """p1's score = pidf * ptf-part with ptf=1; p3 doubles ptf and adds
    the base-term BM25 — recomputed independently."""
    ids = _ids(engine)
    got = dict(engine.search("ml", k=10, synonyms=SYN))
    st = engine.corpus_stats()
    n, avgdl, k1, b = st["n_docs"], st["avgdl"], 1.2, 0.75
    dfs = engine._df_for_terms(["machine", "learning", "ml"])
    pidf = sum(
        math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in ("machine", "learning")
    )

    def ptf_part(ptf, dl):
        return (ptf * (k1 + 1.0)) / (
            ptf + k1 * (1.0 - b + b * dl / avgdl))

    # p1: 3 tokens, one phrase start
    assert got[ids["p1"]] == pytest.approx(pidf * ptf_part(1, 3),
                                           rel=1e-9)
    # p3: 'ml' BM25 (tf=1, dl=6) + phrase tf=2
    idf_ml = math.log(1.0 + (n - dfs["ml"] + 0.5) / (dfs["ml"] + 0.5))
    want = idf_ml * ptf_part(1, 6) + pidf * ptf_part(2, 6)
    assert got[ids["p3"]] == pytest.approx(want, rel=1e-9)


def test_single_token_synonyms_unchanged(engine):
    ids = _ids(engine)
    got = {d for d, _ in engine.search("ml", k=10,
                                       synonyms={"ml": ["unrelated"]})}
    assert ids["p4"] in got and ids["p0"] in got
    assert ids["p1"] not in got


def test_conjunctive_groups_with_phrase_member(engine):
    """Query 'ml systems': group {ml | "machine learning"} AND
    {systems} — p1 (phrase + systems) matches, p3 (no 'systems')
    doesn't."""
    ids = _ids(engine)
    got = {d for d, _ in engine.search("ml systems", k=10,
                                       synonyms=SYN)}
    assert got == {ids["p0"], ids["p1"]}


def test_mixed_single_and_phrase_members(engine):
    ids = _ids(engine)
    got = {d for d, _ in engine.search(
        "ml", k=10, synonyms={"ml": ["machine learning", "unrelated"]})}
    assert got == {ids["p0"], ids["p1"], ids["p3"], ids["p4"]}


def test_no_match_phrase_synonym_is_noop(engine):
    a = engine.search("ml", k=10, synonyms={"ml": ["zz yy"]})
    b = engine.search("ml", k=10)
    # a crosses the synonyms slow path, b the warm kernel: ranks are
    # identical, scores agree to float-accumulation order
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert x == pytest.approx(y, rel=1e-12)
