"""Solr facet options (prefix/mincount/missing/sort), StatsComponent
percentiles + stddev, and ES-style significant_terms (round 4).

Reference analog: the reference's CKAN UI drives Solr faceting/stats
over the index its plugin maintains (plugin.py IPackageController /
package_search facet params); significant_terms is the ES aggregation
of the same name (JLH heuristic), here as a training-data slice
analyzer."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta spark",
     {"Size": ["5"], "Kind": ["web"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Size": ["15"], "Kind": ["webx"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream join",
     {"Size": ["25"], "Kind": ["book"]}),
    ("r/a", "p3", "c3", "markdown", "spark join stream",
     {"Size": ["35"], "Kind": ["book"]}),
    # no Size field -> stats missing / facet.missing fodder
    ("r/a", "p4", "c4", "markdown", "spark solo",
     {"Kind": ["wiki"]}),
    ("r/a", "p5", "c5", "markdown", "nothing here",
     {"Size": ["-3"], "Kind": ["wiki"]}),
    ("r/a", "p6", "c6", "markdown", "spark sized oddly",
     {"Size": ["not-a-number"], "Kind": ["wiki"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fss"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          analyzer=SIMPLE_CONFIG,
                          indexed_fields=("size", "kind"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="fss")
    eng.warm()
    return eng


def _tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# -- facet options ------------------------------------------------------------


def test_facets_defaults_unchanged(engine):
    out = engine.facets("spark", ["kind"])
    # spark matches p0-p4, p6: web 1, webx 1, book 2, wiki 2
    assert out["kind"] == [("book", 2), ("wiki", 2), ("web", 1),
                           ("webx", 1)]


def test_facets_prefix(engine):
    out = engine.facets("spark", ["kind"], prefix="web")
    assert out["kind"] == [("web", 1), ("webx", 1)]


def test_facets_mincount(engine):
    out = engine.facets("spark", ["kind"], mincount=2)
    assert out["kind"] == [("book", 2), ("wiki", 2)]


def test_facets_sort_index(engine):
    out = engine.facets("spark", ["kind"], sort="index")
    assert out["kind"] == [("book", 2), ("web", 1), ("webx", 1),
                           ("wiki", 2)]


def test_facets_sort_index_respects_k(engine):
    out = engine.facets("spark", ["kind"], k_facet=2, sort="index")
    assert out["kind"] == [("book", 2), ("web", 1)]


def test_facets_missing(engine):
    out = engine.facets("spark", ["size", "kind"], missing=True)
    # spark matches 6 docs; p4 lacks size, all carry kind
    assert out["size"][-1] == (None, 1)
    assert out["kind"][-1] == (None, 0)


def test_facets_missing_ignores_prefix(engine):
    # prefix filters the VALUE list, never the missing bucket (Solr)
    out = engine.facets("spark", ["size"], prefix="zzz", missing=True)
    assert out["size"] == [(None, 1)]


def test_facets_option_validation(engine):
    with pytest.raises(ValidationError):
        engine.facets("spark", ["kind"], sort="bogus")
    with pytest.raises(ValidationError):
        engine.facets("spark", ["kind"], mincount=-1)
    with pytest.raises(ValidationError):
        engine.facets("spark", ["kind"], mincount=True)
    with pytest.raises(ValidationError):
        engine.facets("spark", ["kind"], prefix="")


# -- stats percentiles + stddev ------------------------------------------------


def test_stats_percentiles_exact(engine):
    # conjunctive 'spark join' matches p1, p2, p3 -> sizes 15, 25, 35
    st = engine.field_stats("spark join", "size",
                            percentiles=[0.25, 0.5, 0.9])
    vals = np.array([15.0, 25.0, 35.0])
    assert st["count"] == 3 and st["missing"] == 0
    assert st["stddev"] == pytest.approx(float(np.std(vals, ddof=1)))
    for p, want in [(0.25, 20.0), (0.5, 25.0), (0.9, 33.0)]:
        # R-7: value at (n-1)*p with linear interpolation
        assert st["percentiles"][p] == pytest.approx(want)


def test_stats_stddev_always_present(engine):
    st = engine.field_stats("spark join", "size")
    assert "stddev" in st and st["stddev"] == pytest.approx(
        float(np.std([15.0, 25.0, 35.0], ddof=1)))
    assert "percentiles" not in st


def test_stats_percentiles_non_numeric(engine):
    # 'spark' matches include p6's size 'not-a-number' -> numeric stats off
    st = engine.field_stats("spark", "size", percentiles=[0.5])
    assert st["sum"] is None and st["stddev"] is None
    assert st["percentiles"] == {0.5: None}


def test_stats_percentiles_no_match(engine):
    st = engine.field_stats("absentterm", "size", percentiles=[0.5])
    assert st["count"] == 0 and st["percentiles"] == {0.5: None}


def test_stats_percentiles_validation(engine):
    for bad in ([], [0.0], [1.5], ["0.5"], [True], "0.5"):
        with pytest.raises(ValidationError):
            engine.field_stats("spark", "size", percentiles=bad)


# -- significant terms ----------------------------------------------------------


def _expected_jlh(query_term, min_fg, docs=DOCS):
    toks = [set(_tokens(content)) for *_head, content, _m in docs]
    n_docs = len(toks)
    matched = [t for t in toks if query_term in t]
    nm = len(matched)
    vocab = set().union(*toks)
    out = []
    for term in vocab:
        fg = sum(1 for t in matched if term in t)
        if fg < min_fg:
            continue
        bg = sum(1 for t in toks if term in t)
        fgp, bgp = fg / nm, bg / n_docs
        score = (fgp - bgp) * (fgp / bgp)
        if score > 0:
            out.append((term, fg, bg, score))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out


def test_significant_terms_jlh(engine):
    got = engine.significant_terms("spark", k=20, min_fg=2)
    want = _expected_jlh("spark", 2)
    assert [(t, fg, bg) for t, fg, bg, _ in got] == \
        [(t, fg, bg) for t, fg, bg, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws)
    # the query term itself tops the list (fgPct 1.0, max lift)
    assert got[0][0] == "spark"


def test_significant_terms_min_fg(engine):
    got = engine.significant_terms("spark", k=20, min_fg=3)
    want = _expected_jlh("spark", 3)
    assert [t for t, *_ in got] == [t for t, *_ in want]
    assert all(fg >= 3 for _, fg, _, _ in got)


def test_significant_terms_k_window(engine):
    full = engine.significant_terms("spark", k=20, min_fg=2)
    assert engine.significant_terms("spark", k=2, min_fg=2) == full[:2]


def test_significant_terms_after_delete(engine, spark, tmp_path):
    # fg is tombstone-filtered; bg AND its denominator stay pre-merge
    # (segment n_postings / maxDoc — pinned like MLT/suggest docFreq)
    docs = [
        ("r/a", "p0", "c0", "markdown", "alpha beta spark", {}),
        ("r/a", "p1", "c1", "markdown", "spark tee one", {}),
        ("r/a", "p2", "c2", "markdown", "spark tee two", {}),
        ("r/a", "p3", "c3", "markdown", "spark tee three", {}),
        ("r/a", "p4", "c4", "markdown", "spark tee four", {}),
        ("r/a", "p5", "c5", "markdown", "spark tee five", {}),
        ("r/a", "p6", "c6", "markdown", "spark tee six", {}),
        ("r/a", "p7", "c7", "markdown", "spark solo", {}),
        ("r/a", "p8", "c8", "markdown", "spark extra", {}),
        ("r/a", "p9", "c9", "markdown", "offtopic words", {}),
        ("r/a", "p10", "c10", "markdown", "filler stuff", {}),
        ("r/a", "p11", "c11", "markdown", "nothing here", {}),
    ]
    root = str(tmp_path / "sig_del")
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50,
                          analyzer=SIMPLE_CONFIG)
    eng.extract(spark.createDataFrame(docs, SCHEMA), build_id="s1")
    ids = {r["path"]: r["doc_id"]
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    # delete 2/12 = 0.167 dead, BELOW DEAD_FRAC so no compaction runs
    # and the pre-merge segment metadata stays in place
    eng.delete([ids["p1"], ids["p2"]])
    got = dict((t, (fg, bg)) for t, fg, bg, _ in
               eng.significant_terms("spark", k=50, min_fg=1))
    # 'tee' lived in p1..p6; fg drops 6 -> 4 (tombstone-filtered), bg
    # stays pre-merge 6; denominator pre-merge maxDoc = 10 live + 2
    # killed = 12: fgPct 4/7 = 0.571 > bgPct 6/12 = 0.5 -> significant.
    # A LIVE denominator (10) would give bgPct 6/10 = 0.6 > fgPct and
    # silently vanish the term — the maxDoc parity is what this pins.
    assert got["tee"] == (4, 6)
    # the deleted docs' unique terms have fg 0 -> never appear
    assert "two" not in got
    assert got["spark"] == (7, 9)


def test_significant_terms_empty_and_validation(engine):
    assert engine.significant_terms("absentterm") == []
    with pytest.raises(ValidationError):
        engine.significant_terms("spark", min_fg=0)
    with pytest.raises(ValidationError):
        engine.significant_terms("spark", min_fg=True)
    with pytest.raises(ValidationError):
        engine.significant_terms("")
