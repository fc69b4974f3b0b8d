"""Lucene distance-blended fuzzy scoring (VERDICT r3 #5).

fuzzy_search(blend="lucene") multiplies each expansion's BM25
contribution by FuzzyTermsEnum's boost ``1 - edit/min(|q|, |t|)``
(Lucene TopTermsBlendedFreqScoringRewrite ranking parity); the default
blend="idf" keeps round-3's pinned per-term-idf semantics. Reference
analog: Solr ``term~n`` through the standard handler
(/root/reference/travis/solr/solrconfig.xml:490-500)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import (
    ExtractorEngine,
    ValidationError,
    fuzzy_blend_boost,
)

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma", {}),
    ("r/a", "p1", "c1", "markdown", "alpha beta", {}),
    ("r/a", "p2", "c2", "markdown", "alpha delta", {}),
    ("r/a", "p3", "c3", "markdown", "beta gamma delta", {}),
    ("r/a", "p4", "c4", "markdown", "delta epsilon", {}),
    ("r/a", "p5", "c5", "markdown", "alphabet alpha soup", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fblend"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="fb")
    eng.warm()
    return eng


def test_blend_boost_formula():
    # exact match: boost 1.0 regardless of length
    assert fuzzy_blend_boost("beta", "beta", 2) == 1.0
    # one edit against min-length 4 -> 0.75
    assert fuzzy_blend_boost("alph", "alpha", 1) == 0.75
    # two edits against min-length 4 -> 0.5 (beta -> delta)
    assert fuzzy_blend_boost("beta", "delta", 2) == 0.5
    # min() uses the SHORTER of query/term (Lucene FuzzyTermsEnum)
    assert fuzzy_blend_boost("ab", "abcd", 2) == 1.0 - 2 / 2
    with pytest.raises(ValueError):
        fuzzy_blend_boost("beta", "zzzzzz", 2)


def test_blend_is_boosted_sum_of_expansion_scores(engine):
    # beta~2 expands to beta (d=0, boost 1.0) and delta (d=2, boost 0.5)
    assert engine.expand_fuzzy("beta", 2) == ["beta", "delta"]
    per_term = {
        t: dict(engine.search(t, k=100, conjunctive=False, mode="exact"))
        for t in ("beta", "delta")
    }
    expected = {}
    for t, boost in (("beta", 1.0), ("delta", 0.5)):
        for d, s in per_term[t].items():
            expected[d] = expected.get(d, 0.0) + boost * s
    got = engine.fuzzy_search("beta", k=100, max_edits=2, blend="lucene")
    want = sorted(expected.items(), key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_blend_changes_ranking_vs_idf_default(engine):
    """The blend must actually bite: delta-only docs outrank beta-only
    docs under per-term idf (delta has the same df but boost never
    applies), and drop under the 0.5 blend."""
    idf_hits = dict(engine.fuzzy_search("beta", k=100, max_edits=2))
    blend_hits = dict(
        engine.fuzzy_search("beta", k=100, max_edits=2, blend="lucene")
    )
    assert set(idf_hits) == set(blend_hits)
    # delta-only doc p4's score halves under the blend
    ids = {
        r["path"]: r["doc_id"]
        for r in engine.spark.read.parquet(engine._p("doc_stats"))
        .select("path", "doc_id").collect()
    }
    p4 = ids["p4"]
    assert blend_hits[p4] == pytest.approx(0.5 * idf_hits[p4], rel=1e-12)
    # beta-only doc p1 keeps its score (alpha/beta doc: beta part boosted 1.0)
    p0 = ids["p0"]
    beta_only = dict(engine.search("beta", k=100, conjunctive=False))
    delta_only = dict(engine.search("delta", k=100, conjunctive=False))
    assert blend_hits[p0] == pytest.approx(
        beta_only[p0] + 0.5 * delta_only.get(p0, 0.0), rel=1e-12
    )


def test_blend_warm_cold_parity(engine, spark):
    cold = ExtractorEngine(spark, engine.root, n_buckets=8,
                           salt_threshold=50)
    warm = engine.fuzzy_search("beta", k=10, max_edits=2, blend="lucene")
    assert cold.fuzzy_search("beta", k=10, max_edits=2,
                             blend="lucene") == warm


def test_blend_validation(engine):
    for bad in ("", "blended", "Lucene", None, 1):
        with pytest.raises(ValidationError):
            engine.fuzzy_search("beta", k=10, max_edits=1, blend=bad)
    # default stays the pinned per-term-idf semantics
    assert engine.fuzzy_search("beta", k=10, max_edits=2) == \
        engine.fuzzy_search("beta", k=10, max_edits=2, blend="idf")
