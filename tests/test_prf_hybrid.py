"""Pseudo-relevance feedback (Rocchio blind feedback) and engine-level
hybrid RRF fusion. PRF contract: score = BM25(query) + expand_boost *
BM25(expansion terms), expansion mined MLT-style from the top fb_docs;
hybrid contract: rank-only fusion of the engine's BM25 list with a
caller-provided dense list."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

SCHEMA = "repo string, path string, commit string, lang string, content string"

DOCS = [
    # alpha docs consistently co-occur with beta -> beta is THE
    # expansion term; gamma is rarer feedback noise
    ("r", "p0", "c0", "python", "alpha beta beta gamma"),
    ("r", "p1", "c1", "python", "alpha beta delta"),
    ("r", "p2", "c2", "python", "alpha beta"),
    ("r", "p3", "c3", "python", "beta epsilon"),   # beta-only: admitted
    ("r", "p4", "c4", "python", "delta epsilon"),  # matches nothing
    ("r", "p5", "c5", "python", "alpha zeta"),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prf"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          store_content=True)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="prf")
    return eng


def _by_path(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id").collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_prf_admits_expansion_only_docs(engine):
    ids = _by_path(engine)
    plain = {d for d, _ in engine.search("alpha", k=10,
                                         conjunctive=False)}
    assert ids["p3"] not in plain
    prf = {d for d, _ in engine.prf_search("alpha", k=10, fb_docs=3,
                                           fb_terms=1)}
    assert ids["p3"] in prf  # beta-only doc pulled in by expansion
    assert ids["p4"] not in prf  # fb_terms=1 -> expansion is exactly
    #                              {beta}; delta/epsilon stay out
    # widening to 2 terms mines delta (df=2) too and admits p4
    prf2 = {d for d, _ in engine.prf_search("alpha", k=10, fb_docs=3,
                                            fb_terms=2)}
    assert ids["p4"] in prf2


def test_prf_score_is_orig_plus_scaled_expansion(engine):
    ids = _by_path(engine)
    # expansion from alpha's top docs must include beta (df=4 >= 2,
    # highest summed tf); with fb_terms=1 it is exactly {beta}
    exp = engine._prf_terms(
        [d for d, _ in engine.search("alpha", k=3, conjunctive=False)],
        {"alpha"}, 1, 2)
    assert [t for t, _ in exp] == ["beta"]
    alpha = dict(engine.search("alpha", k=10, conjunctive=False))
    beta = dict(engine.search("beta", k=10, conjunctive=False))
    prf = dict(engine.prf_search("alpha", k=10, fb_docs=3, fb_terms=1,
                                 expand_boost=0.5))
    for d, s in prf.items():
        want = alpha.get(d, 0.0) + 0.5 * beta.get(d, 0.0)
        assert s == pytest.approx(want, rel=1e-9), d
    # boost=0 degenerates to the plain query
    prf0 = engine.prf_search("alpha", k=10, fb_docs=3, fb_terms=1,
                             expand_boost=0.0)
    assert prf0 == engine.search("alpha", k=10, conjunctive=False)


def test_prf_excludes_query_terms_from_expansion(engine):
    exp = engine._prf_terms(
        [d for d, _ in engine.search("alpha", k=3, conjunctive=False)],
        {"alpha"}, 10, 1)
    assert "alpha" not in [t for t, _ in exp]


def test_prf_validation(engine):
    with pytest.raises(ValidationError):
        engine.prf_search("alpha", fb_docs=0)
    with pytest.raises(ValidationError):
        engine.prf_search("alpha", expand_boost=-0.1)
    with pytest.raises(ValidationError):
        engine.prf_search("", k=5)


def test_prf_requires_store_content(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prfnc"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS[:3], SCHEMA), build_id="x")
    with pytest.raises(ValidationError):
        eng.prf_search("alpha", k=5)


def test_hybrid_search_hand_computed(engine):
    ids = _by_path(engine)
    lex = engine.search("alpha", k=100, conjunctive=False)
    lex_rank = {d: i + 1 for i, (d, s) in enumerate(
        sorted(lex, key=lambda x: (-round(x[1], 6), x[0])))}
    dense = [(ids["p4"], 0.99), (ids["p0"], 0.42)]
    got = dict(engine.hybrid_search("alpha", dense, k=10, rrf_k=60))
    # p4: dense-only, rank 1
    assert got[ids["p4"]] == round(1 / 61, 6)
    # p0: both lists
    assert got[ids["p0"]] == round(
        1 / (60 + lex_rank[ids["p0"]]) + 1 / 62, 6)
    # lexical-only docs keep their lexical contribution
    for d, r in lex_rank.items():
        if d not in (ids["p4"], ids["p0"]):
            assert got[d] == round(1 / (60 + r), 6)


def test_hybrid_search_weights_and_validation(engine):
    ids = _by_path(engine)
    dense = [(ids["p4"], 1.0)]
    got = dict(engine.hybrid_search("alpha", dense, k=10,
                                    dense_weight=3.0))
    assert got[ids["p4"]] == round(3.0 / 61, 6)
    with pytest.raises(ValidationError):
        engine.hybrid_search("alpha", [(1, 2, 3)], k=5)
    with pytest.raises(ValidationError):
        engine.hybrid_search("alpha", dense, k=5, rrf_k=0)
    assert engine.hybrid_search("zzznope", [], k=5) == []


def test_cli_build_store_content_then_prf(spark, tmp_path, capsys):
    """End-to-end CLI: build --store-content, then query --prf works
    (the build flag is new — store_content used to be reachable only
    programmatically)."""
    import json

    from ckanext_extractor_spark.cli.main import main

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(DOCS, SCHEMA).write.parquet(src)
    root = str(tmp_path / "idx")
    assert main(["build", "--source", src, "--index", root,
                 "--format", "parquet", "--buckets", "8",
                 "--store-content"]) == 0
    capsys.readouterr()
    assert main(["query", "--index", root, "--q", "alpha",
                 "--prf", "--fb-docs", "3", "--fb-terms", "1",
                 "--buckets", "8"]) == 0
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()]
    assert rows  # the beta-only doc is admitted by expansion
    # without --store-content the same query fails loudly
    root2 = str(tmp_path / "idx2")
    assert main(["build", "--source", src, "--index", root2,
                 "--format", "parquet", "--buckets", "8"]) == 0
    capsys.readouterr()
    from ckanext_extractor_spark.api import ValidationError
    with pytest.raises(ValidationError):
        main(["query", "--index", root2, "--q", "alpha", "--prf",
              "--buckets", "8"])
