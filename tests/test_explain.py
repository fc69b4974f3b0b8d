"""Lucene IndexSearcher.explain / Solr debugQuery=true parity: the
per-term BM25 decomposition must reproduce the search kernels' scoring
stats exactly — same live df/idf, same tf/doc_len, contributions summing
to search()'s score for the doc (the reference surfaces Solr's debug
component through CKAN package_search passthrough)."""

from __future__ import annotations

import json
import math

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma alpha",
     {"Lang": ["en"]}),
    ("r/a", "p1", "c1", "markdown", "alpha beta", {"Lang": ["de"]}),
    ("r/a", "p2", "c2", "markdown", "alpha delta", {"Lang": ["en"]}),
    ("r/a", "p3", "c3", "markdown", "beta gamma delta", {"Lang": ["en"]}),
    ("r/a", "p4", "c4", "markdown", "delta epsilon", {"Lang": ["en"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("explain"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("lang",))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ex")
    eng.warm()
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_explain_sum_equals_search_score(engine):
    ids = _ids(engine)
    hits = dict(engine.search("alpha beta", k=10))
    assert ids["p0"] in hits and ids["p1"] in hits
    for p in ("p0", "p1"):
        ex = engine.explain("alpha beta", ids[p])
        assert ex["match"] is True
        assert ex["n_matched"] == 2
        assert ex["score"] == pytest.approx(hits[ids[p]], rel=1e-12)
        assert ex["score"] == pytest.approx(
            sum(t["score"] for t in ex["terms"]), rel=1e-12
        )


def test_explain_stats_reproduce_bm25_closed_form(engine):
    ids = _ids(engine)
    ex = engine.explain("alpha beta", ids["p0"])
    by = {t["term"]: t for t in ex["terms"]}
    # corpus truths: alpha in p0,p1,p2 (df 3); beta in p0,p1,p3 (df 3);
    # p0 has alpha twice, 4 tokens; 5 docs, avgdl (4+2+2+3+2)/5
    a = by["alpha"]
    assert (a["tf"], a["df"], a["doc_len"]) == (2, 3, 4)
    n, avgdl, k1, b = ex["n_docs"], ex["avgdl"], ex["k1"], ex["b"]
    assert (n, avgdl) == (5, 13 / 5)
    idf = math.log(1.0 + (n - 3 + 0.5) / (3 + 0.5))
    tfn = (2 * (k1 + 1)) / (2 + k1 * (1 - b + b * 4 / avgdl))
    assert a["idf"] == pytest.approx(idf, rel=1e-12)
    assert a["score"] == pytest.approx(idf * tfn, rel=1e-12)


def test_explain_conjunctive_nonmatch_scores_zero(engine):
    ids = _ids(engine)
    # p2 has alpha but not beta
    ex = engine.explain("alpha beta", ids["p2"])
    assert ex["match"] is False and ex["score"] == 0.0
    by = {t["term"]: t for t in ex["terms"]}
    assert by["alpha"]["matched"] is True and by["alpha"]["score"] > 0
    assert by["beta"]["matched"] is False and by["beta"]["tf"] == 0
    # df is reported even for the unmatched term (Lucene explain does)
    assert by["beta"]["df"] == 3


def test_explain_disjunctive_matches_or_search(engine):
    ids = _ids(engine)
    hits = dict(engine.search("alpha beta", k=10, conjunctive=False))
    ex = engine.explain("alpha beta", ids["p2"], conjunctive=False)
    assert ex["match"] is True and ex["n_matched"] == 1
    assert ex["score"] == pytest.approx(hits[ids["p2"]], rel=1e-12)


def test_explain_unknown_term_and_unknown_doc(engine):
    ids = _ids(engine)
    ex = engine.explain("alpha zzz", ids["p0"])
    by = {t["term"]: t for t in ex["terms"]}
    assert by["zzz"] == {
        "term": "zzz", "matched": False, "tf": 0, "df": 0, "doc_len": 0,
        "idf": 0.0, "tf_norm": 0.0, "score": 0.0,
    }
    assert ex["match"] is False
    ghost = engine.explain("alpha", 10_000_000)
    assert ghost["match"] is False and ghost["score"] == 0.0


def test_explain_validation(engine):
    with pytest.raises(ValidationError):
        engine.explain("", 0)
    with pytest.raises(ValidationError):
        engine.explain("alpha", "p0")
    with pytest.raises(ValidationError):
        engine.explain("alpha", True)


def test_explain_after_delete_tracks_live_df(spark, tmp_path):
    eng = ExtractorEngine(spark, str(tmp_path / "exdel"), n_buckets=8,
                          salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ex")
    ids = _ids(eng)
    eng.delete([ids["p1"]])
    # alpha's live df drops 3 -> 2; explain must match the post-delete
    # kernel scoring exactly
    hits = dict(eng.search("alpha beta", k=10))
    ex = eng.explain("alpha beta", ids["p0"])
    by = {t["term"]: t for t in ex["terms"]}
    assert by["alpha"]["df"] == 2
    assert ex["score"] == pytest.approx(hits[ids["p0"]], rel=1e-12)


def test_index_stats_luke_surface(engine):
    st = engine.index_stats()
    # corpus truths: 5 docs, 13 tokens, vocab {alpha beta gamma delta
    # epsilon}, 12 distinct (doc, term) pairs
    assert st["n_docs"] == 5
    assert st["total_tokens"] == 13
    assert st["n_terms"] == 5
    assert st["n_postings"] == 12
    assert st["avgdl"] == pytest.approx(13 / 5)
    assert st["generations"] >= 1 and st["tombstones"] == 0
    assert st["segments_disk_bytes"] > 0


def test_index_stats_counts_tombstones_premerge(spark, tmp_path):
    eng = ExtractorEngine(spark, str(tmp_path / "luke"), n_buckets=4,
                          salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ex")
    ids = _ids(eng)
    eng.delete([ids["p4"]])
    st = eng.index_stats()
    # pre-merge pin: tombstoned docs still count in n_postings/n_terms
    assert st["tombstones"] == 1
    assert st["n_postings"] == 12 and st["n_terms"] == 5


def test_cli_indexstats(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["indexstats", "--index", engine.root,
                 "--buckets", "8"]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st["n_docs"] == 5 and st["n_postings"] == 12


def test_cli_explain(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    ids = _ids(engine)
    assert main(["explain", "--index", engine.root, "--q", "alpha beta",
                 str(ids["p0"]), "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["match"] is True and len(out["terms"]) == 2
