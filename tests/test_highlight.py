"""Multi-fragment highlighting — Solr hl.snippets=N / hl.fragsize (the
reference serves CKAN search pages from Solr's standard highlighter over
the stored fulltext). Pinned semantics: up to N NON-OVERLAPPING
±width-char windows per hit, anchored at index match positions, in
document order; anchors inside an already-emitted window are skipped."""

from __future__ import annotations

import json

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

FILLER = "lorem ipsum dolor sit amet consectetur adipiscing elit "

DOCS = [
    # three well-separated needles
    ("r/h", "h0", "c0", "markdown",
     "needle one " + FILLER * 4 + " needle two " + FILLER * 4
     + " needle three", {}),
    # two needles close together (same window)
    ("r/h", "h1", "c1", "markdown", "needle needle adjacent pair", {}),
    # one needle at the head
    ("r/h", "h2", "c2", "markdown", "needle alone here", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hl"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50,
                          store_content=True, store_offsets=True)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="hl")
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_highlight_emits_document_order_fragments(engine):
    ids = _ids(engine)
    got = {d: frags for d, _, frags in engine.highlight(
        "needle", k=10, width=20, n_snippets=5, conjunctive=False)}
    f0 = got[ids["h0"]]
    assert len(f0) == 3
    assert all("needle" in f for f in f0)
    assert "one" in f0[0] and "two" in f0[1] and "three" in f0[2]


def test_highlight_n_snippets_caps_fragments(engine):
    ids = _ids(engine)
    got = {d: frags for d, _, frags in engine.highlight(
        "needle", k=10, width=20, n_snippets=2, conjunctive=False)}
    assert len(got[ids["h0"]]) == 2
    assert "one" in got[ids["h0"]][0] and "two" in got[ids["h0"]][1]


def test_highlight_merges_anchors_in_one_window(engine):
    ids = _ids(engine)
    got = {d: frags for d, _, frags in engine.highlight(
        "needle", k=10, width=20, n_snippets=5, conjunctive=False)}
    # h1's two needles are 7 chars apart — one window covers both
    assert len(got[ids["h1"]]) == 1
    assert len(got[ids["h2"]]) == 1


def test_highlight_scores_match_search(engine):
    hits = dict(engine.search("needle", k=10, conjunctive=False))
    for d, s, _ in engine.highlight("needle", k=10, conjunctive=False):
        assert s == hits[d]


def test_highlight_respects_provided_hits(engine):
    ids = _ids(engine)
    picked = [(ids["h2"], 1.0)]
    got = engine.highlight("needle", hits=picked)
    assert [d for d, _, _ in got] == [ids["h2"]]
    assert got[0][1] == 1.0


def test_highlight_tags_wrap_every_in_window_match(engine):
    ids = _ids(engine)
    got = {d: frags for d, _, frags in engine.highlight(
        "needle", k=10, width=20, n_snippets=5, conjunctive=False,
        pre_tag="<em>", post_tag="</em>")}
    # h1: both adjacent needles share one window -> BOTH get wrapped
    assert got[ids["h1"]][0].count("<em>needle</em>") == 2
    # h0: each window wraps its own match
    for frag in got[ids["h0"]]:
        assert "<em>needle</em>" in frag


def test_highlight_tag_validation(engine):
    with pytest.raises(ValidationError):
        engine.highlight("needle", pre_tag="<em>")
    with pytest.raises(ValidationError):
        engine.highlight("needle", post_tag="</em>")


def test_highlight_validation(engine, spark, tmp_path):
    with pytest.raises(ValidationError):
        engine.highlight("needle", n_snippets=0)
    with pytest.raises(ValidationError):
        engine.highlight("", k=5)
    bare = ExtractorEngine(spark, str(tmp_path / "bare"), n_buckets=4,
                           salt_threshold=50)
    bare.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="hl")
    with pytest.raises(ValueError):
        bare.highlight("needle")


def test_cli_highlight(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["query", "--index", engine.root, "--q", "needle",
                 "--or", "--snippets", "--hl-count", "3",
                 "--buckets", "4"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    ids = _ids(engine)
    by = {r["doc_id"]: r["snippets"] for r in lines}
    assert len(by[ids["h0"]]) == 3
