"""Cursor deep paging — Lucene IndexSearcher.searchAfter / Solr
cursorMark (round 4). Pages chain by exact (score, doc_id) cursors;
page depth never grows the materialized window, unlike
search(start=n)'s start+k (the deep-paging cliff cursorMark exists
for). Reference analog: CKAN package_search paginates Solr results;
Solr's own guidance routes deep pagination through cursorMark."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", f"p{i}", f"c{i}", "markdown",
     "spark join " + ("pad " * (i % 7)) + ("spark " * (i % 3)),
     {})
    for i in range(30)
] + [
    ("r/a", f"q{i}", f"d{i}", "markdown", "vector stream only", {})
    for i in range(3)
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cursor"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="cur")
    eng.warm()
    return eng


def _paged(eng, q, page, n_pages, **kw):
    pages, after = [], None
    for _ in range(n_pages):
        hits = eng.search_after(q, k=page, after=after, **kw)
        if not hits:
            break
        pages.append(hits)
        after = hits[-1]
    return pages


def test_pages_tile_the_full_ranking_exactly(engine):
    full = engine.search("spark join", k=10**6, mode="exact")
    pages = _paged(engine, "spark join", 7, 10)
    flat = [h for p in pages for h in p]
    assert flat == full  # no gaps, no dups, identical order + scores


def test_first_page_equals_search(engine):
    assert engine.search_after("spark join", k=5) == \
        engine.search("spark join", k=5, mode="exact")


def test_distributed_pages_match_driver_pages(engine):
    d_pages = _paged(engine, "spark join", 7, 10, distributed=True)
    w_pages = _paged(engine, "spark join", 7, 10)
    assert [[(d, round(s, 9)) for d, s in p] for p in d_pages] == \
        [[(d, round(s, 9)) for d, s in p] for p in w_pages]


def test_cursor_on_score_tie_breaks_by_doc_id(engine):
    # q-docs all have identical content -> identical scores; paging
    # across them must advance by doc_id, not loop or skip
    full = engine.search("vector stream", k=10**6, mode="exact")
    assert len(full) == 3
    assert len({s for _, s in full}) == 1  # genuine 3-way score tie
    pages = _paged(engine, "vector stream", 1, 5)
    assert [h for p in pages for h in p] == full


def test_disjunctive_and_min_match_compose(engine):
    full = engine.search("spark pad", k=10**6, conjunctive=False,
                         min_match=2, mode="exact")
    pages = _paged(engine, "spark pad", 4, 20, conjunctive=False,
                   min_match=2)
    assert [h for p in pages for h in p] == full


def test_cursor_validation(engine):
    for bad in ((1.0,), (1.0, 2, 3), ("x", 1), (1.0, "y"), (True, 1),
                (1.0, False), "cursor", 7):
        with pytest.raises(ValidationError):
            engine.search_after("spark", after=bad)
    with pytest.raises(ValidationError):
        engine.search_after("spark", min_match=2)  # conjunctive default
