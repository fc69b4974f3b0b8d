"""Multi-field sort (Solr sort=f1 asc, f2 desc) and two-pass reranking
(Solr ReRankQParser rq={!rerank reRankQuery reRankDocs reRankWeight})
— round 4. Reference analog: CKAN's package_search passes sort= and
rerank-style boost params straight to Solr over the index the
reference plugin maintains."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", f"p{i}", f"c{i}", "markdown",
     "spark join " + ("pad " * (i % 5)) + ("join " * (i % 3)),
     {"Group": [f"g{i % 3}"], "Rank": [f"{9 - i % 10}"]})
    for i in range(20)
] + [
    # matches 'spark' but carries no Rank -> multi-sort excludes it
    ("r/a", "nr", "cnr", "markdown", "spark norank", {"Group": ["g0"]}),
    # matches only the rerank query -> rerank must never admit it
    ("r/a", "rq", "crq", "markdown", "join only here", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(smr_spark):
    return smr_spark


@pytest.fixture(scope="module")
def smr_spark(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("smr"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          analyzer=SIMPLE_CONFIG,
                          indexed_fields=("group", "rank"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="smr")
    eng.warm()
    return eng


def _meta(engine):
    import pyspark.sql.functions as F

    rows = (
        engine.spark.read.parquet(engine._p("doc_stats"))
        .select("doc_id", "path").collect()
    )
    paths = {int(r["doc_id"]): r["path"] for r in rows}
    by_path = {p: dict(m) for _, p, _, _, _, m in
               [(d[0], d[1], d[2], d[3], d[4], d[5]) for d in DOCS]}
    return {
        d: {k.lower(): v[0] for k, v in by_path[p].items()}
        for d, p in paths.items()
    }


# -- search_sorted_multi -------------------------------------------------------


def test_sort_multi_matches_python_oracle(engine):
    meta = _meta(engine)
    matched = {d for d, _ in engine.search("spark", k=10**6)}
    want = sorted(
        (
            (meta[d]["group"], meta[d]["rank"], d)
            for d in matched
            if "group" in meta[d] and "rank" in meta[d]
        ),
        key=lambda x: (x[0], _desc(x[1]), x[2]),
    )
    got = engine.search_sorted_multi(
        "spark", [("group", True), ("rank", False)], k=100
    )
    assert [(g, r) for g, r, _ in want] == [tuple(v) for _, v in got]
    assert [d for *_ , d in want] == [d for d, _ in got]


class _desc(str):
    def __lt__(self, other):  # descending string order inside a sorted()
        return str.__gt__(self, other)


def test_sort_multi_single_spec_equals_search_sorted(engine):
    multi = engine.search_sorted_multi("spark", [("rank", True)], k=50)
    single = engine.search_sorted("spark", "rank", k=50, ascending=True)
    assert [(d, v[0]) for d, v in multi] == single


def test_sort_multi_excludes_docs_missing_any_field(engine):
    got = engine.search_sorted_multi(
        "spark", [("group", True), ("rank", False)], k=100
    )
    ids = {d for d, _ in got}
    norank = [d for d, m in _meta(engine).items()
              if "rank" not in m and "group" in m]
    assert norank and not ids.intersection(norank)


def test_sort_multi_k_window(engine):
    full = engine.search_sorted_multi(
        "spark", [("group", True), ("rank", False)], k=100
    )
    assert engine.search_sorted_multi(
        "spark", [("group", True), ("rank", False)], k=3
    ) == full[:3]


def test_sort_multi_score_pseudo_field(engine):
    # Solr sort=score desc, rank asc: primary BM25, metadata tie-break
    got = engine.search_sorted_multi(
        "spark", [("score", False), ("rank", True)], k=100
    )
    hits = dict(engine.search("spark", k=10**6))
    meta = _meta(engine)
    want = sorted(
        (
            (-hits[d], meta[d]["rank"], d)
            for d, _ in hits.items()
            if "rank" in meta[d]
        ),
    )
    assert [d for d, _ in got] == [d for _, _, d in want]
    # the score spec's value is the real BM25 float (fresh index:
    # pre-merge docFreq == live df, so it equals search()'s score)
    for d, vals in got:
        assert vals[0] == pytest.approx(hits[d], rel=1e-9)
        assert vals[1] == meta[d]["rank"]


def test_sort_multi_score_only_equals_search(engine):
    got = engine.search_sorted_multi("spark", [("score", False)], k=10)
    want = engine.search(
        "spark", k=10**6
    )
    want = sorted(want, key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_sort_multi_validation(engine):
    for bad in ([], [("group",)], [("group", "asc")], [(1, True)],
                [("group", True), ("group", False)], "group"):
        with pytest.raises(ValidationError):
            engine.search_sorted_multi("spark", bad)
    assert engine.search_sorted_multi("absentterm", [("group", True)]) == []


# -- rerank_search -------------------------------------------------------------


def test_rerank_equals_manual_two_pass(engine):
    first = engine.search("spark", k=10**6)
    window = first[:8]
    rr = dict(engine.search("join", k=10**6, conjunctive=False))
    resc = sorted(
        ((d, s + 2.0 * rr.get(d, 0.0)) for d, s in window),
        key=lambda x: (-x[1], x[0]),
    )
    want = resc + first[8:12]
    got = engine.rerank_search("spark", "join", k=12, rerank_docs=8,
                               weight=2.0)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws)


def test_rerank_never_admits_or_drops(engine):
    got = engine.rerank_search("spark", "join", k=10**6, rerank_docs=5)
    first = engine.search("spark", k=10**6)
    assert sorted(d for d, _ in got) == sorted(d for d, _ in first)
    rq_only = [d for d, _ in engine.search("only", k=10**6)]
    assert rq_only and not set(rq_only) & {d for d, _ in got}


def test_rerank_tail_keeps_first_pass_order_and_scores(engine):
    first = engine.search("spark", k=10**6)
    got = engine.rerank_search("spark", "join", k=len(first),
                               rerank_docs=4)
    assert [d for d, _ in got[4:]] == [d for d, _ in first[4:]]
    for (_, gs), (_, ws) in zip(got[4:], first[4:]):
        assert gs == pytest.approx(ws)


def test_rerank_weight_zero_is_first_pass_ranking(engine):
    first = engine.search("spark", k=10)
    got = engine.rerank_search("spark", "join", k=10, rerank_docs=30,
                               weight=0.0)
    assert [d for d, _ in got] == [d for d, _ in first]


def test_rerank_window_smaller_than_k(engine):
    # docs below the window keep first-pass order behind the window
    got = engine.rerank_search("spark", "join", k=10, rerank_docs=3)
    first = engine.search("spark", k=10)
    assert [d for d, _ in got[3:]] == [d for d, _ in first[3:]]
    assert sorted(d for d, _ in got[:3]) == sorted(d for d, _ in first[:3])


def test_rerank_validation(engine):
    with pytest.raises(ValidationError):
        engine.rerank_search("spark", "join", rerank_docs=0)
    with pytest.raises(ValidationError):
        engine.rerank_search("spark", "join", rerank_docs=True)
    with pytest.raises(ValidationError):
        engine.rerank_search("spark", "join", weight="2")
    with pytest.raises(ValidationError):
        engine.rerank_search("", "join")
    assert engine.rerank_search("absentterm", "join") == []
    # rerank query matching nothing leaves the first pass untouched
    got = engine.rerank_search("spark", "absentterm", k=10)
    want = engine.search("spark", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws)
