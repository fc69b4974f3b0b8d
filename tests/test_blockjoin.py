"""Block join ({!parent} / {!child}, Lucene To{Parent,Child}BlockJoinQuery).

The relational block encoding: a child doc carries its parent's ``path``
in metadata ``parent-path`` (the table-shaped translation of Lucene's
positional blocks / Solr ``_root_``)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

# two parent docs, each with children; one orphan-ish standalone doc
DOCS = [
    ("r/a", "parent0", "c0", "markdown", "umbrella record alpha", {}),
    ("r/a", "kid0a", "c1", "markdown", "spark engine fast",
     {"Parent_Path": ["parent0"]}),
    ("r/a", "kid0b", "c2", "markdown", "spark spark spark slow",
     {"Parent_Path": ["parent0"]}),
    ("r/a", "parent1", "c3", "markdown", "umbrella record beta", {}),
    ("r/a", "kid1a", "c4", "markdown", "spark join",
     {"Parent_Path": ["parent1"]}),
    ("r/a", "solo", "c5", "markdown", "spark standalone", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blockjoin"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("parent-path",),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="bj")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _child_scores(engine, q):
    return dict(engine.boost_query_search(q, "qqqzzz", k=100, weight=0.0))


def test_parent_max_is_best_child(engine, ids):
    got = dict(engine.parent_search("spark", "parent-path", k=10))
    cs = _child_scores(engine, "spark")
    assert got.keys() == {ids["parent0"], ids["parent1"]}
    assert got[ids["parent0"]] == pytest.approx(
        max(cs[ids["kid0a"]], cs[ids["kid0b"]])
    )
    assert got[ids["parent1"]] == pytest.approx(cs[ids["kid1a"]])


@pytest.mark.parametrize("mode,fn", [
    ("total", lambda a, b: a + b),
    ("avg", lambda a, b: (a + b) / 2),
    ("min", min),
])
def test_parent_score_modes(engine, ids, mode, fn):
    got = dict(engine.parent_search("spark", "parent-path", k=10,
                                    score_mode=mode))
    cs = _child_scores(engine, "spark")
    assert got[ids["parent0"]] == pytest.approx(
        fn(cs[ids["kid0a"]], cs[ids["kid0b"]])
    )


def test_parent_score_mode_none(engine, ids):
    got = engine.parent_search("spark", "parent-path", k=10,
                               score_mode="none")
    assert got == [(ids["parent0"], 1.0), (ids["parent1"], 1.0)] or \
        got == [(ids["parent1"], 1.0), (ids["parent0"], 1.0)]
    # constant score ties break doc-id asc
    assert got[0][0] == min(ids["parent0"], ids["parent1"])


def test_parent_never_admits_non_parents(engine, ids):
    # 'solo' matches spark but is nobody's parent; kids match but are
    # not parents — only parent docs come back
    got = {d for d, _ in engine.parent_search("spark", "parent-path")}
    assert ids["solo"] not in got
    assert ids["kid0a"] not in got


def test_child_inherits_parent_score(engine, ids):
    ps = _child_scores(engine, "umbrella alpha")
    got = dict(engine.child_search("umbrella alpha", "parent-path", k=10))
    assert got == {
        ids["kid0a"]: pytest.approx(ps[ids["parent0"]]),
        ids["kid0b"]: pytest.approx(ps[ids["parent0"]]),
    }


def test_child_of_all_parents(engine, ids):
    got = {d for d, _ in engine.child_search("umbrella", "parent-path",
                                             k=10)}
    assert got == {ids["kid0a"], ids["kid0b"], ids["kid1a"]}


def test_no_match_returns_empty(engine):
    assert engine.parent_search("qqqzzz", "parent-path") == []
    assert engine.child_search("qqqzzz", "parent-path") == []


def test_k_window(engine, ids):
    got = engine.parent_search("spark", "parent-path", k=1)
    assert len(got) == 1


def test_validation(engine):
    with pytest.raises(ValidationError):
        engine.parent_search("spark", "")
    with pytest.raises(ValidationError):
        engine.parent_search("spark", "parent-path", score_mode="frob")
    with pytest.raises(ValidationError):
        engine.parent_search("", "parent-path")
    with pytest.raises(ValidationError):
        engine.child_search("spark", "parent-path", k=0)


def test_cli_blockjoin(engine, ids, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    rc = climod.main([
        "query", "--index", engine.root, "--q", "spark",
        "--parent-of", "parent-path", "--score-mode", "total", "-k", "5",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    want = engine.parent_search("spark", "parent-path", k=5,
                                score_mode="total")
    assert [(x["doc_id"], x["score"]) for x in lines] == [
        (d, round(s, 6)) for d, s in want
    ]
    rc = climod.main([
        "query", "--index", engine.root, "--q", "umbrella",
        "--child-of", "parent-path", "-k", "5",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    want = engine.child_search("umbrella", "parent-path", k=5)
    assert [(x["doc_id"], x["score"]) for x in lines] == [
        (d, round(s, 6)) for d, s in want
    ]
