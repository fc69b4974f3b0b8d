"""Solr streaming expressions (/stream) — parser unit coverage +
engine dataflow semantics.

Reference analog: the reference's Solr exposes /stream, a pipelined
tuple-stream dataflow language; here each expression compiles to one
lazy Catalyst plan (operators/streamexpr.py)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.streamexpr import (
    Node,
    Num,
    Str,
    StreamExprError,
    parse_stream_expr,
)

DOCS = [
    ("r/a", "p0", "c0", "md", "alpha spark",
     {"Lang": ["py"], "Size": ["10"]}),
    ("r/a", "p1", "c1", "md", "spark beta",
     {"Lang": ["py"], "Size": ["30"]}),
    ("r/a", "p2", "c2", "md", "spark gamma",
     {"Lang": ["js"], "Size": ["20"]}),
    ("r/a", "p3", "c3", "md", "spark delta beta",
     {"Lang": ["js"], "Size": ["40"]}),
    ("r/a", "p4", "c4", "md", "spark epsilon",
     {"Lang": ["go"], "Size": ["60"]}),
    ("r/a", "p5", "c5", "md", "nomatch", {"Lang": ["py"],
                                          "Size": ["99"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("streamexpr"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("lang", "size"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="se")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _scores(engine, q):
    return dict(engine.boost_query_search(q, "qqqzzz", k=100, weight=0.0))


# -- parser -------------------------------------------------------------------


def test_parse_shapes():
    n = parse_stream_expr(
        'top(search(idx, q="spark", fl="doc_id,score"), n=3, '
        'sort="score desc")'
    )
    assert n.name == "top"
    assert isinstance(n.args[0], Node) and n.args[0].name == "search"
    assert n.params["n"] == Num(3.0)
    assert n.args[0].params["q"] == Str("spark")


def test_parse_hyphenated_field():
    # cleaned metadata keys carry dashes: sum(n-chars) must lex
    n = parse_stream_expr('rollup(s(x, q="a"), over="lang", sum(n-chars))')
    assert n.args[1].args == [Str("n-chars")]


def test_parse_escapes_and_star():
    n = parse_stream_expr('rollup(s(x, q="a \\"b\\""), over="l", count(*))')
    assert n.args[0].params["q"] == Str('a "b"')
    assert n.args[1].args == [Str("*")]


@pytest.mark.parametrize("bad", [
    "", "search", "search(", "search(idx,, q=\"a\")",
    'search(idx, q="a") trailing', 'f(a=1, a=2)', "top(n=)",
])
def test_parse_rejections(bad):
    with pytest.raises(StreamExprError):
        parse_stream_expr(bad)


# -- engine dataflow ----------------------------------------------------------


def test_search_fl_sort_rows(engine, ids):
    rows = engine.stream(
        'search(idx, q="spark", fl="doc_id,score,lang,size", '
        'sort="score desc, doc_id asc", rows=3)'
    )
    sc = _scores(engine, "spark")
    want = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], pytest.approx(r["score"])) for r in rows] == [
        (d, pytest.approx(s)) for d, s in want
    ]
    assert set(rows[0]) == {"doc_id", "score", "lang", "size"}
    by_path = {v: k for k, v in ids.items()}
    for r in rows:
        p = by_path[r["doc_id"]]
        src = dict(zip([d[1] for d in DOCS], DOCS))[p]
        assert r["lang"] == src[5]["Lang"][0]
        assert r["size"] == src[5]["Size"][0]


def test_select_rename(engine):
    rows = engine.stream(
        'select(search(idx, q="spark", fl="doc_id,size"), '
        '"doc_id", "size as sz")'
    )
    assert rows and set(rows[0]) == {"doc_id", "sz"}


def test_rollup_and_having(engine):
    rows = engine.stream(
        'rollup(search(idx, q="spark", fl="doc_id,lang,size"), '
        'over="lang", sum(size), count(*))'
    )
    got = {r["lang"]: (r["sum(size)"], r["count(*)"]) for r in rows}
    assert got == {"py": (40.0, 2), "js": (60.0, 2), "go": (60.0, 1)}
    rows2 = engine.stream(
        'having(rollup(search(idx, q="spark", fl="doc_id,lang,size"), '
        'over="lang", sum(size), count(*)), '
        'and(gt(sum(size), 45), eq(count(*), 2)))'
    )
    assert [r["lang"] for r in rows2] == ["js"]


def test_inner_and_hash_join(engine, ids):
    expr = (
        'innerJoin(search(idx, q="spark", fl="doc_id,score"), '
        'search(idx, q="beta", fl="doc_id,lang"), on="doc_id")'
    )
    rows = engine.stream(expr)
    assert {r["doc_id"] for r in rows} == {ids["p1"], ids["p3"]}
    assert set(rows[0]) == {"doc_id", "score", "lang"}
    hj = (
        'hashJoin(search(idx, q="spark", fl="doc_id,score"), '
        'hashed=search(idx, q="beta", fl="doc_id,lang"), on="doc_id")'
    )
    hrows = engine.stream(hj)
    assert {r["doc_id"] for r in hrows} == {ids["p1"], ids["p3"]}
    plan = engine.stream_expr(hj)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_left_outer_join(engine, ids):
    rows = engine.stream(
        'leftOuterJoin(search(idx, q="spark", fl="doc_id,score"), '
        'search(idx, q="beta", fl="doc_id,lang"), on="doc_id")'
    )
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 5
    assert by_id[ids["p1"]]["lang"] == "py"
    assert by_id[ids["p0"]]["lang"] is None


def test_top_unique_merge(engine, ids):
    rows = engine.stream(
        'top(search(idx, q="spark", fl="doc_id,size"), n=2, '
        'sort="size desc")'
    )
    assert [r["size"] for r in rows] == ["60", "40"]
    u = engine.stream(
        'unique(search(idx, q="spark", fl="doc_id,lang"), over="lang")'
    )
    # pinned: per-key MIN of the other columns
    assert {r["lang"]: r["doc_id"] for r in u} == {
        "py": min(ids["p0"], ids["p1"]),
        "js": min(ids["p2"], ids["p3"]),
        "go": ids["p4"],
    }
    m = engine.stream(
        'merge(search(idx, q="beta", fl="doc_id"), '
        'search(idx, q="epsilon", fl="doc_id"), on="doc_id asc")'
    )
    assert [r["doc_id"] for r in m] == sorted(
        [ids["p1"], ids["p3"], ids["p4"]]
    )


def test_intersect_complement(engine, ids):
    i = engine.stream(
        'intersect(search(idx, q="spark", fl="doc_id"), '
        'search(idx, q="beta", fl="doc_id"), on="doc_id")'
    )
    assert {r["doc_id"] for r in i} == {ids["p1"], ids["p3"]}
    c = engine.stream(
        'complement(search(idx, q="spark", fl="doc_id"), '
        'search(idx, q="beta", fl="doc_id"), on="doc_id")'
    )
    assert {r["doc_id"] for r in c} == {
        ids["p0"], ids["p2"], ids["p4"]
    }


def test_fetch_enrichment(engine, ids):
    rows = engine.stream(
        'fetch(idx, search(idx, q="beta", fl="doc_id,score"), '
        'fl="size,path", on="doc_id")'
    )
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[ids["p1"]]["size"] == "30"
    assert by_id[ids["p1"]]["path"] == "p1"


def test_empty_search_keeps_schema(engine):
    rows = engine.stream(
        'rollup(search(idx, q="zzznope", fl="doc_id,lang,size"), '
        'over="lang", sum(size))'
    )
    assert rows == []
    df = engine.stream_expr('search(idx, q="zzznope", fl="doc_id,score")')
    assert df.columns == ["doc_id", "score"]


@pytest.mark.parametrize("bad", [
    'explode(search(idx, q="a", fl="doc_id"))',
    'search(idx, fl="doc_id")',
    'search(idx, q="a")',
    'search(idx, q="a", fl="doc_id", rows=0)',
    'top(search(idx, q="a", fl="doc_id"), n=2)',
    'rollup(search(idx, q="a", fl="doc_id"), over="lang")',
    'fetch(idx, search(idx, q="a", fl="doc_id"), fl="score", '
    'on="doc_id")',
])
def test_validation(engine, bad):
    with pytest.raises(ValidationError):
        engine.stream(bad)


def test_cli_stream(engine, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    rc = climod.main([
        "stream", "--index", engine.root, "--expr",
        'sort(rollup(search(idx, q="spark", fl="doc_id,lang"), '
        'over="lang", count(*)), by="lang asc")',
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert lines == [
        {"lang": "go", "count(*)": 1},
        {"lang": "js", "count(*)": 2},
        {"lang": "py", "count(*)": 2},
    ]


def test_stream_bounds_rows(engine):
    rows = engine.stream(
        'search(idx, q="spark", fl="doc_id")', max_rows=2
    )
    assert len(rows) == 2
    with pytest.raises(ValidationError):
        engine.stream('search(idx, q="spark", fl="doc_id")', max_rows=0)
