"""Solr JSON Facet API — spec validation + engine semantics.

Reference analog: the reference indexes into Solr, whose JSON Facet
API (json.facet={...}) provides nested terms/range/query buckets with
per-bucket statistics; CKAN's package_search facets run over the same
index (plugin.py IPackageController)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.jsonfacet import (
    JsonFacetError,
    StatAgg,
    parse_facet_spec,
    parse_stat,
    referenced_queries,
    referenced_stat_fields,
)

DOCS = [
    ("r/a", "p0", "c0", "md", "alpha spark",
     {"Lang": ["python"], "Size": ["10"], "Src": ["a"]}),
    ("r/a", "p1", "c1", "md", "spark beta",
     {"Lang": ["python"], "Size": ["30"], "Src": ["b"]}),
    ("r/a", "p2", "c2", "md", "spark gamma",
     {"Lang": ["java"], "Size": ["20"], "Src": ["a"]}),
    ("r/a", "p3", "c3", "md", "spark delta",
     {"Lang": ["java"], "Size": ["40"], "Src": ["a"]}),
    ("r/a", "p4", "c4", "md", "spark eps",
     {"Lang": ["java"], "Size": ["60"], "Src": ["b"]}),
    ("r/a", "p5", "c5", "md", "other text",
     {"Lang": ["python"], "Size": ["99"], "Src": ["a"]}),
    # no Lang: counted in the match count, absent from Lang buckets
    ("r/a", "p6", "c6", "md", "spark zeta", {"Size": ["50"]}),
    ("r/a", "p7", "c7", "md", "spark eta",
     {"Lang": ["java"], "Size": ["70"], "Src": ["a"]}),
    # multi-valued metadata collapses to ONE ', '-joined bucket value
    # at extract (reference tasks.py:89-95) — pinned in the module doc
    ("r/a", "p8", "c8", "md", "spark theta",
     {"Lang": ["python", "java"], "Size": ["80"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jsonfacet"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("lang", "size", "src"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="jf")
    return eng


# -- spec parsing -------------------------------------------------------------


def test_parse_stat_shapes():
    assert parse_stat("avg(size)") == StatAgg("avg", "size")
    assert parse_stat(" sum( n-chars ) ") == StatAgg("sum", "n-chars")
    assert parse_stat("percentile(size, 50)") == StatAgg(
        "percentile", "size", 0.5
    )


@pytest.mark.parametrize("bad", [
    "median(size)", "avg()", "avg(a,b)", "percentile(size)",
    "percentile(size, 0)", "percentile(size, 101)", "avg(size",
])
def test_parse_stat_rejections(bad):
    with pytest.raises(JsonFacetError):
        parse_stat(bad)


@pytest.mark.parametrize("bad_spec", [
    {},                                     # empty
    {"count": "sum(size)"},                 # reserved name
    {"x": {"type": "nope", "field": "f"}},  # unknown type
    {"x": {"type": "terms"}},               # missing field
    {"x": {"type": "terms", "field": "f", "limit": 0}},
    {"x": {"type": "terms", "field": "f", "sort": {"y": "desc"}}},
    {"x": {"type": "terms", "field": "f", "bogus": 1}},
    {"x": {"type": "range", "field": "f", "start": 0, "end": 0,
           "gap": 10}},                      # end <= start
    {"x": {"type": "range", "field": "f", "start": 0, "end": 10}},
    {"x": {"type": "query"}},                # missing q
    {"x": 42},                               # not str/dict
])
def test_parse_spec_rejections(bad_spec):
    with pytest.raises(JsonFacetError):
        parse_facet_spec(bad_spec)


def test_parse_spec_nesting_cap():
    node: dict = {"type": "terms", "field": "f"}
    for _ in range(5):
        node = {"type": "terms", "field": "f", "facet": {"n": node}}
    with pytest.raises(JsonFacetError):
        parse_facet_spec({"deep": node})


def test_referenced_sets():
    fs = parse_facet_spec({
        "langs": {"type": "terms", "field": "lang", "facet": {
            "u": "unique(src)", "a": "avg(size)",
            "inner": {"type": "query", "q": "beta"},
        }},
        "r": {"type": "range", "field": "size", "start": 0, "end": 10,
              "gap": 5},
        "q2": {"type": "query", "q": "beta"},
    })
    num, raw = referenced_stat_fields(fs)
    assert num == {"size"} and raw == {"src"}
    # the same q appearing twice compiles to ONE flag column
    assert referenced_queries(fs) == ["beta"]


# -- engine semantics ---------------------------------------------------------


def test_terms_with_stats(engine):
    out = engine.json_facets("spark", {
        "langs": {"type": "terms", "field": "lang",
                  "facet": {"avg_size": "avg(size)"}},
    })
    assert out["count"] == 8
    buckets = out["langs"]["buckets"]
    # count sort: java 4 (p2,p3,p4,p7), python 2 (p0,p1), and p8's
    # collapsed multi-value its own 'python, java' bucket
    assert [(b["val"], b["count"]) for b in buckets] == [
        ("java", 4), ("python", 2), ("python, java", 1),
    ]
    assert buckets[0]["avg_size"] == pytest.approx((20+40+60+70) / 4)
    assert buckets[1]["avg_size"] == pytest.approx((10+30) / 2)
    assert buckets[2]["avg_size"] == pytest.approx(80.0)


def test_sort_by_stat_and_index(engine):
    out = engine.json_facets("spark", {
        "langs": {"type": "terms", "field": "lang",
                  "sort": {"avg_size": "asc"},
                  "facet": {"avg_size": "avg(size)"}},
    })
    assert [b["val"] for b in out["langs"]["buckets"]] == [
        "python", "java", "python, java",
    ]
    out2 = engine.json_facets("spark", {
        "langs": {"type": "terms", "field": "lang", "sort": "index"},
    })
    assert [b["val"] for b in out2["langs"]["buckets"]] == [
        "java", "python", "python, java",
    ]


def test_nested_terms_prune_and_limit(engine):
    out = engine.json_facets("spark", {
        "langs": {"type": "terms", "field": "lang", "facet": {
            "srcs": {"type": "terms", "field": "src", "limit": 1},
        }},
    })
    by_val = {b["val"]: b for b in out["langs"]["buckets"]}
    # limit=1 keeps only the top sub-bucket per parent
    assert [(b["val"], b["count"])
            for b in by_val["java"]["srcs"]["buckets"]] == [("a", 3)]
    assert [(b["val"], b["count"])
            for b in by_val["python"]["srcs"]["buckets"]] == [("a", 1)]


def test_query_facets_top_and_nested(engine):
    out = engine.json_facets("spark", {
        "has_beta": {"type": "query", "q": "beta"},
        "langs": {"type": "terms", "field": "lang", "facet": {
            "has_beta": {"type": "query", "q": "beta"},
        }},
    })
    assert out["has_beta"] == {"count": 1}
    by_val = {b["val"]: b for b in out["langs"]["buckets"]}
    assert by_val["python"]["has_beta"] == {"count": 1}
    assert by_val["java"]["has_beta"] == {"count": 0}


def test_range_zero_fill(engine):
    out = engine.json_facets("spark", {
        "sizes": {"type": "range", "field": "size",
                  "start": 0, "end": 125, "gap": 25},
    })
    # sizes of matching docs: 10,30,20,40,60,50,70,80
    assert [(b["val"], b["count"]) for b in out["sizes"]["buckets"]] == [
        (0.0, 2), (25.0, 2), (50.0, 3), (75.0, 1), (100.0, 0),
    ]
    out2 = engine.json_facets("spark", {
        "sizes": {"type": "range", "field": "size", "start": 0,
                  "end": 125, "gap": 25, "mincount": 1},
    })
    assert [b["val"] for b in out2["sizes"]["buckets"]] == [
        0.0, 25.0, 50.0, 75.0,
    ]


def test_range_nested_stat(engine):
    out = engine.json_facets("spark", {
        "sizes": {"type": "range", "field": "size",
                  "start": 0, "end": 50, "gap": 25,
                  "facet": {"mx": "max(size)"}},
    })
    assert [(b["val"], b["count"], b["mx"])
            for b in out["sizes"]["buckets"]] == [
        (0.0, 2, 20.0), (25.0, 2, 40.0),
    ]


def test_top_level_stats(engine):
    out = engine.json_facets("spark", {
        "total": "sum(size)",
        "nlangs": "unique(lang)",
        "med": "percentile(size, 50)",
    })
    assert out["total"] == pytest.approx(10+30+20+40+60+50+70+80)
    # unique counts distinct collapsed values:
    # {python, java, 'python, java'} = 3
    assert out["nlangs"] == 3
    # exact interpolated median of 10,20,30,40,50,60,70,80
    assert out["med"] == pytest.approx(45.0)


def test_no_match_shell(engine):
    out = engine.json_facets("zzzznope", {
        "total": "sum(size)",
        "q2": {"type": "query", "q": "beta"},
        "langs": {"type": "terms", "field": "lang"},
    })
    assert out == {
        "count": 0, "total": None, "q2": {"count": 0},
        "langs": {"buckets": []},
    }


def test_mincount_and_unlimited(engine):
    out = engine.json_facets("spark", {
        "langs": {"type": "terms", "field": "lang", "mincount": 4},
    })
    assert [b["val"] for b in out["langs"]["buckets"]] == ["java"]
    out2 = engine.json_facets("spark", {
        "srcs": {"type": "terms", "field": "src", "limit": -1},
    })
    assert [(b["val"], b["count"]) for b in out2["srcs"]["buckets"]] == [
        ("a", 4), ("b", 2),
    ]


def test_cli_json_facets(engine, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    spec = {"langs": {"type": "terms", "field": "lang",
                      "facet": {"avg_size": "avg(size)"}}}
    rc = climod.main([
        "facets", "--index", engine.root, "--q", "spark",
        "--json", json.dumps(spec),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out == engine.json_facets("spark", spec)


def test_bad_spec_raises_validation_error(engine):
    with pytest.raises(ValidationError):
        engine.json_facets("spark", {"x": {"type": "nope"}})
    with pytest.raises(ValidationError):
        engine.json_facets("", {"langs": {"type": "terms",
                                          "field": "lang"}})
