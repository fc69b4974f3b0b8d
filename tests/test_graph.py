"""Graph traversal — Solr {!graph from= to= maxDepth= returnRoot=}
(Lucene GraphQuery / the nodes() graph streaming expression).

Edges are metadata values: doc A -> doc B when A's from_field value
equals B's node key (path, or a metadata to_field). Multi-valued
metadata was collapsed to ', '-joined scalars at extract, so edge
fields are split back at query time (one doc, several outgoing
edges)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

# p0 (root) branches to p1+p2, both reach p3, p3 cycles back to p0;
# p4 is unreachable; p5 is a second root with no outgoing edges
DOCS = [
    ("r/a", "p0", "c0", "md", "root alpha",
     {"Next": ["p1", "p2"], "Id": ["n0"], "Ref": ["n1"]}),
    ("r/a", "p1", "c1", "md", "alpha beta",
     {"Next": ["p3"], "Id": ["n1"]}),
    ("r/a", "p2", "c2", "md", "beta gamma",
     {"Next": ["p3"], "Id": ["n2"]}),
    ("r/a", "p3", "c3", "md", "gamma delta",
     {"Next": ["p0"], "Id": ["n3"]}),
    ("r/a", "p4", "c4", "md", "isolated spark", {"Id": ["n4"]}),
    ("r/a", "p5", "c5", "md", "other root", {"Id": ["n5"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("graph"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("next", "id", "ref"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="g")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def test_fixpoint_traversal_with_cycle(engine, ids):
    got = engine.graph_search("root", "next")
    # roots {p0, p5}; p0 -> p1, p2 (split multi-edge) -> p3 -> p0
    # (cycle terminates); p4 unreachable
    assert got == sorted(ids[p] for p in ("p0", "p1", "p2", "p3", "p5"))


def test_max_depth(engine, ids):
    assert engine.graph_search("root", "next", max_depth=0) == sorted(
        ids[p] for p in ("p0", "p5")
    )
    assert engine.graph_search("root", "next", max_depth=1) == sorted(
        ids[p] for p in ("p0", "p1", "p2", "p5")
    )
    assert engine.graph_search("root", "next", max_depth=2) == sorted(
        ids[p] for p in ("p0", "p1", "p2", "p3", "p5")
    )


def test_return_root_false(engine, ids):
    # p0 stays (re-reached through the p3 -> p0 edge); p5 drops
    got = engine.graph_search("root", "next", return_root=False)
    assert got == sorted(ids[p] for p in ("p0", "p1", "p2", "p3"))
    assert engine.graph_search(
        "root", "next", max_depth=0, return_root=False
    ) == []


def test_metadata_to_field(engine, ids):
    # from=ref to=id: p0's ref n1 reaches p1 (id n1); p1 has no ref
    got = engine.graph_search("root", "ref", to_field="id")
    assert got == sorted(ids[p] for p in ("p0", "p1", "p5"))


def test_no_match_and_no_edges(engine, ids):
    assert engine.graph_search("zzznope", "next") == []
    # a from_field nobody carries: traversal is just the root set
    assert engine.graph_search("root", "nosuchfield") == sorted(
        ids[p] for p in ("p0", "p5")
    )


def test_cli_graph(engine, ids, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    rc = climod.main([
        "query", "--index", engine.root, "--q", "root",
        "--graph-from", "next", "--graph-depth", "1",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert [x["doc_id"] for x in lines] == engine.graph_search(
        "root", "next", max_depth=1
    )


@pytest.mark.parametrize("kwargs", [
    {"max_depth": -2},
    {"max_depth": 1.5},
    {"from_field": ""},
    {"to_field": " "},
    {"return_root": "yes"},
])
def test_validation(engine, kwargs):
    base = {"root_query": "root", "from_field": "next"}
    base.update(kwargs)
    with pytest.raises(ValidationError):
        engine.graph_search(**base)
