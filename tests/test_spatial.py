"""Spatial search — Solr {!geofilt sfield= pt= d=} + geodist() sort
(LatLonPointSpatialField). Points live in metadata as "lat,lon"; the
haversine runs as one Catalyst expression with Solr's earth mean
radius (6371.0087714 km) pinned."""

from __future__ import annotations

import math

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", "p0", "c0", "md", "spark alpha", {"Loc": ["0.0,0.0"]}),
    ("r/a", "p1", "c1", "md", "spark beta", {"Loc": ["0.0,1.0"]}),
    ("r/a", "p2", "c2", "md", "spark gamma", {"Loc": ["1.0,0.0"]}),
    ("r/a", "p3", "c3", "md", "spark delta", {"Loc": ["10.0,10.0"]}),
    ("r/a", "p4", "c4", "md", "spark eps", {"Loc": ["0.05,0.05"]}),
    ("r/a", "p5", "c5", "md", "spark zeta", {}),
    ("r/a", "p6", "c6", "md", "spark bad", {"Loc": ["garbage"]}),
    ("r/a", "p7", "c7", "md", "nomatch", {"Loc": ["0,0"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

R = 6371.0087714


def hav(a, b):
    la1, lo1, la2, lo2 = map(math.radians, [*a, *b])
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2)
         * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * R * math.asin(min(1.0, math.sqrt(h)))


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spatial"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("loc",),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="sp")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def test_geofilt_and_distance_sort(engine, ids):
    got = engine.spatial_search("spark", "loc", (0.0, 0.0), 50.0)
    assert [d for d, _ in got] == [ids["p0"], ids["p4"]]
    assert got[0][1] == pytest.approx(0.0)
    assert got[1][1] == pytest.approx(hav((0, 0), (0.05, 0.05)),
                                      rel=1e-9)


def test_wider_radius(engine, ids):
    got = engine.spatial_search("spark", "loc", (0.0, 0.0), 120.0)
    assert [d for d, _ in got] == [
        ids["p0"], ids["p4"], ids["p1"], ids["p2"],
    ]
    by_id = dict(got)
    assert by_id[ids["p1"]] == pytest.approx(hav((0, 0), (0, 1)),
                                             rel=1e-9)
    assert by_id[ids["p2"]] == pytest.approx(hav((0, 0), (1, 0)),
                                             rel=1e-9)


def test_missing_malformed_and_unmatched_excluded(engine, ids):
    got = engine.spatial_search("spark", "loc", (0.0, 0.0), 30000.0)
    returned = {d for d, _ in got}
    # p5 (no Loc) and p6 (malformed) never match; p7 fails the query
    assert ids["p5"] not in returned
    assert ids["p6"] not in returned
    assert ids["p7"] not in returned
    assert ids["p3"] in returned


def test_sort_doc_id_and_k(engine, ids):
    got = engine.spatial_search("spark", "loc", (0.0, 0.0), 120.0,
                                sort="doc_id")
    assert [d for d, _ in got] == sorted(
        ids[p] for p in ("p0", "p1", "p2", "p4")
    )
    got2 = engine.spatial_search("spark", "loc", (0.0, 0.0), 120.0, k=2)
    assert [d for d, _ in got2] == [ids["p0"], ids["p4"]]


@pytest.mark.parametrize("kwargs", [
    {"pt": (91.0, 0.0)},
    {"pt": (0.0, 181.0)},
    {"pt": (0.0,)},
    {"pt": (True, 0.0)},
    {"d_km": 0},
    {"d_km": -5},
    {"sort": "score"},
    {"field": " "},
])
def test_validation(engine, kwargs):
    base = {"query": "spark", "field": "loc", "pt": (0.0, 0.0),
            "d_km": 10.0}
    base.update(kwargs)
    with pytest.raises(ValidationError):
        engine.spatial_search(**base)


def test_cli_spatial(engine, ids, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    rc = climod.main([
        "query", "--index", engine.root, "--q", "spark",
        "--geo-field", "loc", "--geo-pt", "0,0", "--geo-d", "120",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    want = engine.spatial_search("spark", "loc", (0.0, 0.0), 120.0)
    assert [(x["doc_id"], x["dist_km"]) for x in lines] == [
        (d, round(dist, 6)) for d, dist in want
    ]
