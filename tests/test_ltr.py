"""Learning-to-rank rerank — Solr LTR contrib (LinearModel +
OriginalScore/value-source features, MinMax/Standard normalizers,
reRankDocs window)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/a", "p0", "c0", "md", "alpha beta spark",
     {"Size": ["5"]}),
    ("r/a", "p1", "c1", "md", "alpha spark join",
     {"Size": ["15"]}),
    ("r/a", "p2", "c2", "md", "spark stream stream",
     {"Size": ["25"]}),
    ("r/a", "p3", "c3", "md", "spark join stream", {}),
    ("r/a", "p4", "c4", "md", "nothing else", {"Size": ["99"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ltr"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("size",),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ltr")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _scores(engine, q):
    return dict(engine.boost_query_search(q, "qqqzzz", k=100, weight=0.0))


def _sizes(ids):
    return {ids[p]: float(d[5]["Size"][0])
            for p, d in zip([x[1] for x in DOCS], DOCS) if d[5]}


def test_original_score_identity(engine):
    got = engine.ltr_rerank(
        "spark", {"orig": "originalScore"}, {"orig": 1.0}, k=10,
    )
    sc = _scores(engine, "spark")
    want = sorted(sc.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    assert [(d, pytest.approx(s)) for d, s in got] == [
        (d, pytest.approx(s)) for d, s in want
    ]


def test_linear_model_closed_form(engine, ids):
    got = dict(engine.ltr_rerank(
        "spark",
        {"orig": "originalScore", "sz": "size"},
        {"orig": 1.0, "sz": 0.01},
        k=10,
    ))
    sc = _scores(engine, "spark")
    sizes = _sizes(ids)
    for d, s in sc.items():
        want = s + 0.01 * sizes.get(d, 0.0)  # missing field reads 0
        assert got[d] == pytest.approx(want)


def test_normalizers(engine, ids):
    got = dict(engine.ltr_rerank(
        "spark",
        {"sz": "size", "sz2": "size"},
        {"sz": 1.0, "sz2": 1.0},
        normalizers={"sz": ("minmax", 0, 100),
                     "sz2": ("standard", 20.0, 10.0)},
        k=10,
    ))
    sizes = _sizes(ids)
    for d in got:
        v = sizes.get(d, 0.0)
        assert got[d] == pytest.approx(v / 100 + (v - 20.0) / 10.0)


def test_rerank_window(engine, ids):
    """Docs outside the top-rerank_docs original window never enter,
    even when the model would score them higher."""
    sc = _scores(engine, "spark")
    top1 = max(sc.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    got = engine.ltr_rerank(
        "spark", {"sz": "size"}, {"sz": 1.0}, rerank_docs=1, k=1,
    )
    assert [d for d, _ in got] == [top1]
    full = engine.ltr_rerank(
        "spark", {"sz": "size"}, {"sz": 1.0}, rerank_docs=100, k=1,
    )
    sizes = _sizes(ids)
    best_by_size = max(
        (d for d in sc), key=lambda d: (sizes.get(d, 0.0), -d)
    )
    assert [d for d, _ in full] == [best_by_size]


def test_no_match_empty(engine):
    assert engine.ltr_rerank(
        "zzznope", {"orig": "originalScore"}, {"orig": 1.0}
    ) == []


@pytest.mark.parametrize("kwargs", [
    {"features": {}},
    {"features": {"f": "originalScore"}, "weights": {}},
    {"features": {"f": "originalScore"}, "weights": {"g": 1.0}},
    {"features": {"f": "bad(("}},
    {"rerank_docs": 0},
    {"rerank_docs": 5, "k": 10},
    {"normalizers": {"nope": ("minmax", 0, 1)}},
    {"normalizers": {"f": ("minmax", 1, 1)}},
    {"normalizers": {"f": ("standard", 0, 0)}},
    {"normalizers": {"f": ("median", 0, 1)}},
])
def test_validation(engine, kwargs):
    base = {"query": "spark",
            "features": {"f": "originalScore"},
            "weights": {"f": 1.0}}
    base.update(kwargs)
    if "weights" not in kwargs and "features" in kwargs:
        base["weights"] = {n: 1.0 for n in kwargs["features"]}
    with pytest.raises(ValidationError):
        engine.ltr_rerank(**base)
