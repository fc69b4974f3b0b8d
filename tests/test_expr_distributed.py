"""Distributed boolean-expression evaluation (search_expr_distributed)
— the cluster-scale twin of search_expr: one segments scan + one pivot
aggregate + full-outer metadata joins, AST compiled to a single Catalyst
(match, score) expression. Pinned rank+score identical to the driver
evaluator across the full leaf surface (terms, groups, boosts, NOT,
phrases, wildcard/fuzzy rewrites, fielded clauses, ranges), including
tombstones, and proven to never pull posting lists to the driver."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta gamma",
     {"Source_Name": ["web"], "Lang": ["en"]}),
    ("r/a", "p1", "c1", "markdown", "alpha beta",
     {"Source_Name": ["web"], "Lang": ["de"]}),
    ("r/a", "p2", "c2", "markdown", "alpha delta",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p3", "c3", "markdown", "beta gamma delta",
     {"Source_Name": ["book"], "Lang": ["en"]}),
    ("r/a", "p4", "c4", "markdown", "delta epsilon",
     {"Source_Name": ["wiki"], "Lang": ["en"]}),
    ("r/a", "p5", "c5", "markdown", "alphabet alpha soup",
     {"Source_Name": ["wiki"], "Lang": ["de"]}),
    ("r/a", "p6", "c6", "markdown", "epsilon zeta",
     {"Source_Name": ["deep web"], "Lang": ["en"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

EXPRS = [
    "alpha",
    "alpha AND beta",
    "alpha beta",  # juxtaposition = AND
    "(alpha OR delta) AND -beta",
    "alpha^2 OR delta",
    "alph*",
    "alph* AND beta",
    "beta~1",
    "beta~ OR soup",
    "lang:de^2 AND alpha",
    "source-name:deep-web",
    "lang:[de TO en] AND alpha",
    "lang:{de TO en] AND delta",
    "alpha -lang:[de TO de]",
    '"alpha beta" OR delta',
    '"alpha beta"^3 AND -gamma',
    '"beta gamma"~1 OR zeta',
    "alpha AND nosuch:x OR delta",
    "zz* OR alpha",
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exprdist"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ed")
    return eng


@pytest.mark.parametrize("expr", EXPRS)
def test_distributed_matches_driver_evaluator(engine, expr):
    drv = engine.search_expr(expr, k=10)
    dst = engine.search_expr_distributed(expr, k=10)
    assert [d for d, _ in dst] == [d for d, _ in drv]
    for (_, a), (_, b) in zip(dst, drv):
        assert a == pytest.approx(b, rel=1e-9)


def test_distributed_k_window(engine):
    full = engine.search_expr_distributed("alpha OR beta OR delta", k=10)
    assert len(full) > 2
    assert engine.search_expr_distributed(
        "alpha OR beta OR delta", k=2) == full[:2]


def test_distributed_respects_tombstones(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exprdistdel"))
    eng = ExtractorEngine(
        spark, root, n_buckets=4, salt_threshold=50,
        indexed_fields=("lang",),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="edd")
    expr = '(alpha OR "beta gamma") AND lang:[de TO en]'
    before = eng.search_expr_distributed(expr, k=10)
    victim = before[0][0]
    eng.delete([victim])
    after = eng.search_expr_distributed(expr, k=10)
    assert victim not in {d for d, _ in after}
    drv = eng.search_expr(expr, k=10)
    assert [d for d, _ in after] == [d for d, _ in drv]


def test_distributed_never_collects_postings(engine, monkeypatch):
    """The distributed evaluator must not route through the driver
    kernels' posting fetch — doc ids stay cluster-side until the final
    k-limit."""
    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("driver posting fetch in distributed path")

    monkeypatch.setattr(engine, "_term_postings", boom)
    monkeypatch.setattr(engine, "_segment_rows", boom)
    hits = engine.search_expr_distributed(
        '(alpha OR "beta gamma") AND lang:[de TO en] -soup', k=10
    )
    assert hits
