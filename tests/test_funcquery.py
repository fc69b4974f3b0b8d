"""Solr function-query expression language (value sources) —
parse/compile unit coverage + engine boosting parity.

Reference analog: the reference's Solr install accepts bf=/boost=
value-source expressions (Solr "Function Queries"); here the same
language compiles to one Catalyst column over the metadata pivot."""

from __future__ import annotations

import math

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.funcquery import (
    Call,
    FieldRef,
    FuncQuerySyntaxError,
    Lit,
    compile_funcquery,
    parse_funcquery,
    referenced_fields,
)

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta spark",
     {"Size": ["5"], "Pop": ["2"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Size": ["15"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream stream",
     {"Size": ["25"], "Pop": ["4"]}),
    ("r/a", "p3", "c3", "markdown", "spark join stream", {}),
    ("r/a", "p4", "c4", "markdown", "nothing else", {"Size": ["99"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("funcquery"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("size", "pop"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="fq")
    return eng


# -- parser -------------------------------------------------------------------


def test_parse_shapes():
    assert parse_funcquery("3.5") == Lit(3.5)
    assert parse_funcquery("-2e-1") == Lit(-0.2)
    assert parse_funcquery("n-chars") == FieldRef("n-chars")
    ast = parse_funcquery("recip(size, 1, 1000, 1000)")
    assert ast == Call(
        "recip", (FieldRef("size"), Lit(1.0), Lit(1000.0), Lit(1000.0))
    )
    nested = parse_funcquery("if(exists(pop), product(pop, 2), 1)")
    assert nested.fn == "if"
    assert referenced_fields(nested) == {"pop"}


@pytest.mark.parametrize(
    "bad",
    [
        "", "  ", "frobnicate(x)", "sum(1)", "recip(x,1,1)", "sum(1,2",
        "sum(1,2))", "exists(3)", "field(sum(1,2))", "1 2", "a b",
        "sum(1,,2)", "@!",
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(FuncQuerySyntaxError):
        parse_funcquery(bad)


def _eval(expr: str, fields: dict[str, float | None]) -> float:
    """Evaluate an expression via the real Catalyst compilation on a
    one-row frame (so unit semantics == engine semantics)."""
    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.getActiveSession()
    ast = parse_funcquery(expr)
    names = sorted(referenced_fields(ast))
    row = spark.range(1).select(
        *[F.lit(fields.get(n)).cast("double").alias(f"_c{i}")
          for i, n in enumerate(names)]
    )
    col = compile_funcquery(
        ast, lambda n: F.col(f"_c{names.index(n)}")
    )
    return row.select(col.alias("v")).collect()[0]["v"]


def test_compile_semantics(spark):
    assert _eval("sum(1, 2, 3)", {}) == 6.0
    assert _eval("sub(5, 2)", {}) == 3.0
    assert _eval("product(2, 3, 4)", {}) == 24.0
    assert _eval("div(7, 2)", {}) == 3.5
    assert _eval("min(4, 2, 9)", {}) == 2.0
    assert _eval("max(4, 2, 9)", {}) == 9.0
    assert _eval("abs(-3)", {}) == 3.0
    assert _eval("log(100)", {}) == pytest.approx(2.0)
    assert _eval("ln(1)", {}) == 0.0
    assert _eval("sqrt(9)", {}) == 3.0
    assert _eval("pow(2, 10)", {}) == 1024.0
    # recip(x,m,a,b) = a/(m*x+b)
    assert _eval("recip(x, 1, 1000, 1000)", {"x": 1000.0}) == 0.5
    # missing field reads 0.0; exists distinguishes
    assert _eval("x", {"x": None}) == 0.0
    assert _eval("if(exists(x), 7, 9)", {"x": None}) == 9.0
    assert _eval("if(exists(x), 7, 9)", {"x": 0.0}) == 7.0
    # numeric condition: != 0
    assert _eval("if(x, 1, 2)", {"x": 3.0}) == 1.0
    assert _eval("if(x, 1, 2)", {"x": 0.0}) == 2.0
    # division by zero -> 0.0 (pinned divergence from Lucene's IEEE
    # Infinity; ANSI Spark rejects bare /0)
    assert _eval("div(1, 0)", {}) == 0.0
    assert _eval("recip(x, 0, 5, 0)", {"x": 3.0}) == 0.0


# -- engine -------------------------------------------------------------------


def _ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def test_single_field_matches_boosted_search(engine):
    got = engine.function_query_search("spark", "size", k=10)
    want = engine.boosted_search("spark", "size", k=10)
    assert got == want


def test_multiplicative_matches_boosted_search(engine):
    got = engine.function_query_search(
        "spark", "size", k=10, multiplicative=True
    )
    want = engine.boosted_search(
        "spark", "size", k=10, multiplicative=True
    )
    assert got == want


def test_expression_boost_closed_form(engine):
    base = dict(engine.function_query_search("spark", "0", k=10))
    sizes = {
        _ids(engine)["p0"]: 5.0, _ids(engine)["p1"]: 15.0,
        _ids(engine)["p2"]: 25.0, _ids(engine)["p3"]: 0.0,
    }
    pops = {_ids(engine)["p0"]: 2.0, _ids(engine)["p2"]: 4.0}
    got = dict(engine.function_query_search(
        "spark", "sum(recip(size,1,10,10), product(pop,0.5))", k=10
    ))
    for d, s in base.items():
        boost = 10.0 / (sizes[d] + 10.0) + 0.5 * pops.get(d, 0.0)
        assert got[d] == pytest.approx(s + boost), d


def test_exists_default_branch(engine):
    # docs lacking pop take the literal branch
    base = dict(engine.function_query_search("spark", "0", k=10))
    got = dict(engine.function_query_search(
        "spark", "if(exists(pop), pop, 100)", k=10
    ))
    ids = _ids(engine)
    assert got[ids["p1"]] == pytest.approx(base[ids["p1"]] + 100.0)
    assert got[ids["p0"]] == pytest.approx(base[ids["p0"]] + 2.0)


def test_pure_literal_expression(engine):
    base = engine.function_query_search("spark", "0", k=10)
    got = engine.function_query_search("spark", "sum(2, 3)", k=10)
    assert [(d, pytest.approx(s + 5.0)) for d, s in base] == got


def test_validation(engine):
    with pytest.raises(ValidationError, match="bad boost_expr"):
        engine.function_query_search("spark", "frob(size)", k=10)
    with pytest.raises(ValidationError):
        engine.function_query_search("spark", "size", k=0)
    with pytest.raises(ValidationError):
        engine.function_query_search("", "size", k=10)


def test_cli_expression_boost(engine, capsys):
    import json

    from ckanext_extractor_spark.cli import main as climod

    rc = climod.main([
        "query", "--index", engine.root, "--q", "spark",
        "--bf", "recip(size,1,10,10)", "-k", "3",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    want = engine.function_query_search("spark", "recip(size,1,10,10)", k=3)
    assert [(x["doc_id"], x["score"]) for x in lines] == [
        (d, round(s, 6)) for d, s in want
    ]
