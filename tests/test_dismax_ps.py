"""edismax ps/ps2/ps3 — sloppy phrase-field boosting (VERDICT r4 #2).

Solr edismax: ``ps`` sets the slop on the ``pf`` whole-query phrase
clause; ``ps2``/``ps3`` set it on the pf2 bigram / pf3 trigram clauses
and DEFAULT to ``ps`` when unset. The sloppy phrase tf is the pinned
anchor-window count (see fields.sloppy_phrase_tf_expr): the number of
anchor offsets i such that every phrase slot k has an occurrence at an
OFFSET-ADJUSTED position (pos - k) inside [i, i+slop] — the Lucene
SloppyPhraseScorer smallest-range criterion turned into a countable,
SQL-expressible frequency. An isolated match whose adjusted span is s'
contributes slop - s' + 1 anchors, so tighter matches weigh more, the
same shape as Lucene's 1/(1+matchLength) slop factor. slop=0 is
EXACTLY the adjacent-phrase start count (ps=0 ≡ pf, pinned below)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.fields import (
    phrase_tf_expr,
    sloppy_phrase_tf_expr,
)

DOCS = [
    # 'spark join' adjacent in p0; one token between in p1 (needs ps>=1);
    # reversed in p2 (adjusted span 3: needs ps>=3); absent pair in p3
    ("r/a", "p0", "c0", "markdown", "alpha",
     {"Title": ["spark join basics"], "Tags": ["spark"]}),
    ("r/a", "p1", "c1", "markdown", "alpha",
     {"Title": ["spark outer join"], "Tags": ["join"]}),
    ("r/a", "p2", "c2", "markdown", "alpha",
     {"Title": ["join the spark"], "Tags": ["spark", "join"]}),
    ("r/a", "p3", "c3", "markdown", "alpha",
     {"Title": ["spark alone here"], "Tags": ["join"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

QF = {"title": 1.0, "tags": 1.0}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ps"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ps")
    return eng


def _ids(eng):
    return {r["path"]: r["doc_id"]
            for r in eng.spark.read.parquet(eng._p("doc_stats"))
            .select("path", "doc_id").collect()}


# -- kernel: sloppy_phrase_tf_expr -------------------------------------------


def test_slop0_identity_vs_exact(spark):
    """Pinned: the anchor-count path at slop=0 ≡ the exact start count
    (phrase_tf_expr), on strings exercising overlap, repeats, misses,
    and empties."""
    vals = [
        ("a b c a b",), ("a a a",), ("x y",), ("a",), ("",),
        ("a b a b a b",), ("b a",), ("a x b",), ("a b b a b",),
    ]
    df = spark.createDataFrame(vals, "v string")
    for terms in (["a", "b"], ["a", "a"], ["a", "b", "a"]):
        rows = df.select(
            phrase_tf_expr(F.col("v"), terms).alias("exact"),
            sloppy_phrase_tf_expr(F.col("v"), terms, 0).alias("slop0"),
        ).collect()
        for r in rows:
            assert r["exact"] == r["slop0"], (terms, r)


def test_slop_bridges_gap(spark):
    df = spark.createDataFrame([("spark outer join",)], "v string")
    got = df.select(
        sloppy_phrase_tf_expr(F.col("v"), ["spark", "join"], 0).alias("s0"),
        sloppy_phrase_tf_expr(F.col("v"), ["spark", "join"], 1).alias("s1"),
        sloppy_phrase_tf_expr(F.col("v"), ["spark", "join"], 2).alias("s2"),
    ).collect()[0]
    # adjusted span of (spark@1, join@3) is (3-1)-1 = 1
    assert got["s0"] == 0
    assert got["s1"] == 1  # anchors: slop - span + 1 = 1
    assert got["s2"] == 2


def test_slop_reversal_total_move(spark):
    """Lucene total-move semantics: 'b a'~2 matches text 'a b'
    (slot-adjusted span = 2), which per-gap NEAR/n never does."""
    df = spark.createDataFrame([("a b",)], "v string")
    got = df.select(
        sloppy_phrase_tf_expr(F.col("v"), ["b", "a"], 1).alias("s1"),
        sloppy_phrase_tf_expr(F.col("v"), ["b", "a"], 2).alias("s2"),
    ).collect()[0]
    assert got["s1"] == 0
    assert got["s2"] == 1


def test_tighter_match_counts_more_anchors(spark):
    """Isolated-match anchor count = slop - span + 1: the adjacent
    occurrence out-weighs the gapped one at the same slop."""
    df = spark.createDataFrame(
        [("spark join",), ("spark x join",)], "v string"
    )
    rows = df.select(
        sloppy_phrase_tf_expr(
            F.col("v"), ["spark", "join"], 3).alias("s3"),
    ).collect()
    assert rows[0]["s3"] == 4  # span 0: anchors 3-0+1
    assert rows[1]["s3"] == 3  # span 1: anchors 3-1+1


# -- engine surface -----------------------------------------------------------


def test_ps0_equals_pf(engine):
    a = engine.dismax_search("spark join", QF, k=10, pf={"title": 2.0})
    b = engine.dismax_search("spark join", QF, k=10, pf={"title": 2.0},
                             ps=0)
    assert a == b


def test_ps_changes_rank(engine):
    """p1 ('spark outer join') earns the pf boost only at ps>=1 —
    slop demonstrably changes the ranking vs exact pf."""
    ids = _ids(engine)
    exact = dict(engine.dismax_search("spark join", QF, k=10,
                                      pf={"title": 2.0}))
    sloppy = dict(engine.dismax_search("spark join", QF, k=10,
                                       pf={"title": 2.0}, ps=1))
    assert sloppy[ids["p1"]] > exact[ids["p1"]]
    assert sloppy[ids["p0"]] > exact[ids["p0"]]  # span0 gains an anchor
    assert sloppy[ids["p3"]] == pytest.approx(exact[ids["p3"]], rel=1e-12)
    # reversal needs ps>=3
    assert dict(engine.dismax_search(
        "spark join", QF, k=10, pf={"title": 2.0}, ps=2
    ))[ids["p2"]] == pytest.approx(exact[ids["p2"]], rel=1e-12)
    assert dict(engine.dismax_search(
        "spark join", QF, k=10, pf={"title": 2.0}, ps=3
    ))[ids["p2"]] > exact[ids["p2"]]


def test_ps2_ps3_default_to_ps(engine):
    """Solr: ps2/ps3 fall back to ps when unset."""
    via_ps = engine.dismax_search(
        "spark outer join", QF, k=10, pf2={"title": 1.5}, ps=1)
    via_ps2 = engine.dismax_search(
        "spark outer join", QF, k=10, pf2={"title": 1.5}, ps2=1)
    assert via_ps == via_ps2
    via3 = engine.dismax_search(
        "spark outer join", QF, k=10, pf3={"title": 1.5}, ps=2)
    via3b = engine.dismax_search(
        "spark outer join", QF, k=10, pf3={"title": 1.5}, ps3=2)
    assert via3 == via3b
    # explicit ps2 overrides ps
    assert engine.dismax_search(
        "spark outer join", QF, k=10, pf2={"title": 1.5}, ps=5, ps2=0
    ) == engine.dismax_search(
        "spark outer join", QF, k=10, pf2={"title": 1.5})


def test_ps_validation(engine):
    for bad in (-1, 1.5, True, "2"):
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, pf={"title": 1.0},
                                 ps=bad)
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, pf2={"title": 1.0},
                                 ps2=bad)
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, pf3={"title": 1.0},
                                 ps3=bad)


def test_cli_ps(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["query", "--index", engine.root, "--q", "spark join",
                 "--qf", "title", "--qf", "tags", "--pf", "title^2",
                 "--ps", "1", "--buckets", "8"]) == 0
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()]
    want = engine.dismax_search("spark join", QF, k=10,
                                pf={"title": 2.0}, ps=1)
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert r["score"] == pytest.approx(round(s, 6))
