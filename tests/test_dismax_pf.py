"""edismax pf — phrase-field boosting (round 4).

Docs whose pf-field value contains the whole analyzed query as an
adjacent phrase add a phrase-BM25 term (tf = count of phrase starts,
idf = sum of the terms' per-field idfs — Lucene PhraseWeight — same
per-field norms), DisjunctionMax over pf fields with the qf tie,
ADDED to the main dismax score (SHOULD clause). Reference analog:
Solr edismax's pf parameter over the same dynamic metadata fields the
reference creates (plugin.py:40,140)."""

from __future__ import annotations

import math

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.fields import phrase_tf_expr

DOCS = [
    # phrase 'spark join' adjacent in title for p0/p1 only
    ("r/a", "p0", "c0", "markdown", "alpha",
     {"Title": ["spark join basics"], "Tags": ["spark"]}),
    ("r/a", "p1", "c1", "markdown", "alpha",
     {"Title": ["about spark join"], "Tags": ["join"]}),
    ("r/a", "p2", "c2", "markdown", "alpha",
     {"Title": ["spark streams join nothing"], "Tags": ["spark", "join"]}),
    ("r/a", "p3", "c3", "markdown", "alpha",
     {"Title": ["join the spark"], "Tags": ["misc"]}),
    ("r/a", "p4", "c4", "markdown", "alpha",
     {"Title": ["unrelated doc"], "Tags": ["spark"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

QF = {"title": 1.0, "tags": 1.0}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pf"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="pf")
    return eng


def _ids(eng):
    return {r["path"]: r["doc_id"]
            for r in eng.spark.read.parquet(eng._p("doc_stats"))
            .select("path", "doc_id").collect()}


def test_phrase_tf_expr_counts_all_starts(spark):
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [("a b c a b",), ("a a a",), ("x y",), ("a",), ("",)],
        "v string",
    ).select(
        phrase_tf_expr(F.col("v"), ["a", "b"]).alias("ab"),
        phrase_tf_expr(F.col("v"), ["a", "a"]).alias("aa"),
    ).collect()
    assert [r["ab"] for r in rows] == [2, 0, 0, 0, 0]
    # overlapping starts counted (Lucene ExactPhraseMatcher)
    assert [r["aa"] for r in rows] == [0, 2, 0, 0, 0]


def test_pf_adds_only_to_phrase_matching_docs(engine):
    ids = _ids(engine)
    base = dict(engine.dismax_search("spark join", QF, k=10))
    boosted = dict(engine.dismax_search("spark join", QF, k=10,
                                        pf={"title": 2.0}))
    assert set(base) == set(boosted)  # pf is SHOULD: no new/lost docs
    for p in ("p2", "p3", "p4"):  # terms present but never adjacent
        assert boosted[ids[p]] == pytest.approx(base[ids[p]], rel=1e-12)
    for p in ("p0", "p1"):
        assert boosted[ids[p]] > base[ids[p]]


def test_pf_increment_is_phrase_bm25(engine, spark):
    """The added amount equals boost * sum-idf * tf-part with the
    field's own norms — recomputed independently here."""
    ids = _ids(engine)
    base = dict(engine.dismax_search("spark join", QF, k=10))
    boosted = dict(engine.dismax_search("spark join", QF, k=10,
                                        pf={"title": 2.0}))
    fp = spark.read.parquet(engine._p("field_postings"))
    rows = fp.where(fp.field == "title").collect()
    n_docs = len({r["doc_id"] for r in rows})
    dl = {}
    df = {}
    for r in rows:
        dl[r["doc_id"]] = dl.get(r["doc_id"], 0) + r["tf"]
        if r["term"] in ("spark", "join"):
            df[r["term"]] = df.get(r["term"], 0) + 1
    avgdl = sum(dl.values()) / n_docs
    pidf = sum(
        math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        for t in ("spark", "join")
    )
    for p in ("p0", "p1"):
        d = ids[p]
        tfp = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * dl[d] / avgdl))
        assert boosted[d] - base[d] == pytest.approx(
            2.0 * pidf * tfp, rel=1e-9
        )


def test_single_term_query_skips_pf(engine):
    assert engine.dismax_search("spark", QF, k=10, pf={"title": 2.0}) \
        == engine.dismax_search("spark", QF, k=10)


def test_pf_only_field_never_admits_new_docs(engine, spark, tmp_path):
    """A doc phrase-matching in a pf-only field but matching NO qf field
    stays excluded (the main query is the mandatory clause)."""
    root = str(tmp_path / "pfonly")
    docs = DOCS + [
        ("r/a", "p9", "c9", "markdown", "alpha",
         {"Title": ["nothing relevant"], "Extra": ["spark join here"]}),
    ]
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags", "extra"))
    eng.extract(spark.createDataFrame(docs, SCHEMA), build_id="pf2")
    ids = {r["path"]: r["doc_id"]
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    hits = dict(eng.dismax_search("spark join", QF, k=10,
                                  pf={"extra": 3.0}))
    assert ids["p9"] not in hits
    # but a doc matching qf AND phrase-matching the pf-only field boosts
    hits2 = dict(eng.dismax_search("spark join",
                                   {"title": 1.0, "tags": 1.0,
                                    "extra": 0.0001}, k=10,
                                   pf={"extra": 3.0}))
    assert ids["p9"] in hits2


def test_pf_validation(engine):
    for bad in ({}, {"": 1.0}, {"title": 0}, {"title": -1},
                {"title": True}, "title", 7):
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, k=10, pf=bad)


def test_cli_pf(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    ids = _ids(engine)
    assert main(["query", "--index", engine.root, "--q", "spark join",
                 "--qf", "title", "--qf", "tags", "--pf", "title^2",
                 "--buckets", "8"]) == 0
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()]
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[ids["p0"]] > got[ids["p4"]]


# ------------------------------------------------------------- pf2 / pf3


def test_pf2_equals_pf_for_two_token_query(engine):
    """A 2-token query has exactly one bigram — the whole query — so
    pf2 must produce the identical scores pf does."""
    a = engine.dismax_search("spark join", QF, k=10, pf={"title": 2.0})
    b = engine.dismax_search("spark join", QF, k=10, pf2={"title": 2.0})
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in a] == b


def test_pf3_equals_pf_for_three_token_query(engine):
    a = engine.dismax_search("spark join basics", QF, k=10,
                             pf={"title": 2.0})
    b = engine.dismax_search("spark join basics", QF, k=10,
                             pf3={"title": 2.0})
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in a] == b


def test_pf3_skipped_for_two_token_query(engine):
    assert engine.dismax_search("spark join", QF, k=10,
                                pf3={"title": 2.0}) \
        == engine.dismax_search("spark join", QF, k=10)


def test_pf2_partial_phrase_credit(engine):
    """'spark join basics': p0's title holds BOTH bigrams, p1's only
    'spark join' — pf2 boosts both (pf boosts neither but p0), and
    each increment matches the closed-form clause sum."""
    ids = _ids(engine)
    q = "spark join basics"
    base = dict(engine.dismax_search(q, QF, k=10))
    b2 = dict(engine.dismax_search(q, QF, k=10, pf2={"title": 2.0}))
    assert set(base) == set(b2)
    # closed form over the title field: n_docs=5, dl as built, bigram
    # idf = sum of term idfs (df over title: spark 4, join 4, basics 1)
    n = 5
    dfs = {"spark": 4, "join": 4, "basics": 1}
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
           for t, d in dfs.items()}
    dl = {"p0": 3, "p1": 3, "p2": 4, "p3": 3, "p4": 2}
    avgdl = sum(dl.values()) / n

    def tfp(ptf, d):
        return (ptf * 2.2) / (ptf + 1.2 * (1 - 0.75 + 0.75 * d / avgdl))

    inc0 = 2.0 * ((idf["spark"] + idf["join"]) * tfp(1, dl["p0"])
                  + (idf["join"] + idf["basics"]) * tfp(1, dl["p0"]))
    inc1 = 2.0 * (idf["spark"] + idf["join"]) * tfp(1, dl["p1"])
    assert b2[ids["p0"]] - base[ids["p0"]] == pytest.approx(inc0, rel=1e-9)
    assert b2[ids["p1"]] - base[ids["p1"]] == pytest.approx(inc1, rel=1e-9)
    for p in ("p2", "p3", "p4"):  # no adjacent bigram anywhere
        assert b2[ids[p]] == pytest.approx(base[ids[p]], rel=1e-12)


def test_pf_pf2_pf3_sum(engine):
    """All three flavors together add exactly the sum of their
    individual increments (independent SHOULD clauses)."""
    ids = _ids(engine)
    q = "spark join basics"
    base = dict(engine.dismax_search(q, QF, k=10))
    inc = {}
    for kw in ({"pf": {"title": 2.0}}, {"pf2": {"title": 3.0}},
               {"pf3": {"title": 4.0}}):
        got = dict(engine.dismax_search(q, QF, k=10, **kw))
        for d in base:
            inc[d] = inc.get(d, 0.0) + (got[d] - base[d])
    both = dict(engine.dismax_search(q, QF, k=10, pf={"title": 2.0},
                                     pf2={"title": 3.0},
                                     pf3={"title": 4.0}))
    for d in base:
        assert both[d] - base[d] == pytest.approx(inc[d], abs=1e-9)
    # and p0 (full phrase) outscores p1 (partial) by construction
    assert both[ids["p0"]] > both[ids["p1"]]


def test_pf2_pf3_validation(engine):
    for bad in ({}, {"title": 0}, {"title": True}, "title", 7):
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, k=10, pf2=bad)
        with pytest.raises(ValidationError):
            engine.dismax_search("spark join", QF, k=10, pf3=bad)


def test_cli_pf2(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    ids = _ids(engine)
    assert main(["query", "--index", engine.root, "--q", "spark join",
                 "--qf", "title", "--qf", "tags", "--pf2", "title^2",
                 "--buckets", "8"]) == 0
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()]
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[ids["p0"]] > got[ids["p4"]]
