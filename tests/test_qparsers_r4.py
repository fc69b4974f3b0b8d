"""Round-4 Solr query-parser parity: bq / {!boost} / {!collapse}+expand /
QueryElevation / {!join} / TermVectorComponent.

Reference analog: the reference's CKAN package_search UI composes these
Solr parsers over the index its plugin maintains (plugin.py:40,140);
here each is a native distributed plan over the same engine state."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

# a term no doc contains: a zero-contribution boost query
NOMATCH = "qqqzzz"

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta spark",
     {"Group": ["g1"], "Size": ["5"], "Ref": ["x"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Group": ["g1"], "Size": ["15"], "Ref": ["y"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream stream",
     {"Group": ["g2"], "Size": ["25"], "Ref": ["x"]}),
    ("r/a", "p3", "c3", "markdown", "spark join stream",
     {"Group": ["g2"], "Size": ["35"]}),
    ("r/a", "p4", "c4", "markdown", "spark solo",
     {"Kind": ["wiki"], "Ref": ["z"]}),
    ("r/a", "p5", "c5", "markdown", "nothing else",
     {"Group": ["g3"], "Ref": ["x"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qparsers"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        analyzer=SIMPLE_CONFIG,
        indexed_fields=("group", "size", "ref", "kind"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="qp")
    return eng


@pytest.fixture(scope="module")
def ids(engine):
    return {r["path"]: int(r["doc_id"])
            for r in engine.spark.read.parquet(engine._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _scored(engine, q, conjunctive=True):
    """Per-doc scores of q under the distributed scored-head convention
    (pre-merge docFreq idf) — via the public API with a never-matching,
    zero-weight boost query."""
    return dict(engine.boost_query_search(
        q, NOMATCH, k=100, weight=0.0, conjunctive=conjunctive))


# -- bq (boost query) ---------------------------------------------------------


def test_bq_nomatch_is_identity(engine):
    plain = _scored(engine, "spark")
    got = engine.boost_query_search("spark", NOMATCH, k=100, weight=5.0)
    assert dict(got) == plain


def test_bq_additive_identity(engine):
    main = _scored(engine, "spark")
    bqs = _scored(engine, "stream", conjunctive=False)
    got = engine.boost_query_search("spark", "stream", k=100, weight=2.0)
    assert set(dict(got)) == set(main)
    for d, s in got:
        assert s == pytest.approx(main[d] + 2.0 * bqs.get(d, 0.0))
    # ranked by boosted score desc, doc_id asc
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))


def test_bq_never_admits_new_docs(engine, ids):
    # bq 'nothing' matches only p5, which 'spark' does not match
    got = engine.boost_query_search("spark", "nothing", k=100)
    assert ids["p5"] not in dict(got)
    assert set(dict(got)) == set(_scored(engine, "spark"))


def test_bq_reranks(engine, ids):
    # heavy boost on 'stream' must rank p2 (tf=2) first among matches
    got = engine.boost_query_search("spark", "stream", k=100, weight=100.0)
    assert got[0][0] == ids["p2"]


def test_bq_validation(engine):
    with pytest.raises(ValidationError):
        engine.boost_query_search("", "x")
    with pytest.raises(ValidationError):
        engine.boost_query_search("x", "")
    with pytest.raises(ValidationError):
        engine.boost_query_search("x", "y", weight=True)
    with pytest.raises(ValidationError):
        engine.boost_query_search("x", "y", k=0)


# -- multiplicative boost ({!boost b=f}) --------------------------------------


def test_boost_multiplicative_identity(engine, ids):
    main = _scored(engine, "spark")
    sizes = {ids["p0"]: 5.0, ids["p1"]: 15.0, ids["p2"]: 25.0,
             ids["p3"]: 35.0}
    got = engine.boosted_search("spark", "size", k=100, weight=0.5,
                                multiplicative=True)
    assert set(dict(got)) == set(main)
    for d, s in got:
        assert s == pytest.approx(main[d] * 0.5 * sizes.get(d, 0.0))


def test_boost_multiplicative_missing_field_scores_zero(engine, ids):
    got = dict(engine.boosted_search("spark", "size", k=100,
                                     multiplicative=True))
    assert got[ids["p4"]] == 0.0  # p4 has no size field


def test_boost_multiplicative_validation(engine):
    with pytest.raises(ValidationError):
        engine.boosted_search("spark", "size", multiplicative="yes")


# -- {!collapse field=} + expand ----------------------------------------------


def test_collapse_one_head_per_value(engine, ids):
    scores = _scored(engine, "spark")
    heads = engine.collapse_search("spark", "group", k=10)
    # p4 has no group -> dropped (nullPolicy=ignore)
    by_val = {v: (d, s) for d, s, v, _ in heads}
    assert set(by_val) == {"g1", "g2"}
    # head = group's best (score desc, doc_id asc)
    for v, members in (("g1", ["p0", "p1"]), ("g2", ["p2", "p3"])):
        best = min(((-scores[ids[p]], ids[p]) for p in members))
        assert by_val[v] == (best[1], -best[0])
    # heads ranked like a normal search
    assert [(-s, d) for d, s, _, _ in heads] == \
        sorted((-s, d) for d, s, _, _ in heads)


def test_collapse_expand_rows(engine, ids):
    scores = _scored(engine, "spark")
    heads = engine.collapse_search("spark", "group", k=10, expand=5)
    for d, s, v, exp in heads:
        members = {"g1": ["p0", "p1"], "g2": ["p2", "p3"]}[v]
        ranked = sorted(((-scores[ids[p]], ids[p]) for p in members))
        assert (ranked[0][1], -ranked[0][0]) == (d, s)
        assert exp == [(doc, -neg) for neg, doc in ranked[1:]]
    no_exp = engine.collapse_search("spark", "group", k=10)
    assert [h[:3] for h in heads] == [h[:3] for h in no_exp]


def test_collapse_k_truncates_heads(engine):
    assert len(engine.collapse_search("spark", "group", k=1)) == 1


def test_collapse_unknown_field_empty(engine):
    assert engine.collapse_search("spark", "nosuchfield") == []


def test_collapse_validation(engine):
    with pytest.raises(ValidationError):
        engine.collapse_search("spark", "")
    with pytest.raises(ValidationError):
        engine.collapse_search("spark", "group", expand=-1)
    with pytest.raises(ValidationError):
        engine.collapse_search("spark", "group", expand=True)


# -- query elevation -----------------------------------------------------------


def test_elevated_pinned_first_in_given_order(engine, ids):
    scores = _scored(engine, "spark")
    got = engine.search_elevated("spark", [ids["p3"], ids["p1"]], k=10)
    assert [d for d, _ in got[:2]] == [ids["p3"], ids["p1"]]
    assert got[0][1] == pytest.approx(scores[ids["p3"]])
    # organic tail: remaining matches by score desc, doc_id asc
    tail = [(d, s) for d, s in got[2:]]
    rest = sorted(
        ((d, s) for d, s in scores.items()
         if d not in (ids["p3"], ids["p1"])),
        key=lambda t: (-t[1], t[0]),
    )
    assert tail == [(d, pytest.approx(s)) for d, s in rest]


def test_elevated_nonmatching_doc_pinned_with_zero_score(engine, ids):
    # p5 does not match 'spark' but is pinned anyway (forceElevation)
    got = engine.search_elevated("spark", [ids["p5"]], k=10)
    assert got[0] == (ids["p5"], 0.0)
    assert ids["p5"] not in [d for d, _ in got[1:]]


def test_elevated_unknown_id_skipped(engine, ids):
    got = engine.search_elevated("spark", [10**9, ids["p1"]], k=10)
    assert got[0][0] == ids["p1"]
    assert 10**9 not in [d for d, _ in got]


def test_elevated_exclude_ids(engine, ids):
    got = engine.search_elevated("spark", [ids["p1"]], k=10,
                                 exclude_ids=[ids["p2"]])
    assert ids["p2"] not in [d for d, _ in got]


def test_elevated_k_truncation(engine, ids):
    got = engine.search_elevated("spark", [ids["p3"], ids["p1"]], k=2)
    assert got == [(ids["p3"], pytest.approx(_scored(engine, "spark")[ids["p3"]])),
                   (ids["p1"], pytest.approx(_scored(engine, "spark")[ids["p1"]]))]


def test_elevated_validation(engine):
    with pytest.raises(ValidationError):
        engine.search_elevated("spark", [])
    with pytest.raises(ValidationError):
        engine.search_elevated("spark", ["x"])
    with pytest.raises(ValidationError):
        engine.search_elevated("", [1])


# -- {!join from= to=} ---------------------------------------------------------


def test_join_search_semi_join(engine, ids):
    # 'alpha' matches p0 (ref x), p1 (ref y); docs with ref in {x, y}:
    # p0, p1, p2, p5
    got = engine.join_search("alpha", "ref", "ref", k=10)
    assert got == sorted([ids["p0"], ids["p1"], ids["p2"], ids["p5"]])


def test_join_search_cross_field(engine, ids):
    # from group of 'nothing' matchers (p5 -> g3) to group: only p5
    assert engine.join_search("nothing", "group", "group") == [ids["p5"]]
    # from ref of 'solo' matcher (p4 -> z) to group: no group value 'z'
    assert engine.join_search("solo", "ref", "group") == []


def test_join_search_k_and_unknown_fields(engine):
    assert len(engine.join_search("alpha", "ref", "ref", k=2)) == 2
    assert engine.join_search("alpha", "nosuch", "ref") == []
    assert engine.join_search("alpha", "ref", "nosuch") == []


def test_join_search_validation(engine):
    with pytest.raises(ValidationError):
        engine.join_search("", "a", "b")
    with pytest.raises(ValidationError):
        engine.join_search("x", "", "b")
    with pytest.raises(ValidationError):
        engine.join_search("x", "a", " ")


# -- term vectors ---------------------------------------------------------------


def test_term_vectors_terms_tf_positions(spark, tmp_path):
    eng = ExtractorEngine(spark, str(tmp_path / "tv"), n_buckets=4,
                          analyzer=SIMPLE_CONFIG)
    corpus = spark.createDataFrame(
        [("r", "p0", "c", "markdown", "alpha beta alpha spark", None),
         ("r", "p1", "c", "markdown", "beta beta", None)],
        SCHEMA,
    )
    eng.extract(corpus, build_id="tv")
    pid = {r["path"]: int(r["doc_id"])
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    assert eng.term_vectors(pid["p0"]) == [
        ("alpha", 2, [0, 2]), ("beta", 1, [1]), ("spark", 1, [3]),
    ]
    assert eng.term_vectors(pid["p1"]) == [("beta", 2, [0, 1])]
    assert eng.term_vectors(10**9) == []


def test_term_vectors_deleted_doc_empty(spark, tmp_path):
    eng = ExtractorEngine(spark, str(tmp_path / "tvd"), n_buckets=4,
                          analyzer=SIMPLE_CONFIG)
    corpus = spark.createDataFrame(
        [("r", "p0", "c", "markdown", "alpha beta", None),
         ("r", "p1", "c", "markdown", "beta gamma", None)],
        SCHEMA,
    )
    eng.extract(corpus, build_id="tvd")
    pid = {r["path"]: int(r["doc_id"])
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    eng.delete([pid["p0"]])
    assert eng.term_vectors(pid["p0"]) == []
    assert eng.term_vectors(pid["p1"]) == [("beta", 1, [0]), ("gamma", 1, [1])]


def test_term_vectors_validation(engine):
    with pytest.raises(ValidationError):
        engine.term_vectors("p0")
    with pytest.raises(ValidationError):
        engine.term_vectors(True)


# -- CLI ------------------------------------------------------------------------


def test_cli_new_query_flags(engine, ids, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    # --bq
    want = engine.boost_query_search("spark", "stream", k=3, weight=2.0)
    assert main(["query", "--index", engine.root, "--q", "spark",
                 "--bq", "stream", "--bq-weight", "2.0", "-k", "3",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [(r["doc_id"], round(r["score"], 5)) for r in lines] == \
        [(d, round(s, 5)) for d, s in want]
    # --collapse/--expand
    want_c = engine.collapse_search("spark", "group", k=5, expand=1)
    assert main(["query", "--index", engine.root, "--q", "spark",
                 "--collapse", "group", "--expand", "1", "-k", "5",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [(r["doc_id"], r["value"],
             [e["doc_id"] for e in r["expanded"]]) for r in lines] == \
        [(d, v, [e for e, _ in exp]) for d, _, v, exp in want_c]
    # --elevate + --elevate-exclude
    want_e = engine.search_elevated("spark", [ids["p3"]], k=4,
                                    exclude_ids=[ids["p0"]])
    assert main(["query", "--index", engine.root, "--q", "spark",
                 "--elevate", str(ids["p3"]),
                 "--elevate-exclude", str(ids["p0"]), "-k", "4",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [d for d, _ in want_e]
    # --boost (multiplicative function boost)
    want_b = engine.boosted_search("spark", "size", k=3, weight=2.0,
                                   multiplicative=True)
    assert main(["query", "--index", engine.root, "--q", "spark",
                 "--boost", "size^2.0", "-k", "3", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [d for d, _ in want_b]


def test_cli_join_and_termvectors(engine, ids, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["join", "--index", engine.root, "--q", "alpha",
                 "--from", "ref", "--to", "ref", "-k", "10",
                 "--buckets", "8"]) == 0
    got = [int(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert got == engine.join_search("alpha", "ref", "ref", k=10)

    assert main(["termvectors", "--index", engine.root,
                 str(ids["p0"]), "--buckets", "8"]) == 0
    rows = json.loads(capsys.readouterr().out.strip())
    assert [(r["term"], r["tf"], r["positions"]) for r in rows] == \
        engine.term_vectors(ids["p0"])
