"""Solr TermsComponent, facet.range, and facet.query (round 4).

Reference analog: the reference's CKAN UI drives Solr's terms/facet
components over the same index its plugin maintains (plugin.py
IPackageController / package_search facet params)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    # sizes: 5, 15, 25, 35, 105 (value of the Size field)
    ("r/a", "p0", "c0", "markdown", "alpha beta spark",
     {"Size": ["5"], "Kind": ["web"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Size": ["15"], "Kind": ["web"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream",
     {"Size": ["25"], "Kind": ["book"]}),
    ("r/a", "p3", "c3", "markdown", "spark join stream",
     {"Size": ["35"], "Kind": ["book"]}),
    ("r/a", "p4", "c4", "markdown", "spark solo",
     {"Size": ["105"], "Kind": ["wiki"]}),
    ("r/a", "p5", "c5", "markdown", "nothing here",
     {"Size": ["-3"], "Kind": ["wiki"]}),
    ("r/a", "p6", "c6", "markdown", "spark sized oddly",
     {"Size": ["not-a-number"], "Kind": ["wiki"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tcomp"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("size", "kind"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="tc")
    eng.warm()
    return eng


def _ids(eng):
    return {r["path"]: r["doc_id"]
            for r in eng.spark.read.parquet(eng._p("doc_stats"))
            .select("path", "doc_id").collect()}


# -- terms component ----------------------------------------------------------


def test_terms_ranked_by_df_then_term(engine):
    got = engine.terms(prefix="s", limit=10)
    # spark df=6, stream df=2, then df-1 terms asc: sized, solo
    assert got[0] == ("spark", 6)
    assert got[1] == ("stream", 2)
    assert got[2:] == [("sized", 1), ("solo", 1)]


def test_terms_no_prefix_and_limit_and_min_df(engine):
    top = engine.terms(limit=2)
    assert top[0] == ("spark", 6)
    assert len(top) == 2
    assert engine.terms(prefix="s", min_df=2) == \
        [("spark", 6), ("stream", 2)]


def test_terms_warm_cold_parity(engine, spark):
    cold = ExtractorEngine(spark, engine.root, n_buckets=8,
                           salt_threshold=50,
                           indexed_fields=("size", "kind"))
    assert cold.terms(prefix="s", limit=10) == \
        engine.terms(prefix="s", limit=10)
    assert cold.terms(limit=5) == engine.terms(limit=5)


def test_terms_counts_tombstones_until_compaction(engine, spark, tmp_path):
    """Pre-merge docFreq parity: df keeps counting deleted docs."""
    root = str(tmp_path / "tdel")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="t1")
    before = dict(eng.terms(prefix="s", limit=10))
    eng.delete([_ids(eng)["p4"]])
    after = dict(eng.terms(prefix="s", limit=10))
    assert after["spark"] == before["spark"]  # uncorrected, pinned


def test_terms_validation(engine):
    for bad in (0, -1, True, "5", engine.TERMS_MAX_LIMIT + 1):
        with pytest.raises(ValidationError):
            engine.terms(limit=bad)
    with pytest.raises(ValidationError):
        engine.terms(min_df=0)
    with pytest.raises(ValidationError):
        engine.terms(prefix="two words")
    with pytest.raises(ValidationError):
        engine.terms(regex="[unclosed")
    with pytest.raises(ValidationError):
        engine.terms(regex="")
    with pytest.raises(ValidationError):
        engine.terms(sort="df")


def test_terms_regex_fullmatch(engine, spark):
    # terms.regex is a FULL match: s.*k hits only 'spark' (not
    # 'stream'/'sized'); s.* hits every s-term
    assert engine.terms(regex="s.*k", limit=10) == [("spark", 6)]
    assert [t for t, _ in engine.terms(regex="s.*", limit=10)] == [
        "spark", "stream", "sized", "solo",
    ]
    # warm/cold parity incl. regex + pushed-prefix pairing
    cold = ExtractorEngine(spark, engine.root, n_buckets=8,
                           salt_threshold=50,
                           indexed_fields=("size", "kind"))
    assert cold.terms(prefix="s", regex="s.*k", limit=10) == \
        engine.terms(prefix="s", regex="s.*k", limit=10)


def test_terms_sort_index(engine, spark):
    got = engine.terms(prefix="s", limit=10, sort="index")
    assert [t for t, _ in got] == ["sized", "solo", "spark", "stream"]
    cold = ExtractorEngine(spark, engine.root, n_buckets=8,
                           salt_threshold=50,
                           indexed_fields=("size", "kind"))
    assert cold.terms(prefix="s", limit=10, sort="index") == got


# -- range facets -------------------------------------------------------------


def test_range_facets_buckets_before_after(engine):
    out = engine.range_facets("spark", "size", 0, 40, 10)
    assert out["buckets"] == [(0, 1), (10, 1), (20, 1), (30, 1)]
    assert out["before"] == 0  # -3 doc doesn't match 'spark'
    assert out["after"] == 1   # 105
    # non-numeric value docs are ignored (p6 matches but can't bucket)


def test_range_facets_zero_buckets_and_before(engine):
    out = engine.range_facets("spark", "size", 10, 30, 10)
    assert out["buckets"] == [(10, 1), (20, 1)]
    assert out["before"] == 1  # size 5
    assert out["after"] == 2   # 35 and 105


def test_range_facets_respects_query(engine):
    out = engine.range_facets("join", "size", 0, 120, 10)
    # only p1 (15) and p3 (35) match 'join'
    counts = {lo: c for lo, c in out["buckets"] if c}
    assert counts == {10: 1, 30: 1}


def test_range_facets_validation(engine):
    with pytest.raises(ValidationError):
        engine.range_facets("spark", "size", 0, 40, 0)
    with pytest.raises(ValidationError):
        engine.range_facets("spark", "size", 40, 0, 10)
    with pytest.raises(ValidationError):
        engine.range_facets("spark", "", 0, 40, 10)
    with pytest.raises(ValidationError):
        engine.range_facets("spark", "size", 0, 40, True)
    with pytest.raises(ValidationError):
        # bucket-count guard
        engine.range_facets("spark", "size", 0, 1e9, 1)


# -- query facets -------------------------------------------------------------


def test_query_facets_counts_intersections(engine):
    out = engine.query_facets(
        "spark", {"j": "join", "js": "join stream", "none": "zzz"}
    )
    assert out == {"j": 2, "js": 1, "none": 0}


def test_query_facets_subqueries_are_conjunctive(engine):
    # 'alpha spark' sub-query requires BOTH terms
    out = engine.query_facets("spark", {"as": "alpha spark"})
    assert out == {"as": 2}


def test_query_facets_main_query_restricts(engine):
    # 'alpha' matches p0/p1; of those only p1 has 'join'
    out = engine.query_facets("alpha", {"j": "join"})
    assert out == {"j": 1}


def test_query_facets_validation(engine):
    for bad in ({}, {"": "x"}, {"a": ""}, {"a": 3}, "notadict", None):
        with pytest.raises(ValidationError):
            engine.query_facets("spark", bad)


# -- CLI ----------------------------------------------------------------------


def test_cli_terms(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["terms", "--index", engine.root, "--prefix", "s",
                 "-k", "3", "--buckets", "8"]) == 0
    rows = json.loads(capsys.readouterr().out.strip())
    assert rows[0] == {"term": "spark", "df": 6}
    assert len(rows) == 3


def test_cli_facets_range_and_fquery(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["facets", "--index", engine.root, "--q", "spark",
                 "--range", "size", "0", "40", "10",
                 "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["after"] == 1
    assert [b["count"] for b in out["buckets"]] == [1, 1, 1, 1]

    assert main(["facets", "--index", engine.root, "--q", "spark",
                 "--fquery", "j=join", "--fquery", "vs=vector stream",
                 "--buckets", "8"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == \
        {"j": 2, "vs": 0}

    # flat facets without --fields is a usage error, not a traceback
    assert main(["facets", "--index", engine.root, "--q", "spark",
                 "--buckets", "8"]) == 2


# -- interval facets (Solr facet.interval) -------------------------------------


def test_interval_facets_counts_and_overlap(engine):
    # matching docs ('spark'): sizes 5, 15, 25, 35, 105 (+ non-numeric)
    got = engine.interval_facets(
        "spark", "size",
        ["[0,20]", "(20,*]", "[*,*]", "[10,30)", "(35,105)"],
    )
    assert got == [
        ("[0,20]", 2),      # 5, 15
        ("(20,*]", 3),      # 25, 35, 105
        ("[*,*]", 5),       # every numeric value (overlaps allowed)
        ("[10,30)", 2),     # 15, 25
        ("(35,105)", 0),    # open bounds exclude both ends
    ]


def test_interval_facets_bounds_inclusive_exclusive(engine):
    got = dict(engine.interval_facets(
        "spark", "size", ["[5,5]", "(5,15)", "[5,15)", "(5,15]"]))
    assert got == {"[5,5]": 1, "(5,15)": 0, "[5,15)": 1, "(5,15]": 1}


def test_interval_facets_query_restriction(engine):
    # 'stream' matches only sizes 25 and 35
    got = engine.interval_facets("stream", "size", ["[*,*]", "[0,30]"])
    assert got == [("[*,*]", 2), ("[0,30]", 1)]


def test_interval_facets_negative_and_unknown(engine):
    # 'nothing here' doc has size -3 but doesn't match 'spark'
    got = engine.interval_facets("nothing", "size", ["[*,0)"])
    assert got == [("[*,0)", 1)]
    assert engine.interval_facets("spark", "nosuch", ["[*,*]"]) == \
        [("[*,*]", 0)]


def test_interval_facets_validation(engine):
    with pytest.raises(ValidationError):
        engine.interval_facets("spark", "size", [])
    with pytest.raises(ValidationError):
        engine.interval_facets("spark", "size", ["0,100"])
    with pytest.raises(ValidationError):
        engine.interval_facets("spark", "size", ["[a,b]"])
    with pytest.raises(ValidationError):
        engine.interval_facets("spark", "", ["[0,1]"])


def test_cli_interval_facets(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["facets", "--index", engine.root, "--q", "spark",
                 "--interval", "size", "[0,20]", "(20,*]",
                 "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == [{"interval": "[0,20]", "count": 2},
                   {"interval": "(20,*]", "count": 3}]


# -- stats facets (Solr stats.facet) -------------------------------------------


def test_field_stats_by_buckets(engine):
    # 'spark' matches p0,p1 (web: 5,15), p2,p3 (book: 25,35),
    # p4,p6 (wiki: 105, not-a-number)
    got = engine.field_stats_by("spark", "size", "kind")
    assert [v for v, _ in got] == ["book", "web", "wiki"]  # ties value asc
    by = dict(got)
    assert by["web"] == {"count": 2, "missing": 0, "min": "15",
                         "max": "5", "sum": 20.0, "mean": 10.0}
    assert by["book"] == {"count": 2, "missing": 0, "min": "25",
                          "max": "35", "sum": 60.0, "mean": 30.0}
    # one non-numeric value degrades the bucket to string-only stats
    assert by["wiki"]["count"] == 2
    assert by["wiki"]["sum"] is None and by["wiki"]["mean"] is None
    assert by["wiki"]["min"] == "105" and by["wiki"]["max"] == "not-a-number"


def test_field_stats_by_missing_and_k(engine):
    got = engine.field_stats_by("spark", "nosuch", "kind", k=2)
    assert len(got) == 2
    for v, st in got:
        assert st["count"] == 0 and st["missing"] == 2
        assert st["sum"] is None
    assert engine.field_stats_by("spark", "size", "nosuch") == []


def test_field_stats_by_validation(engine):
    with pytest.raises(ValidationError):
        engine.field_stats_by("spark", "", "kind")
    with pytest.raises(ValidationError):
        engine.field_stats_by("spark", "size", " ")
    with pytest.raises(ValidationError):
        engine.field_stats_by("", "size", "kind")


def test_cli_stats_facet(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    assert main(["stats", "--index", engine.root, "--q", "spark",
                 "--field", "size", "--facet", "kind", "-k", "2",
                 "--buckets", "8"]) == 0
    rows = json.loads(capsys.readouterr().out.strip())
    assert [r["value"] for r in rows] == ["book", "web"]
    assert rows[0]["sum"] == 60.0


# -- match frame (Solr /export analog) ------------------------------------------


def test_match_frame_scored_and_metadata(engine):
    df = engine.match_frame("spark")
    rows = {int(r["doc_id"]): float(r["score"]) for r in df.collect()}
    want = dict(engine.boost_query_search("spark", "qqqzzz", k=100,
                                          weight=0.0))
    assert rows.keys() == want.keys()
    for d, s in rows.items():
        assert s == pytest.approx(want[d])
    dfm = engine.match_frame("spark", with_metadata=True)
    assert "metadata" in dfm.columns
    m = {int(r["doc_id"]): r["metadata"] for r in dfm.collect()}
    assert all(v and "kind" in v for v in m.values())


def test_match_frame_unscored_and_none(engine):
    df = engine.match_frame("spark", scored=False)
    assert {float(r["score"]) for r in df.collect()} == {1.0}
    with pytest.raises(ValidationError):
        engine.match_frame("")
