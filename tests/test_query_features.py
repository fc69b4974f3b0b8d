"""Solr-parity query features added in round 3: minimum_should_match
(Solr mm), prefix queries (Lucene PrefixQuery, scoring-boolean rewrite),
facet counts over matching docs (Solr faceting; the reference's CKAN
search UI facets package_search over the same Solr index), filter
queries (Solr fq — the reference's package_search always narrows on the
dynamic metadata fields), wildcard queries (Lucene WildcardQuery), and
fuzzy queries (Lucene FuzzyQuery)."""

from __future__ import annotations

import json

import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    # (repo, path, commit, lang, content, metadata)
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
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qfeat"))
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="qf")
    eng.warm()
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


# -- minimum_should_match (Solr mm) ------------------------------------------


def test_min_match_filters_by_matched_term_count(engine):
    ids = _ids(engine)
    q = "alpha beta gamma"
    got2 = {d for d, _ in engine.search(q, k=10, conjunctive=False,
                                        min_match=2)}
    # >=2 of {alpha, beta, gamma}: p0 (3), p1 (2), p3 (2); p2/p5 match
    # only alpha
    assert got2 == {ids["p0"], ids["p1"], ids["p3"]}
    got3 = {d for d, _ in engine.search(q, k=10, conjunctive=False,
                                        min_match=3)}
    assert got3 == {d for d, _ in engine.search(q, k=10, conjunctive=True)}


def test_min_match_is_a_filter_not_a_rescore(engine):
    full = dict(engine.search("alpha beta gamma", k=10, conjunctive=False))
    got = engine.search("alpha beta gamma", k=10, conjunctive=False,
                        min_match=2)
    for d, s in got:
        assert abs(full[d] - s) < 1e-12
    # min_match=1 is plain OR
    assert engine.search("alpha beta gamma", k=10, conjunctive=False,
                         min_match=1) == \
        engine.search("alpha beta gamma", k=10, conjunctive=False)


def test_min_match_slow_path_parity(engine):
    want = engine.search("alpha beta gamma", k=10, conjunctive=False,
                         min_match=2)
    got = engine.search("alpha beta gamma", k=10, conjunctive=False,
                        min_match=2, mode="slow")
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_min_match_validation(engine):
    for bad in (0, -1, 1.5, "2", True):
        with pytest.raises(ValidationError):
            engine.search("alpha beta", conjunctive=False, min_match=bad)
    with pytest.raises(ValidationError):
        engine.search("alpha beta", conjunctive=True, min_match=2)
    for mode in ("wand", "maxscore"):
        with pytest.raises(ValidationError):
            engine.search("alpha beta", conjunctive=False, min_match=2,
                          mode=mode)


# -- prefix queries (Lucene PrefixQuery) -------------------------------------


def test_expand_prefix_warm_and_cold_agree(engine, spark):
    assert engine.expand_prefix("alp") == ["alpha", "alphabet"]
    assert engine.expand_prefix("alphab") == ["alphabet"]
    assert engine.expand_prefix("zzz") == []
    cold = ExtractorEngine(
        spark, engine.root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    assert cold.expand_prefix("alp") == ["alpha", "alphabet"]
    assert cold.expand_prefix("zzz") == []


def test_prefix_search_is_scoring_boolean_over_expansions(engine):
    got = engine.prefix_search("alp", k=10)
    # identical to the disjunctive multi-term query over the expansions
    want = engine.search("alpha alphabet", k=10, conjunctive=False,
                         mode="exact")
    assert got == want
    assert {d for d, _ in got} >= {_ids(engine)["p5"]}


def test_prefix_max_expansions_and_validation(engine):
    with pytest.raises(ValidationError):
        engine.expand_prefix("a", max_expansions=1)
    for bad in ("", "  ", "two words", None, 7):
        with pytest.raises(ValidationError):
            engine.expand_prefix(bad)
    # case-normalized like Lucene wildcard terms (lowercased, unanalyzed)
    assert engine.expand_prefix("ALP") == ["alpha", "alphabet"]


# -- facets (Solr faceting over doc_stats metadata) --------------------------


def test_facets_counts_and_order(engine):
    out = engine.facets("alpha", ["source-name", "lang"], k_facet=10)
    # alpha docs: p0, p1, p2, p5
    assert out["source-name"] == [("web", 2), ("book", 1), ("wiki", 1)]
    assert out["lang"] == [("de", 2), ("en", 2)]  # count ties: value asc
    top1 = engine.facets("alpha", ["source-name"], k_facet=1)
    assert top1["source-name"] == [("web", 2)]


def test_facets_disjunctive_and_min_match(engine):
    out = engine.facets("alpha delta", ["source-name"], conjunctive=False)
    # every doc matches alpha or delta
    assert out["source-name"] == [("book", 2), ("web", 2), ("wiki", 2)]
    out2 = engine.facets("alpha delta", ["source-name"],
                         conjunctive=False, min_match=2)
    # both terms: p2 only
    assert out2["source-name"] == [("book", 1)]


def test_facets_unknown_field_and_validation(engine):
    out = engine.facets("alpha", ["nope"])
    assert out == {"nope": []}
    for bad_fields in ([], "lang", [""], [1]):
        with pytest.raises(ValidationError):
            engine.facets("alpha", bad_fields)
    with pytest.raises(ValidationError):
        engine.facets("", ["lang"])


def test_facets_respect_tombstones(spark, tmp_path):
    eng = ExtractorEngine(
        spark, str(tmp_path / "qfdel"), n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="qf2")
    ids = _ids(eng)
    eng.delete([ids["p0"]])
    out = eng.facets("alpha", ["source-name"])
    assert out["source-name"] == [("book", 1), ("web", 1), ("wiki", 1)]


# -- filter queries (Solr fq) ------------------------------------------------


def test_fq_restricts_without_rescoring(engine):
    ids = _ids(engine)
    full = dict(engine.search("alpha", k=10))
    got = engine.search("alpha", k=10, fq={"source-name": "web"})
    assert {d for d, _ in got} == {ids["p0"], ids["p1"]}
    for d, s in got:
        assert abs(full[d] - s) < 1e-12  # filters never rescore
    both = engine.search("alpha", k=10,
                         fq={"source-name": "web", "lang": "en"})
    assert {d for d, _ in both} == {ids["p0"]}  # fields AND together
    assert engine.search("alpha", k=10, fq={"source-name": "nosuch"}) == []
    assert engine.search("alpha", k=10, fq={"nofield": "web"}) == []


def test_fq_mode_parity(engine):
    fq = {"source-name": "wiki"}
    want = engine.search("alpha delta", k=10, conjunctive=False,
                         mode="exact", fq=fq)
    assert want  # p4 (delta), p5 (alpha)
    for mode in ("wand", "maxscore", "slow", "auto"):
        got = engine.search("alpha delta", k=10, conjunctive=False,
                            mode=mode, fq=fq)
        assert [d for d, _ in got] == [d for d, _ in want], mode
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9


def test_fq_composes_with_min_match(engine):
    ids = _ids(engine)
    got = engine.search("alpha beta gamma", k=10, conjunctive=False,
                        min_match=2, fq={"lang": "en"})
    assert {d for d, _ in got} == {ids["p0"], ids["p3"]}  # p1 is de


def test_fq_validation(engine):
    for bad in ({}, [], "lang=en", {"": "x"}, {"lang": ""}, {"lang": 3},
                {3: "en"}):
        with pytest.raises(ValidationError):
            engine.search("alpha", fq=bad)
    with pytest.raises(ValidationError):
        engine.search("alpha", fq={"lang": "en"},
                      synonyms={"alpha": ["beta"]})


# -- wildcard queries (Lucene WildcardQuery) ---------------------------------


def test_expand_wildcard_warm_and_cold_agree(engine, spark):
    assert engine.expand_wildcard("alpha*") == ["alpha", "alphabet"]
    assert engine.expand_wildcard("*eta") == ["beta"]
    assert engine.expand_wildcard("?eta") == ["beta"]
    assert engine.expand_wildcard("a*t") == ["alphabet"]
    assert engine.expand_wildcard("zzz*") == []
    cold = ExtractorEngine(
        spark, engine.root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    assert cold.expand_wildcard("a*t") == ["alphabet"]
    assert cold.expand_wildcard("?eta") == ["beta"]
    assert cold.expand_wildcard("zzz*") == []


def test_wildcard_search_is_scoring_boolean(engine):
    got = engine.wildcard_search("alph*", k=10)
    want = engine.search("alpha alphabet", k=10, conjunctive=False,
                         mode="exact")
    assert got == want


def test_wildcard_validation(engine):
    for bad in ("", "  ", "a b*", "UP PER", "a%b", None, 7, "*", "?*"):
        with pytest.raises(ValidationError):
            engine.expand_wildcard(bad)
    with pytest.raises(ValidationError):
        engine.expand_wildcard("*a*", max_expansions=2)


# -- fuzzy queries (Lucene FuzzyQuery) ---------------------------------------


def test_expand_fuzzy_warm_and_cold_agree(engine, spark):
    assert engine.expand_fuzzy("alphq", 1) == ["alpha"]
    assert engine.expand_fuzzy("betq", 1) == ["beta"]
    assert engine.expand_fuzzy("gamm", 2) == ["gamma"]
    assert engine.expand_fuzzy("zzzzz", 2) == []
    # exact term is distance 0 of itself
    assert "delta" in engine.expand_fuzzy("delta", 1)
    cold = ExtractorEngine(
        spark, engine.root, n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    assert cold.expand_fuzzy("alphq", 1) == ["alpha"]
    assert cold.expand_fuzzy("gamm", 2) == ["gamma"]
    assert cold.expand_fuzzy("zzzzz", 2) == []


def test_fuzzy_search_is_scoring_boolean(engine):
    got = engine.fuzzy_search("alphq", k=10, max_edits=1)
    want = engine.search("alpha", k=10, conjunctive=False, mode="exact")
    assert got == want


def test_fuzzy_validation(engine):
    for bad_edits in (0, 3, -1, True, 1.5, "1"):
        with pytest.raises(ValidationError):
            engine.expand_fuzzy("alpha", bad_edits)
    for bad_term in ("", "two words", None, 7):
        with pytest.raises(ValidationError):
            engine.expand_fuzzy(bad_term, 1)


def test_edit_distance_matches_full_dp():
    import itertools

    from ckanext_extractor_spark.api import _edit_distance_leq

    def full_dp(a, b):
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1, d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[la][lb]

    words = ["".join(w) for n in range(4)
             for w in itertools.product("abc", repeat=n)]
    for a in words:
        for b in words:
            want = full_dp(a, b)
            for n in (1, 2):
                assert _edit_distance_leq(a, b, n) == (want <= n), (a, b, n)


def test_restrict_docs_unit():
    import numpy as np

    from ckanext_extractor_spark.operators.wand import (
        TermPostings, restrict_docs,
    )

    tp = TermPostings(
        "t", 1.0, np.array([1, 5, 9, 12]), np.array([1, 2, 3, 4]),
        np.array([10, 10, 10, 10]), np.array([12]), np.array([0.4]),
    )
    r = restrict_docs(tp, np.array([5, 12, 99]))
    assert r.doc_ids.tolist() == [5, 12]
    assert r.tfs.tolist() == [2, 4]
    assert r.idf == tp.idf  # scores untouched
    assert restrict_docs(tp, np.array([], dtype=np.int64)).doc_ids.size == 0
    assert restrict_docs(
        tp, np.array([1, 5, 9, 12])
    ).doc_ids.tolist() == [1, 5, 9, 12]


# -- boolean query language (Lucene classic QueryParser subset) --------------


def _same_hits(a, b, tol=1e-9):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert abs(x - y) < tol


def test_expr_equivalent_to_flat_queries(engine):
    _same_hits(
        engine.search_expr("alpha AND beta"),
        engine.search("alpha beta", conjunctive=True, mode="exact"),
    )
    _same_hits(  # juxtaposition = default AND (schema parity)
        engine.search_expr("alpha beta"),
        engine.search_expr("alpha AND beta"),
    )
    _same_hits(
        engine.search_expr("alpha OR epsilon"),
        engine.search("alpha epsilon", conjunctive=False, mode="exact"),
    )


def test_expr_nested_with_negation(engine):
    ids = _ids(engine)
    got = engine.search_expr("(alpha OR delta) AND beta -gamma")
    # (alpha|delta)&beta: p0, p1, p3; -gamma drops p0 and p3
    assert [d for d, _ in got] == [ids["p1"]]
    # score sums exactly the matched scoring clauses (alpha + beta)
    base = dict(engine.search("alpha beta", conjunctive=True, mode="exact"))
    assert abs(got[0][1] - base[ids["p1"]]) < 1e-9
    # NOT spelled out behaves like '-'
    _same_hits(
        engine.search_expr("(alpha OR delta) AND beta NOT gamma"), got)


def test_expr_or_scores_only_matching_side(engine):
    ids = _ids(engine)
    got = dict(engine.search_expr("alpha OR beta"))
    only_alpha = dict(engine.search("alpha", k=10, mode="exact"))
    # p2 ("alpha delta") matches only the alpha side
    assert abs(got[ids["p2"]] - only_alpha[ids["p2"]]) < 1e-9


def test_expr_boost_multiplies_contribution(engine):
    ids = _ids(engine)
    plain = dict(engine.search("alpha", k=10, mode="exact"))
    boosted = dict(engine.search_expr("alpha^2 OR epsilon"))
    assert abs(boosted[ids["p2"]] - 2.0 * plain[ids["p2"]]) < 1e-9


def test_expr_multitoken_term_is_conjunctive_group(engine):
    # 'alpha-beta' analyzes to [alpha, beta] under the code-aware query
    # chain -> conjunctive group, same as the AND form
    _same_hits(
        engine.search_expr("alpha-beta"),
        engine.search_expr("alpha AND beta"),
    )


def test_expr_syntax_and_pure_negation_rejected(engine):
    for bad in ("", "   ", "-alpha", "NOT alpha", "alpha AND", "(alpha",
                "alpha)", "AND", "alpha OR"):
        with pytest.raises(ValidationError):
            engine.search_expr(bad)


def test_expr_quoted_phrase_clause(engine):
    ids = _ids(engine)
    # "beta gamma" adjacent in p0 and p3 only (p1 has beta, no gamma)
    got = engine.search_expr('"beta gamma"')
    assert {d for d, _ in got} == {ids["p0"], ids["p3"]}
    # phrase scores = conjunctive BM25 of its terms on matching docs
    base = dict(engine.search("beta gamma", conjunctive=True, mode="exact"))
    for d, s in got:
        assert abs(s - base[d]) < 1e-9
    # composes: phrase OR term adds only the matching side
    both = engine.search_expr('"beta gamma" OR epsilon')
    assert {d for d, _ in both} == {ids["p0"], ids["p3"], ids["p4"]}
    # negated phrase filters
    neg = engine.search_expr('beta -"beta gamma"')
    assert {d for d, _ in neg} == {ids["p1"]}


def test_expr_phrase_slop_and_boost(engine):
    ids = _ids(engine)
    # "alpha gamma" non-adjacent in p0 (alpha beta gamma): slop 1 matches
    assert engine.search_expr('"alpha gamma"') == []
    got = engine.search_expr('"alpha gamma"~1')
    assert {d for d, _ in got} == {ids["p0"]}
    base = dict(engine.search("alpha gamma", conjunctive=True, mode="exact"))
    boosted = engine.search_expr('"alpha gamma"~1^3')
    assert abs(boosted[0][1] - 3.0 * base[ids["p0"]]) < 1e-9


def test_expr_respects_tombstones(spark, tmp_path):
    eng = ExtractorEngine(
        spark, str(tmp_path / "exprdel"), n_buckets=8, salt_threshold=50,
        indexed_fields=("source-*", "lang"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ex")
    ids = _ids(eng)
    before = {d for d, _ in eng.search_expr("alpha OR delta")}
    assert ids["p2"] in before
    eng.delete([ids["p2"]])
    after = {d for d, _ in eng.search_expr("alpha OR delta")}
    assert after == before - {ids["p2"]}


# -- pagination (Solr start/rows) --------------------------------------------


def test_start_paginates_the_ranked_window(engine):
    full = engine.search("alpha delta", k=10, conjunctive=False)
    assert len(full) >= 4
    for s in range(len(full) + 1):
        assert engine.search("alpha delta", k=10, conjunctive=False,
                             start=s) == full[s:]
    page2 = engine.search("alpha delta", k=2, conjunctive=False, start=2)
    assert page2 == full[2:4]
    for bad in (-1, 1.5, "0", True):
        with pytest.raises(ValidationError):
            engine.search("alpha", start=bad)


# -- sort by metadata field (Solr sort=field) --------------------------------


def test_search_sorted_orders_by_field_value(engine):
    ids = _ids(engine)
    got = engine.search_sorted("alpha", "source-name")
    # alpha docs: p0/p1 (web), p2 (book), p5 (wiki); asc by value, id
    assert [v for _, v in got] == ["book", "web", "web", "wiki"]
    assert got[0][0] == ids["p2"] and got[3][0] == ids["p5"]
    assert {got[1][0], got[2][0]} == {ids["p0"], ids["p1"]}
    assert got[1][0] < got[2][0]  # value ties break doc_id asc
    desc = engine.search_sorted("alpha", "source-name", ascending=False)
    assert [v for _, v in desc] == ["wiki", "web", "web", "book"]
    assert engine.search_sorted("alpha", "source-name", k=2) == got[:2]


def test_search_sorted_missing_field_and_validation(engine):
    assert engine.search_sorted("alpha", "nope") == []
    with pytest.raises(ValidationError):
        engine.search_sorted("alpha", "")
    with pytest.raises(ValidationError):
        engine.search_sorted("", "lang")


# -- dismax multi-field scoring (Solr qf / Lucene DisjunctionMaxQuery) -------


OVERLAP_DOCS = [
    # 'spark' appears in BOTH fields of d0 so max-vs-sum is observable;
    # 'Num' is a numeric-valued string field for the stats tests
    ("r/b", "d0", "c0", "markdown", "spark engine",
     {"Title": ["spark engine"], "Tags": ["spark fast"], "Num": ["4"]}),
    ("r/b", "d1", "c1", "markdown", "spark spark engine",
     {"Title": ["spark spark engine"], "Tags": ["slow"], "Num": ["10"]}),
    ("r/b", "d2", "c2", "markdown", "other thing spark",
     {"Title": ["other thing"], "Tags": ["spark"], "Num": ["7"]}),
    ("r/b", "d3", "c3", "markdown", "nothing",
     {"Title": ["nothing"], "Tags": ["none here"]}),
]


@pytest.fixture(scope="module")
def dismax_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dismax"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50,
                          indexed_fields=("title", "tags", "num"))
    eng.extract(spark.createDataFrame(OVERLAP_DOCS, SCHEMA), build_id="dm")
    return eng


def test_dismax_is_max_plus_tie_times_rest(dismax_engine):
    eng = dismax_engine
    s_title = dict(eng.dismax_search("spark", {"title": 1.0}, k=10))
    s_tags = dict(eng.dismax_search("spark", {"tags": 1.0}, k=10))
    assert s_title and s_tags
    both = dict(eng.dismax_search("spark", {"title": 1.0, "tags": 1.0},
                                  k=10))
    assert set(both) == set(s_title) | set(s_tags)
    for d, s in both.items():
        assert s == pytest.approx(
            max(s_title.get(d, 0.0), s_tags.get(d, 0.0)), rel=1e-9)
    tied = dict(eng.dismax_search("spark", {"title": 1.0, "tags": 1.0},
                                  k=10, tie=1.0))
    for d, s in tied.items():
        assert s == pytest.approx(
            s_title.get(d, 0.0) + s_tags.get(d, 0.0), rel=1e-9)


def test_dismax_min_match_filters_not_rescores(dismax_engine):
    eng = dismax_engine
    qf = {"title": 1.0, "tags": 1.0}
    full = dict(eng.dismax_search("spark engine", qf, k=10))
    got = eng.dismax_search("spark engine", qf, k=10, min_match=2)
    # d2 matches only 'spark' (tags) -> dropped; survivors keep scores
    assert len(got) == len(full) - 1
    for d, s in got:
        assert s == pytest.approx(full[d], rel=1e-12)
    assert eng.dismax_search("spark engine", qf, min_match=3) == []
    for bad in (0, -1, True, 1.5):
        with pytest.raises(ValidationError):
            eng.dismax_search("spark", qf, min_match=bad)


def test_dismax_boost_scales_field_scores(dismax_engine):
    eng = dismax_engine
    s1 = dict(eng.dismax_search("spark engine", {"title": 1.0}, k=10))
    s2 = dict(eng.dismax_search("spark engine", {"title": 2.0}, k=10))
    assert set(s1) == set(s2) and s1
    for d in s1:
        assert s2[d] == pytest.approx(2 * s1[d], rel=1e-12)


def test_dismax_engine_ranking_and_validation(engine):
    ids = _ids(engine)
    got = engine.dismax_search("web en", {"source-name": 2.0, "lang": 1.0})
    assert {d for d, _ in got} == {ids[p] for p in
                                   ("p0", "p1", "p2", "p3", "p4")}
    # p0 is the only doc matching both terms -> strictly on top
    assert got[0][0] == ids["p0"]
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    for bad_qf in ({}, {"f": -1.0}, {"": 1.0}, {"f": True}, "f", None):
        with pytest.raises(ValidationError):
            engine.dismax_search("web", bad_qf)
    for bad_tie in (-0.1, 1.5, "0", True):
        with pytest.raises(ValidationError):
            engine.dismax_search("web", {"lang": 1.0}, tie=bad_tie)
    assert engine.dismax_search("???", {"lang": 1.0}) == []


# -- result grouping / field collapse (Solr group.field) ----------------------


def test_grouped_search_collapses_by_field(engine):
    ids = _ids(engine)
    got = engine.grouped_search("alpha", "source-name")
    # alpha docs: p0,p1 (web), p2 (book), p5 (wiki); best scores:
    # p1==p2 (doc_len 2) > p0==p5 (doc_len 3); group ties break value asc
    assert [(v, n) for v, _, n, _ in got] == [
        ("book", 1), ("web", 2), ("wiki", 1)]
    assert got[0][1] == pytest.approx(got[1][1], rel=1e-12)
    assert got[2][1] < got[0][1]
    # group best == the representative doc's search() BM25 (idf parity
    # holds on a tombstone-free index)
    full = dict(engine.search("alpha", k=10))
    assert got[1][1] == pytest.approx(full[ids["p1"]], rel=1e-12)
    # group_limit=1: the representative is the group's best doc
    assert [d for _, _, _, docs in got for d, _ in docs] == [
        ids["p2"], ids["p1"], ids["p5"]]
    two = engine.grouped_search("alpha", "source-name", group_limit=2)
    assert [d for d, _ in two[1][3]] == [ids["p1"], ids["p0"]]
    assert engine.grouped_search("alpha", "source-name", k=2) == got[:2]
    assert engine.grouped_search("alpha", "nope") == []


def test_grouped_search_validation(engine):
    for bad in ("", None, 7):
        with pytest.raises(ValidationError):
            engine.grouped_search("alpha", bad)
    for bad in (0, -1, True, 1.5):
        with pytest.raises(ValidationError):
            engine.grouped_search("alpha", "lang", group_limit=bad)


def test_cli_group(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    want = engine.grouped_search("alpha", "source-name", group_limit=2)
    assert main(["query", "--index", engine.root, "--q", "alpha",
                 "--group", "source-name", "--group-limit", "2",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [(r["value"], r["n"]) for r in lines] == [
        (v, n) for v, _, n, _ in want]
    assert [[d["doc_id"] for d in r["docs"]] for r in lines] == [
        [d for d, _ in docs] for _, _, _, docs in want]


# -- range filter queries (Solr fq field:[a TO b]) ----------------------------


def test_fq_range_restricts_lexicographically(engine):
    ids = _ids(engine)
    # alpha docs: p0,p1 (web), p2 (book), p5 (wiki); [book TO web] keeps
    # book+web, excludes wiki
    got = {d for d, _ in engine.search(
        "alpha", k=10, fq={"source-name": "[book TO web]"})}
    assert got == {ids["p0"], ids["p1"], ids["p2"]}
    # exclusive bounds drop the endpoints entirely
    assert engine.search(
        "alpha", k=10, fq={"source-name": "{book TO web}"}) == []
    # open upper bound
    got = {d for d, _ in engine.search(
        "alpha", k=10, fq={"source-name": "[web TO *]"})}
    assert got == {ids["p0"], ids["p1"], ids["p5"]}
    # [* TO *] = field exists (every doc here has source-name)
    full = engine.search("alpha", k=10)
    assert engine.search(
        "alpha", k=10, fq={"source-name": "[* TO *]"}) == full


def test_fq_range_never_rescores_and_composes(engine):
    ids = _ids(engine)
    full = dict(engine.search("alpha", k=10))
    got = engine.search("alpha", k=10,
                        fq={"source-name": "[book TO web]"})
    for d, s in got:
        assert abs(full[d] - s) < 1e-12
    # range clause composes (ANDs) with a token fq on another field
    both = {d for d, _ in engine.search(
        "alpha", k=10,
        fq={"source-name": "[book TO web]", "lang": "en"})}
    assert both == {ids["p0"], ids["p2"]}
    # unknown field: range matches nothing
    assert engine.search("alpha", k=10, fq={"nope": "[a TO z]"}) == []


# -- pivot facets (Solr facet.pivot) ------------------------------------------


def test_pivot_facets_nested_counts(engine):
    got = engine.pivot_facets("alpha", ["source-name", "lang"])
    # alpha docs: p0 (web,en), p1 (web,de), p2 (book,en), p5 (wiki,de)
    assert [(v, n) for v, n, _ in got] == [
        ("web", 2), ("book", 1), ("wiki", 1)]
    assert [(v, n) for v, n, _ in got[0][2]] == [("de", 1), ("en", 1)]
    assert got[1][2] == [("en", 1, [])]
    assert got[2][2] == [("de", 1, [])]
    # pruning: children only under surviving parents
    top1 = engine.pivot_facets("alpha", ["source-name", "lang"],
                               k_per_level=1)
    assert top1 == [("web", 2, [("de", 1, [])])]
    # single-level pivot == flat facets
    flat = engine.pivot_facets("alpha", ["source-name"])
    assert [(v, n) for v, n, _ in flat] == [
        ("web", 2), ("book", 1), ("wiki", 1)]
    assert engine.pivot_facets("alpha", ["nope", "lang"]) == []


def test_pivot_facets_validation(engine):
    for bad in ([], ["", "lang"], "lang", [1]):
        with pytest.raises(ValidationError):
            engine.pivot_facets("alpha", bad)
    with pytest.raises(ValidationError):
        engine.pivot_facets("alpha", ["lang"], k_per_level=0)


def test_cli_pivot(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["facets", "--index", engine.root, "--q", "alpha",
                 "--fields", "source-name", "lang", "--pivot",
                 "--buckets", "8"]) == 0
    tree = json.loads(capsys.readouterr().out.strip())
    assert tree[0]["value"] == "web" and tree[0]["count"] == 2
    assert [c["value"] for c in tree[0]["pivot"]] == ["de", "en"]


# -- field stats over matches (Solr StatsComponent) ---------------------------


def test_field_stats_string_field(engine):
    st = engine.field_stats("alpha", "source-name")
    assert st == {"count": 4, "missing": 0, "min": "book", "max": "wiki",
                  "sum": None, "mean": None, "stddev": None}
    assert engine.field_stats("alpha", "nope") == {
        "count": 0, "missing": 4, "min": None, "max": None,
        "sum": None, "mean": None, "stddev": None}
    with pytest.raises(ValidationError):
        engine.field_stats("alpha", "")


def test_field_stats_numeric_field(dismax_engine):
    # 'spark' (OR) matches d0/d1/d2: Num values '4','10','7' — min/max
    # lexicographic on the raw strings, sum/mean numeric
    st = dismax_engine.field_stats("spark", "num", conjunctive=False)
    assert st["count"] == 3 and st["missing"] == 0
    assert (st["min"], st["max"]) == ("10", "7")
    assert st["sum"] == pytest.approx(21.0)
    assert st["mean"] == pytest.approx(7.0)
    # 'nothing' matches only d3, which lacks Num
    st2 = dismax_engine.field_stats("nothing", "num")
    assert st2["count"] == 0 and st2["missing"] == 1


def test_cli_stats(dismax_engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["stats", "--index", dismax_engine.root, "--q", "spark",
                 "--field", "num", "--or", "--buckets", "4"]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st["count"] == 3 and st["sum"] == 21.0


# -- spellcheck suggestions (Solr spellcheck) ---------------------------------


def test_suggest_spellcheck(engine):
    got = engine.suggest("alpa beta")
    # 'alpa' -> alpha (distance 1, df 4); 'beta' is indexed -> no entry
    assert got["alpa"][0] == ("alpha", 4)
    assert got["beta"] == []
    # distance-1 candidate outranks any distance-2 one
    assert engine.suggest("gama")["gama"][0][0] == "gamma"
    # nothing within max_edits
    assert engine.suggest("zzzzzzzz") == {"zzzzzzzz": []}
    # warm path agrees (banded-DP dictionary expansion)
    engine.warm()
    assert engine.suggest("alpa beta") == got
    engine.cool()
    for bad in (0, -1, True, "5"):
        with pytest.raises(ValidationError):
            engine.suggest("alpa", max_suggestions=bad)


def test_cli_suggest(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["suggest", "--index", engine.root, "--q", "alpa",
                 "--buckets", "8"]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["term"] == "alpa"
    assert line["suggestions"][0] == {"term": "alpha", "df": 4}


# -- function-query boosting (edismax bf) -------------------------------------


def test_boosted_search_additive_bf(dismax_engine):
    eng = dismax_engine
    ids = _ids(eng)
    base = dict(eng.search("spark", k=10, conjunctive=False))
    num = {ids["d0"]: 4.0, ids["d1"]: 10.0, ids["d2"]: 7.0}
    got = eng.boosted_search("spark", "num", conjunctive=False, weight=1.0)
    assert {d for d, _ in got} == set(base)
    for d, s in got:
        assert s == pytest.approx(base[d] + num[d], rel=1e-9)
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    # weight scales the boost linearly
    half = dict(eng.boosted_search("spark", "num", conjunctive=False,
                                   weight=0.5))
    for d in base:
        assert half[d] == pytest.approx(base[d] + 0.5 * num[d], rel=1e-9)
    # missing field value -> boost 0 (Solr missing function value)
    only = eng.boosted_search("nothing", "num")
    assert len(only) == 1 and only[0][1] == pytest.approx(
        dict(eng.search("nothing", k=10))[only[0][0]], rel=1e-9)
    for bad_f, bad_w in (("", 1.0), (7, 1.0), ("num", "x"), ("num", True)):
        with pytest.raises(ValidationError):
            eng.boosted_search("spark", bad_f, weight=bad_w)


# -- spellcheck collation (Solr spellcheck.collate) ----------------------------


def test_collate_replaces_only_unindexed_terms(engine):
    assert engine.collate("alpa beta") == "alpha beta"
    assert engine.collate("alpha beta") == "alpha beta"
    assert engine.collate("zzzzzzzz alpa") == "zzzzzzzz alpha"


def test_cli_suggest_collate(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["suggest", "--index", engine.root, "--q", "alpa beta",
                 "--collate", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1] == {"collation": "alpha beta"}


# -- MoreLikeThis (Lucene MLT) ------------------------------------------------


MLT_DOCS = [
    ("r/c", "m0", "c0", "markdown", "rust tokio async runtime executor", {}),
    ("r/c", "m1", "c1", "markdown", "rust tokio async network", {}),
    ("r/c", "m2", "c2", "markdown", "python asyncio loop", {}),
    ("r/c", "m3", "c3", "markdown", "java threads", {}),
    ("r/c", "m4", "c4", "markdown", "rust tokio async runtime", {}),
]


@pytest.fixture(scope="module")
def mlt_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mlt"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50,
                          store_content=True)
    eng.extract(spark.createDataFrame(MLT_DOCS, SCHEMA), build_id="mlt")
    return eng


def test_mlt_ranks_similar_docs_and_drops_seed(mlt_engine):
    ids = _ids(mlt_engine)
    got = mlt_engine.more_like_this(ids["m0"])
    assert [d for d, _ in got] == [ids["m4"], ids["m1"]]
    assert ids["m0"] not in {d for d, _ in got}
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
    # warm serving path selects the same terms (df from cached rows)
    mlt_engine.warm()
    assert mlt_engine.more_like_this(ids["m0"]) == got
    mlt_engine.cool()


def test_mlt_term_selection_knobs(mlt_engine):
    ids = _ids(mlt_engine)
    # max_query_terms=1 keeps only the top tf*idf term: 'runtime'
    # (df=2 beats the df=3 terms at equal tf) -> only m4 matches
    one = mlt_engine.more_like_this(ids["m0"], max_query_terms=1)
    assert [d for d, _ in one] == [ids["m4"]]
    # min_doc_freq above the corpus max df selects nothing
    assert mlt_engine.more_like_this(ids["m0"], min_doc_freq=4) == []
    # unknown doc -> no hits
    assert mlt_engine.more_like_this(999999999) == []


def test_mlt_validation(mlt_engine, engine):
    with pytest.raises(ValidationError):
        engine.more_like_this(1)  # engine fixture: store_content=False
    for bad in ("7", 1.5, True):
        with pytest.raises(ValidationError):
            mlt_engine.more_like_this(bad)
    for kw in ("max_query_terms", "min_term_freq", "min_doc_freq"):
        with pytest.raises(ValidationError):
            mlt_engine.more_like_this(1, **{kw: 0})


def test_mlt_interesting_terms(mlt_engine):
    import math

    ids = _ids(mlt_engine)
    got = mlt_engine.interesting_terms(ids["m0"])
    # m0 terms with df >= 2: rust(3) tokio(3) async(3) runtime(2);
    # executor has df 1. tf=1 everywhere -> boost = 1 + ln(5/(df+1)),
    # runtime's lower df wins, then term asc among the df=3 trio.
    assert [t for t, _ in got] == ["runtime", "async", "rust", "tokio"]
    assert got[0][1] == pytest.approx(1.0 + math.log(5 / 3), rel=1e-12)
    assert got[1][1] == pytest.approx(1.0 + math.log(5 / 4), rel=1e-12)
    # the selection IS more_like_this's query term set (same ranking)
    one = mlt_engine.interesting_terms(ids["m0"], max_query_terms=1)
    assert [t for t, _ in one] == ["runtime"]
    with pytest.raises(ValidationError):
        mlt_engine.interesting_terms(ids["m0"], max_query_terms=0)


def test_cli_mlt_interesting_terms(mlt_engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    ids = _ids(mlt_engine)
    assert main(["mlt", "--index", mlt_engine.root, str(ids["m0"]),
                 "--interesting-terms", "--buckets", "4"]) == 0
    rows = json.loads(capsys.readouterr().out.strip())
    assert [r["term"] for r in rows] == ["runtime", "async", "rust",
                                         "tokio"]


def test_cli_mlt(mlt_engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    ids = _ids(mlt_engine)
    want = mlt_engine.more_like_this(ids["m0"])
    assert main(["mlt", "--index", mlt_engine.root, str(ids["m0"]),
                 "--buckets", "4"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [d for d, _ in want]


# -- CLI surface -------------------------------------------------------------


def test_cli_qf_dismax(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    want = engine.dismax_search("web en", {"source-name": 2.0, "lang": 1.0})
    assert main(["query", "--index", engine.root, "--q", "web en",
                 "--qf", "source-name^2", "--qf", "lang",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [d for d, _ in want]
    assert [r["score"] for r in lines] == [round(s, 6) for _, s in want]


def test_cli_start_and_sort(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    full = engine.search("alpha delta", k=10, conjunctive=False)
    assert main(["query", "--index", engine.root, "--q", "alpha delta",
                 "--or", "--start", "2", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [d for d, _ in full[2:]]
    assert main(["query", "--index", engine.root, "--q", "alpha",
                 "--sort", "source-name", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["value"] for r in lines] == ["book", "web", "web", "wiki"]


def test_cli_expr(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    ids = _ids(engine)
    assert main(["query", "--index", engine.root, "--q",
                 "(alpha OR delta) AND beta -gamma", "--expr",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in lines] == [ids["p1"]]


def test_cli_fq_wildcard_fuzzy(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    ids = _ids(engine)
    assert main(["query", "--index", engine.root, "--q", "alpha",
                 "--fq", "source-name=web", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in lines} == {ids["p0"], ids["p1"]}
    assert main(["query", "--index", engine.root, "--q", "a*t",
                 "--wildcard", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in lines} == {ids["p5"]}
    assert main(["query", "--index", engine.root, "--q", "alphq",
                 "--fuzzy", "1", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines and lines[0]["doc_id"] in set(ids.values())


def test_cli_prefix_min_match_facets(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["query", "--index", engine.root, "--q", "alp",
                 "--prefix", "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines and {d for d in (r["doc_id"] for r in lines)} >= {
        _ids(engine)["p5"]
    }
    assert main(["query", "--index", engine.root, "--q",
                 "alpha beta gamma", "--or", "--min-match", "2",
                 "--buckets", "8"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert main(["facets", "--index", engine.root, "--q", "alpha",
                 "--fields", "source-name", "lang", "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["source-name"][0] == {"value": "web", "count": 2}


def test_cache_hit_fast_path_never_aliases_bad_args(engine):
    """r6: the cache-hit fast path must not let malformed arguments
    alias a cached valid key — a falsy fq ({} / []) shares the
    fq=None key shape, and unhashable arguments must still reach the
    validators (regression guard for the r6 fast-path)."""
    # populate the cache with the fq=None form
    good = engine.search("alpha", k=5)
    assert engine.search("alpha", k=5) == good  # hit path
    for bad_fq in ({}, [], "lang=en", {"lang": {"nested": 1}}):
        with pytest.raises(ValidationError):
            engine.search("alpha", k=5, fq=bad_fq)
    with pytest.raises(ValidationError):
        engine.search("alpha", k=[5])  # unhashable k -> validator error
