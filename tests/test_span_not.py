"""Lucene SpanNotQuery: an ordered include span (SpanNear total-gap
budget) that survives only when no exclude-term position sits in the
dilated window [first - pre, last + post]. Matching docs keep the
include terms' conjunctive BM25 score — the span constraint changes
the match set, never scores (the pinned span-family contract).
Reference analog: Solr/Lucene SpanNotQuery over the catch-all `text`
field (schema.xml:161,188)."""

from __future__ import annotations

import numpy as np
import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.phrase import span_not_filter_docs

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    docs = [
        ("r", "s0", "c0", "python", "new york city"),          # excl right after
        ("r", "s1", "c1", "python", "new york state"),         # clean
        ("r", "s2", "c2", "python", "city new york"),          # excl right before
        ("r", "s3", "c3", "python", "new city york"),          # excl inside window
        ("r", "s4", "c4", "python", "new york x x city"),      # excl 3 after
        ("r", "s5", "c5", "python", "city x new york x city new york"),
        # ^ two spans: first has city 2 before + 1 after; SECOND span
        #   (positions 6,7) has city at 5 -> 1 before
        ("r", "s6", "c6", "python", "york new"),               # no ordered span
    ]
    root = str(tmp_path_factory.mktemp("spannot"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(docs, SCHEMA), build_id="snot")
    return eng


def _paths(eng, hits):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    by_id = {r["doc_id"]: r["path"] for r in rows}
    return sorted(by_id[d] for d, _ in hits)


def test_plain_overlap_excludes_inside_window_only(engine):
    # pre=post=0: only an exclude position INSIDE [first, last] kills.
    # s0/s2/s4: city outside the 2-token window -> survive.
    # s3: 'new city york' span is (0,2) with slop 1; city@1 inside -> dead.
    hits = engine.span_not_search("new york", "city", slop=1, k=10)
    assert _paths(engine, hits) == ["s0", "s1", "s2", "s4", "s5"]


def test_post_kills_following_exclude(engine):
    # post=1: city one token after the span kills s0; s4 (3 after) lives
    hits = engine.span_not_search("new york", "city", k=10, post=1)
    got = _paths(engine, hits)
    assert "s0" not in got and "s4" in got and "s1" in got
    # post=3 reaches s4 too
    hits = engine.span_not_search("new york", "city", k=10, post=3)
    assert "s4" not in _paths(engine, hits)


def test_pre_kills_preceding_exclude(engine):
    hits = engine.span_not_search("new york", "city", k=10, pre=1)
    got = _paths(engine, hits)
    assert "s2" not in got and "s0" in got


def test_some_span_surviving_suffices(engine):
    # s5 = "city x new york x city new york": spans (2,3) and (6,7),
    # city at 0 and 5. pre=2 kills BOTH (zones [0,3] ∋ 0 and [4,7] ∋ 5)
    # -> doc dead; post=2 kills only span1 (zone [2,5] ∋ 5; span2 zone
    # [6,9] clean) -> one surviving span keeps the doc alive.
    hits = engine.span_not_search("new york", "city", k=10, pre=2)
    assert "s5" not in _paths(engine, hits)
    hits = engine.span_not_search("new york", "city", k=10, post=2)
    assert "s5" in _paths(engine, hits)


def test_absent_exclude_equals_span_near(engine):
    a = engine.span_not_search("new york", "zzznope", slop=1, k=10)
    b = engine.span_near_search("new york", slop=1, k=10)
    assert a == b


def test_scores_equal_conjunctive_search(engine):
    plain = dict(engine.search("new york", k=10))
    for d, s in engine.span_not_search("new york", "city", k=10):
        assert s == pytest.approx(plain[d], abs=1e-9)


def test_no_ordered_span_never_matches(engine):
    hits = engine.span_not_search("new york", "city", slop=0, k=10)
    assert "s6" not in _paths(engine, hits)


def test_exclude_equal_to_include_term_matches_nothing(engine):
    # the window always contains its own positions
    assert engine.span_not_search("new york", "york", k=10) == []


def test_validation(engine):
    with pytest.raises(ValidationError):
        engine.span_not_search("new york", "big city", k=10)  # 2-term excl
    with pytest.raises(ValidationError):
        engine.span_not_search("new york", "city", k=10, pre=-1)
    with pytest.raises(ValidationError):
        engine.span_not_search("new york", "city", k=10, post=True)
    with pytest.raises(ValidationError):
        engine.span_not_search("", "city", k=10)


def test_kernel_dominance_edge():
    """Non-minimal spans need not be checked: if the minimal span from a
    start is killed, wider ones are too (kill zone grows with the
    window). Kernel agrees with a brute-force all-spans check."""
    def rows(term_positions):
        # fake one segment row per term: the kernel only needs
        # _positions_by_doc -> patch via a minimal stand-in
        return term_positions

    # monkeypatch-free: drive span_not_filter_docs through its real
    # row decoding is covered by the engine tests; here test the pure
    # logic via a tiny fake _positions_by_doc
    import ckanext_extractor_spark.operators.phrase as ph

    orig = ph._positions_by_doc

    def fake(row, dead, wanted=None):
        return {d: np.asarray(p, dtype=np.int64) for d, p in row.items()}

    ph._positions_by_doc = fake
    try:
        shard = {
            "a": [{0: [0], 1: [0]}],
            "b": [{0: [1, 5], 1: [1]}],
            "x": [{0: [1], 1: [2]}],
        }
        # doc 0: spans from start 0: minimal (0,1) killed by x@1;
        # wider (0,5) also contains x@1 -> dead
        # doc 1: span (0,1); x@2 outside window (post=0) -> alive
        out = span_not_filter_docs([0, 1], shard, ["a", "b"], "x",
                                   slop=9, pre=0, post=0)
        assert out == [1]
        # post=1 reaches x@2 in doc 1 too
        out = span_not_filter_docs([0, 1], shard, ["a", "b"], "x",
                                   slop=9, pre=0, post=1)
        assert out == []
    finally:
        ph._positions_by_doc = orig


def test_cli_span_near_and_span_not(engine, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    rows = engine.spark.read.parquet(engine._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    by_path = {r["path"]: r["doc_id"] for r in rows}

    assert main(["query", "--index", engine.root, "--q", "new york",
                 "--span-near", "--span-slop", "1",
                 "--buckets", "8"]) == 0
    near = {json.loads(ln)["doc_id"]
            for ln in capsys.readouterr().out.strip().splitlines()}
    assert by_path["s3"] in near and by_path["s6"] not in near

    assert main(["query", "--index", engine.root, "--q", "new york",
                 "--span-not", "city", "--span-slop", "1",
                 "--buckets", "8"]) == 0
    nnot = {json.loads(ln)["doc_id"]
            for ln in capsys.readouterr().out.strip().splitlines()}
    assert nnot == near - {by_path["s3"]}  # the one killed overlap
