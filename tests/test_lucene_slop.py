"""Lucene total-move sloppy phrase (VERDICT r3 #3): slop_mode="lucene"
implements SloppyPhraseScorer's criterion — a doc matches iff one
position per phrase slot can be chosen whose offset-adjusted span
(max(p_i - i) - min(p_i - i)) is <= slop. Reordering is allowed:
"b a"~2 matches text "a b" (a reversal costs 2 moves), which the pinned
per-gap NEAR/n default never does. Reference analog: Solr ``"a b"~n``
through the standard handler (solrconfig.xml:490-500).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.phrase import lucene_slop_match


def brute_match(pos_lists, slop):
    """Exhaustive oracle: minimum adjusted span over every combination."""
    best = min(
        max(p - i for i, p in enumerate(c)) - min(p - i for i, p in enumerate(c))
        for c in itertools.product(*pos_lists)
    )
    return best <= slop


def _np(lists):
    return [np.array(sorted(p), dtype=np.int64) for p in lists]


# -- kernel goldens -----------------------------------------------------------

def test_reversal_costs_two():
    # query "b a" over text "a b": positions a=0, b=1; slots b@0, a@1
    pos = _np([[1], [0]])  # slot 0 = b, slot 1 = a
    assert not lucene_slop_match(pos, 0)
    assert not lucene_slop_match(pos, 1)
    assert lucene_slop_match(pos, 2)


def test_exact_phrase_is_slop_zero():
    assert lucene_slop_match(_np([[4], [5], [6]]), 0)
    assert not lucene_slop_match(_np([[4], [6]]), 0)
    assert lucene_slop_match(_np([[4], [6]]), 1)


def test_multi_occurrence_picks_best_combination():
    # slot0 at {0, 50}, slot1 at {51}: best span |51-1 - 50| = 0
    assert lucene_slop_match(_np([[0, 50], [51]]), 0)
    # slot1 occurs only far away
    assert not lucene_slop_match(_np([[0], [51]]), 10)


def test_kernel_matches_bruteforce_randomized():
    rng = np.random.RandomState(7)
    for _ in range(300):
        n = int(rng.randint(2, 5))
        pos_lists = [
            sorted(set(rng.randint(0, 16, size=rng.randint(1, 4)).tolist()))
            for _ in range(n)
        ]
        slop = int(rng.randint(0, 8))
        assert lucene_slop_match(_np(pos_lists), slop) == brute_match(
            pos_lists, slop
        ), (pos_lists, slop)


# -- engine-level --------------------------------------------------------------

DOCS = [
    ("r", "p0", "c0", "txt", "alpha beta"),         # in order
    ("r", "p1", "c1", "txt", "beta alpha"),         # reversed
    ("r", "p2", "c2", "txt", "alpha filler beta"),  # one gap
    ("r", "p3", "c3", "txt", "beta filler filler alpha"),
    ("r", "p4", "c4", "txt", "alpha gamma"),        # no beta
]

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lslop"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ls")
    return eng


def _ids(eng):
    rows = eng.spark.read.parquet(eng._p("doc_stats")).select(
        "path", "doc_id"
    ).collect()
    return {r["path"]: r["doc_id"] for r in rows}


def test_lucene_slop_allows_reordering(engine):
    ids = _ids(engine)
    # per-gap ordered: "beta alpha" requires beta BEFORE alpha;
    # p1 adjacent, p3 has 2 intervening tokens (<= slop) — p0 is
    # REVERSED and can never match the ordered form
    pergap = {d for d, _ in engine.phrase_search("beta alpha", k=10, slop=2)}
    assert pergap == {ids["p1"], ids["p3"]}
    # total-move: reversal costs 2, so "beta alpha"~2 also matches p0
    # ("alpha beta"); p3's adjusted span is 2 as well
    lucene = {d for d, _ in engine.phrase_search(
        "beta alpha", k=10, slop=2, slop_mode="lucene"
    )}
    assert lucene == {ids["p0"], ids["p1"], ids["p3"]}


def test_lucene_slop_distributed_parity(engine):
    for q, s in (("beta alpha", 2), ("alpha beta", 0), ("alpha beta", 3)):
        a = engine.phrase_search(q, k=10, slop=s, slop_mode="lucene")
        b = engine.phrase_search(q, k=10, slop=s, slop_mode="lucene",
                                 distributed=True)
        assert a == b, (q, s)


def test_lucene_scores_are_conjunctive_bm25(engine):
    base = dict(engine.search("beta alpha", k=10, conjunctive=True))
    for d, s in engine.phrase_search("beta alpha", k=10, slop=2,
                                     slop_mode="lucene"):
        assert abs(base[d] - s) < 1e-12


def test_lucene_mode_rejects_repeated_terms(engine):
    with pytest.raises(ValueError):
        engine.phrase_search("alpha alpha", k=10, slop=1,
                             slop_mode="lucene")
    with pytest.raises(ValueError):
        engine.phrase_search("alpha alpha", k=10, slop=1,
                             slop_mode="lucene", distributed=True)


def test_bad_slop_mode_rejected(engine):
    with pytest.raises(ValidationError):
        engine.phrase_search("alpha beta", k=10, slop=1, slop_mode="total")
