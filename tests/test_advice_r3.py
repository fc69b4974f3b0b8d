"""Regression tests for the round-3 ADVICE findings:

* the boolean-query lexer must accept trailing whitespace/newlines
  (boolquery.py _lex);
* a pure-negative OR operand is rejected loudly (Lucene treats a
  pure-negative SHOULD clause as matching nothing; evaluating it as a
  universe complement made `a OR -b` depend on the query's other
  terms);
* the vectorized distributed phrase verify tolerates duplicate live
  (doc, slot) rows — an invariant violation degrades to
  last-write-wins (max gen_seq), not silently dropped docs;
* cold-mode suggest() expands ALL unindexed terms in ONE dictionary
  scan instead of one Spark job per term.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.corpus import corpus_pdf
from ckanext_extractor_spark.operators.boolquery import (
    QuerySyntaxError,
    parse_query,
)


def _analyze(s: str) -> list[str]:
    return [s.lower()]


# -- lexer: trailing whitespace ---------------------------------------------

@pytest.mark.parametrize("q", [
    "vector ",
    "alpha AND beta ",
    "alpha AND beta\n",
    "  alpha  \t",
    '"a b" ',
])
def test_lexer_accepts_trailing_whitespace(q):
    def analyze(s):
        return s.lower().split()

    assert parse_query(q, analyze) is not None


def test_lexer_still_rejects_garbage():
    with pytest.raises(QuerySyntaxError):
        parse_query("^^^", _analyze)  # cannot start any token
    with pytest.raises(QuerySyntaxError):
        parse_query("(a OR", _analyze)  # unbalanced paren
    with pytest.raises(QuerySyntaxError):
        parse_query("   ", _analyze)  # whitespace-only is still empty


# -- pure-negative OR operands ----------------------------------------------

@pytest.mark.parametrize("q", [
    "a OR -b",
    "a OR NOT b",
    "-b OR a",
    "a OR (-b -c)",
    "x AND (a OR -b)",
])
def test_pure_negative_or_operand_rejected(q):
    with pytest.raises(QuerySyntaxError):
        parse_query(q, _analyze)


@pytest.mark.parametrize("q", [
    "a -b",            # default-AND negation: fine
    "a OR (b -c)",     # operand has a positive leaf: fine
    "a OR b",
    "(a OR b) -c",
])
def test_positive_or_operands_still_parse(q):
    assert parse_query(q, _analyze) is not None


# -- engine-level fixtures ---------------------------------------------------

@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("advice_r3") / "idx")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(
        spark.createDataFrame(corpus_pdf(40)), build_id="adv3"
    )
    return eng


def test_search_expr_trailing_whitespace(engine):
    clean = engine.search_expr("data AND value")
    assert engine.search_expr("data AND value ") == clean
    assert engine.search_expr("data AND value\n") == clean


# -- distributed phrase verify: duplicate (doc, slot) rows -------------------

def test_phrase_verify_tolerates_duplicate_doc_slot_rows(engine):
    """Union the live segments with a gen-bumped copy of themselves: every
    (doc, slot) now has TWO live rows. The verify kernel must dedupe
    (max gen_seq wins) and match the same docs as the clean run, not
    silently fail the exact-count gate (ADVICE r3, phrase.py:303)."""
    q = "data value"
    clean = engine.phrase_search(q, k=50, distributed=True)
    assert clean, "phrase must match something for the test to bite"
    orig = engine._segments_union

    def doubled(terms=None):
        df = orig(terms)
        if df is None:
            return None
        return df.unionByName(
            df.withColumn("gen_seq", F.col("gen_seq") + F.lit(1))
        )

    engine._segments_union = doubled
    try:
        got = engine.phrase_search(q, k=50, distributed=True)
    finally:
        engine._segments_union = orig
    # duplicate rows inflate the per-slot df aggregate (idf), so scores
    # may shift in this degenerate state — the MATCH SET must not
    assert {d for d, _ in got} == {d for d, _ in clean}


# -- suggest(): one dictionary scan for all terms ----------------------------

def test_cold_suggest_single_expansion_scan(spark, tmp_path):
    root = str(tmp_path / "idx_sg")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(corpus_pdf(40)), build_id="sg")
    cold = ExtractorEngine(spark, root)  # fresh: no warm caches
    assert cold._rows_cache is None

    calls = {"n": 0}
    orig = cold._segments_union

    def counting(terms=None):
        calls["n"] += 1
        return orig(terms)

    cold._segments_union = counting
    try:
        sugg = cold.suggest("datq valuw datq", max_edits=1)
    finally:
        cold._segments_union = orig
    # one scan for the batched fuzzy expansion + one pruned df lookup —
    # NOT one distinct-terms job per query term
    assert calls["n"] <= 2
    assert [s for s, _ in sugg["datq"]][:1] == ["data"]
    assert [s for s, _ in sugg["valuw"]][:1] == ["value"]


def test_expand_fuzzy_batch_matches_per_term(spark, tmp_path):
    root = str(tmp_path / "idx_fb")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(spark.createDataFrame(corpus_pdf(40)), build_id="fb")
    cold = ExtractorEngine(spark, root)
    terms = ["datq", "valuw", "xyzzyq"]
    batch = cold._expand_fuzzy_batch(terms, 1, cold.PREFIX_MAX_EXPANSIONS)
    for t in terms:
        assert batch[t] == cold.expand_fuzzy(t, max_edits=1)
