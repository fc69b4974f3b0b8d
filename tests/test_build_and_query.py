"""End-to-end: synthetic corpus -> index build -> BM25 top-k vs numpy oracle.

Analog of the reference's search-visible assertions
(assert_package_found/not_found via live package_search,
tests/helpers.py:239-258): the index is correct iff queries against it
rank-identically match an independent implementation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.corpus import corpus_df, corpus_pdf
from ckanext_extractor_spark.operators.build import (
    build_corpus_stats,
    build_dictionary,
    build_doc_stats,
    prepare_corpus,
    tokenize_postings,
)
from ckanext_extractor_spark.operators.query import bm25_search
from tests.bm25_oracle import OracleIndex

N_DOCS = 200

QUERIES = [
    # (query, lang, conjunctive) — FIXTURES.md §2 mix
    ("golden000042x", None, True),  # single rare term
    ("data", None, True),  # hot term (>50% of docs)
    ("data value", None, True),  # 2-term AND, hot
    ("parseBuffer", None, True),  # camelCase form -> split identifiers
    ("hash_byte", None, True),  # snake_case form
    ("vector cache stream", None, True),  # 3-term AND
    ("zzznothingzzz", None, True),  # zero-match negative
    ("Köln", None, True),  # diacritic folding
    ("data value", None, False),  # disjunctive variant
]


@pytest.fixture(scope="module")
def built(spark):
    prepared = prepare_corpus(corpus_df(spark, N_DOCS)).cache()
    postings = tokenize_postings(prepared).cache()
    dictionary = build_dictionary(postings).cache()
    doc_stats = build_doc_stats(prepared, postings)
    stats = build_corpus_stats(doc_stats).collect()[0]
    oracle = OracleIndex(
        prepared.select("doc_id", "lang", "content").toPandas()
    )
    return prepared, postings, dictionary, stats, oracle


def test_corpus_determinism(spark):
    a = corpus_pdf(5)
    b = corpus_df(spark, 5).toPandas().sort_values("path").reset_index(drop=True)
    a = a.sort_values("path").reset_index(drop=True)
    assert a.equals(b)


def test_corpus_stats_match_oracle(built):
    _, _, _, stats, oracle = built
    assert stats["n_docs"] == oracle.n_docs == N_DOCS
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-9


def test_postings_match_oracle(built):
    _, postings, dictionary, _, oracle = built
    eng = postings.select("doc_id", "term", "tf").toPandas()
    orc = oracle.postings[["doc_id", "term", "tf"]]
    eng_s = eng.sort_values(["doc_id", "term"]).reset_index(drop=True)
    orc_s = orc.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(eng_s) == len(orc_s)
    assert eng_s.equals(orc_s.astype(eng_s.dtypes.to_dict()))
    # dictionary df/cf
    d = dictionary.toPandas().set_index("term")
    assert (d["df"].sort_index() == oracle.df.sort_index()).all()
    assert (d["cf"].sort_index() == oracle.cf.sort_index()).all()


def test_fidelity_sha256(built, spark):
    """input_hint invariant: per-row content sha256 equality vs source."""
    prepared, postings, _, _, _ = built
    import hashlib

    pdf = prepared.select("doc_id", "content", "content_sha256").toPandas()
    recomputed = pdf["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest()
    )
    assert (recomputed == pdf["content_sha256"]).all()
    # every indexed doc is a source doc
    indexed = postings.select("doc_id").distinct()
    missing = indexed.join(prepared, "doc_id", "left_anti").count()
    assert missing == 0


@pytest.mark.parametrize("query,lang,conj", QUERIES)
def test_bm25_topk_rank_identical(built, query, lang, conj):
    _, postings, dictionary, stats, oracle = built
    k = 10
    eng = bm25_search(
        postings, dictionary, stats["n_docs"], stats["avgdl"], query,
        k=k, lang=lang, conjunctive=conj,
    ).toPandas()
    orc = oracle.bm25_topk(query, k=k, lang=lang, conjunctive=conj)
    assert eng["doc_id"].tolist() == orc["doc_id"].tolist()
    assert np.allclose(
        eng["score"].to_numpy(dtype=float),
        orc["score"].to_numpy(dtype=float),
        rtol=1e-9, atol=1e-12,
    )


def test_golden_token_findable(built):
    """Every doc is findable by its golden rare token (analog of the
    'Foobarium' assertion, reference tests/test_lib.py:43-47)."""
    prepared, postings, dictionary, stats, _ = built
    row = prepared.where(F.col("path").contains("file7.")).select("doc_id").collect()
    assert len(row) == 1
    eng = bm25_search(
        postings, dictionary, stats["n_docs"], stats["avgdl"], "golden000007x"
    ).toPandas()
    assert eng["doc_id"].tolist() == [row[0]["doc_id"]]
