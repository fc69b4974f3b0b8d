"""S2 normalization, F2 field filter, metadata key cleaning, F3 privacy
predicate, T6 query-time synonyms."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.corpus import corpus_pdf
from ckanext_extractor_spark.operators.build import (
    build_corpus_stats,
    build_dictionary,
    build_doc_stats,
    prepare_corpus,
    tokenize_postings,
)
from ckanext_extractor_spark.operators.normalize import (
    clean_metadata_keys,
    collapse_multivalues,
    filter_metadata_fields,
    normalize_content,
)
from ckanext_extractor_spark.operators.query import (
    bm25_search,
    bm25_search_synonyms,
)


def test_normalize_content(spark):
    df = spark.createDataFrame(
        [("﻿hello\x00 world\r\nnext",), ("clean text",)], "content string"
    )
    out = normalize_content(df).collect()
    assert out[0]["content"] == "hello world\nnext"
    assert out[0]["n_chars"] == len("hello world\nnext")
    assert out[1]["content"] == "clean text"


def test_metadata_key_cleaning_golden(spark):
    """Golden pairs from the reference's test_clean_metadatum
    (tests/test_lib.py:50-51): lowercase + underscore->dash."""
    df = spark.createDataFrame(
        [({"Foo_Bar": "x", "already-clean": "y"},)],
        "meta map<string,string>",
    )
    out = df.select(clean_metadata_keys(F.col("meta")).alias("m")).collect()[0]["m"]
    assert out == {"foo-bar": "x", "already-clean": "y"}


def test_multivalue_collapse(spark):
    """tasks.py:89-95 semantics: lists joined with ', '."""
    df = spark.createDataFrame(
        [({"authors": ["a", "b"], "title": ["only"]},)],
        "meta map<string,array<string>>",
    )
    out = df.select(collapse_multivalues(F.col("meta")).alias("m")).collect()[0]["m"]
    assert out == {"authors": "a, b", "title": "only"}


def test_field_filter_fnmatch(spark):
    """F2: indexed_fields patterns, case-insensitive with wildcards
    (config.py:101-105; test config indexed_fields='fulltext author')."""
    df = spark.createDataFrame(
        [({"fulltext": "x", "Author": "y", "secret": "z", "auth_time": "w"},)],
        "meta map<string,string>",
    )
    out = df.select(
        filter_metadata_fields(F.col("meta"), ["fulltext", "author"]).alias("m")
    ).collect()[0]["m"]
    assert out == {"fulltext": "x", "Author": "y"}
    out2 = df.select(
        filter_metadata_fields(F.col("meta"), ["auth*"]).alias("m")
    ).collect()[0]["m"]
    assert set(out2) == {"Author", "auth_time"}


def test_privacy_predicate_skips_and_purges(spark, tmp_path):
    """F3: docs matching ignore_where are never indexed; flipping a doc to
    private purges it (tasks.py:61-68, plugin.py:101-107)."""
    pdf = corpus_pdf(20)
    pdf["private"] = [i % 5 == 0 for i in range(20)]
    eng = ExtractorEngine(
        spark, str(tmp_path / "idx"), n_buckets=8, salt_threshold=50,
        ignore_where="private = true",
    )
    rep = eng.extract(spark.createDataFrame(pdf))
    assert rep.status_counts.get("ignored") == 4
    assert eng.list_indexed().count() == 16
    assert eng.search("golden000000x", k=5) == []  # private doc unfindable
    assert len(eng.search("golden000001x", k=5)) == 1

    # flip doc 1 private -> purged on re-extract
    pdf2 = pdf.copy()
    pdf2.loc[1, "private"] = True
    rep2 = eng.extract(spark.createDataFrame(pdf2))
    assert rep2.status_counts.get("ignored") == 5
    assert eng.search("golden000001x", k=5) == []


@pytest.fixture(scope="module")
def small_index(spark):
    prepared = prepare_corpus(spark.createDataFrame(corpus_pdf(120))).cache()
    postings = tokenize_postings(prepared).cache()
    dictionary = build_dictionary(postings, 8).cache()
    stats = build_corpus_stats(build_doc_stats(prepared, postings)).collect()[0]
    return postings, dictionary, stats


def test_synonym_expansion_widens_recall(spark, small_index):
    postings, dictionary, stats = small_index
    plain = bm25_search(
        postings, dictionary, stats["n_docs"], stats["avgdl"],
        "vector", k=200,
    ).toPandas()
    syn = bm25_search_synonyms(
        postings, dictionary, stats["n_docs"], stats["avgdl"],
        "vector", {"vector": ["tensor", "stream"]}, k=200,
    ).toPandas()
    # every plain match still matches; docs matching only 'stream' join in
    assert set(plain["doc_id"]) <= set(syn["doc_id"])
    assert len(syn) > len(plain)


def test_synonym_conjunctive_group_semantics(spark, small_index):
    postings, dictionary, stats = small_index
    # two groups: {vector, stream} AND {cache}; a doc with (stream, cache)
    # but no 'vector' must match
    out = bm25_search_synonyms(
        postings, dictionary, stats["n_docs"], stats["avgdl"],
        "vector cache", {"vector": ["stream"]}, k=500,
    ).toPandas()
    plain_and = bm25_search(
        postings, dictionary, stats["n_docs"], stats["avgdl"],
        "vector cache", k=500,
    ).toPandas()
    assert set(plain_and["doc_id"]) <= set(out["doc_id"])
    # verify group scoring: score = sum of member contributions
    has_both = postings.where(
        F.col("term").isin(["stream", "cache"])
    ).groupBy("doc_id").count().where("count = 2")
    assert out["n_matched"].eq(2).all()


def test_synonym_no_op_matches_plain(spark, small_index):
    postings, dictionary, stats = small_index
    a = bm25_search(
        postings, dictionary, stats["n_docs"], stats["avgdl"], "data value", k=10
    ).toPandas()
    b = bm25_search_synonyms(
        postings, dictionary, stats["n_docs"], stats["avgdl"],
        "data value", {}, k=10,
    ).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["score"], b["score"], rtol=1e-9)
