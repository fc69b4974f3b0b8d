"""Tokenizer goldens (SURVEY.md §5.2 item 1; analog of the reference's
golden-pair test test_clean_metadatum, tests/test_lib.py:50-51).

These pin the analysis contract: if any of these change, every BM25 score
and segment checksum changes with them.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    QUERY_CONFIG,
    AnalyzerConfig,
    analyze_batch,
    analyze_query,
    postings_for_batch,
)

INDEX_GOLDENS = [
    # (lang, input, expected index-mode tokens in order)
    (None, "camelCase", ["camel", "case", "camelcase"]),
    (None, "snake_case", ["snake", "case", "snakecase"]),
    # classic-WDF emission order: a run's parts, then its catenated form
    (None, "HTTPServer2", ["http", "server", "httpserver", "2"]),
    # catenation joins ADJACENT same-type runs only (catenateAll=0):
    # the digit breaks the alpha run, so no "utfdecode"
    (None, "utf8Decode", ["utf", "8", "decode"]),
    (None, "ALLCAPS", ["allcaps"]),
    (None, "wi-fi", ["wi", "fi", "wifi"]),
    (None, "Köln", ["koln"]),
    (None, "naïve café", ["naive", "cafe"]),
    (None, "3.14", ["3", "14", "314"]),
    (None, "a b  c", ["a", "b", "c"]),
    (None, "", []),
    (None, "___", []),
    ("python", "def foo return bar", ["foo", "bar"]),  # keywords stopped
    ("java", "public void fooBar", ["foo", "bar", "foobar"]),
    ("go", "func main range xs", ["main", "xs"]),
]

QUERY_GOLDENS = [
    ("camelCase", ["camel", "case"]),  # catenation OFF at query time
    ("snake_case", ["snake", "case"]),
    ("Köln", ["koln"]),
    ("data value", ["data", "value"]),
]


@pytest.mark.parametrize("lang,text,expected", INDEX_GOLDENS)
def test_index_tokens_golden(lang, text, expected):
    langs = pd.Series([lang]) if lang else None
    out = analyze_batch(pd.Series([text]), langs, INDEX_CONFIG)
    assert out["term"].tolist() == expected


@pytest.mark.parametrize("query,expected", QUERY_GOLDENS)
def test_query_tokens_golden(query, expected):
    assert analyze_query(query) == expected


POSITION_GOLDENS = [
    # classic-WDF parity: parts advance, catenated forms inject at
    # posInc=0 (stacked on their run's last part); a pure-punctuation
    # word still advances one position (accumulated posInc gap)
    ("mergeSort data", [(0, "merge"), (1, "sort"), (1, "mergesort"),
                        (2, "data")]),
    ("HTTPServer2 x", [(0, "http"), (1, "server"), (1, "httpserver"),
                       (2, "2"), (3, "x")]),
    ("alpha -- beta", [(0, "alpha"), (2, "beta")]),
    ("a 500-42 b", [(0, "a"), (1, "500"), (2, "42"), (2, "50042"),
                    (3, "b")]),
]


@pytest.mark.parametrize("text,expected", POSITION_GOLDENS)
def test_position_goldens(text, expected):
    out = analyze_batch(pd.Series([text]), None, INDEX_CONFIG)
    assert list(zip(out["pos"], out["term"])) == expected


def test_doc_len_discounts_overlaps():
    """BM25 norm parity (Lucene discountOverlaps=true): injected
    catenated tokens share a position and must not inflate doc_len."""
    p = postings_for_batch(pd.Series(["mergeSort data"]))
    assert len(p) == 4  # merge, sort, mergesort, data
    assert (p["doc_len"] == 3).all()  # 3 positions, not 4 tokens


def test_positions_have_stopword_gaps():
    out = analyze_batch(
        pd.Series(["def alpha return beta"]), pd.Series(["python"]), INDEX_CONFIG
    )
    # def(0) dropped, alpha(1), return(2) dropped, beta(3)
    assert list(zip(out["pos"], out["term"])) == [(1, "alpha"), (3, "beta")]


def _decode_positions(blob: bytes, tf: int) -> list[int]:
    import numpy as np

    from ckanext_extractor_spark.operators.codec import varbyte_decode

    gaps, _ = varbyte_decode(blob, 0, tf)
    return np.cumsum(gaps.astype(np.int64)).tolist()


def test_postings_aggregation_and_doc_len():
    p = postings_for_batch(
        pd.Series(["data data value", "def def def x"]),
        pd.Series(["markdown", "python"]),
    )
    d0 = p[p["idx"] == 0].set_index("term")
    assert d0.loc["data", "tf"] == 2
    assert _decode_positions(d0.loc["data", "positions"], 2) == [0, 1]
    assert d0.loc["value", "tf"] == 1
    assert (d0["doc_len"] == 3).all()
    d1 = p[p["idx"] == 1].set_index("term")
    assert list(d1.index) == ["x"]
    assert (d1["doc_len"] == 1).all()  # doc_len counts post-stop tokens


def test_stopwords_disabled_config():
    cfg = AnalyzerConfig(mode="index", remove_stopwords=False)
    out = analyze_batch(pd.Series(["def foo"]), pd.Series(["python"]), cfg)
    assert out["term"].tolist() == ["def", "foo"]


def test_batch_idx_addressing():
    out = analyze_batch(pd.Series(["alpha", "", "beta gamma"]))
    assert sorted(out["idx"].unique().tolist()) == [0, 2]


def test_query_mode_equals_index_mode_minus_catenation():
    text = "fooBar baz_qux plain"
    qi = analyze_batch(pd.Series([text]), config=INDEX_CONFIG)["term"].tolist()
    qq = analyze_batch(pd.Series([text]), config=QUERY_CONFIG)["term"].tolist()
    assert [t for t in qi if t not in ("foobar", "bazqux")] == qq
