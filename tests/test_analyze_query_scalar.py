"""Round-6 optimization: scalar analyze_query fast path.

analyze_query no longer routes one query string through the pandas
batch analyzer; this battery pins the scalar chain identical to the
batch chain (the index-side source of truth) over every config axis:
mode (index/query/simple), stem on/off, lang present/absent, unicode
folding, length filtering, word-delimiter catenation, stopwords.
"""

from __future__ import annotations

from dataclasses import replace

import pandas as pd
import pytest

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    QUERY_CONFIG,
    SIMPLE_CONFIG,
    analyze_batch,
    analyze_query,
)


def batch_reference(query: str, lang, config) -> list[str]:
    """The pre-r6 analyze_query implementation, verbatim."""
    langs = pd.Series([lang]) if lang is not None else None
    toks = analyze_batch(pd.Series([query]), langs, config)
    return toks["term"].tolist()


QUERIES = [
    "",
    "   ",
    "spark join",
    "parseBuffer",
    "hash_byte MERGE_sort",
    "HTTPServer2 getHTTPResponseCode",
    "Köln naïve café über-Zürich",
    "the a and of to data value",
    "x" * 80 + " ok a1b2c3",
    "vector-stream.batch,scan;merge",
    "a b c d e f 1 2 3 42",
    "golden000777x __init__ --flag",
    "Ünïcodé \t\n mixed space",
    "CamelCaseWord snake_case_word UPPERCASE lowercase 123abc456",
]

CONFIGS = [
    ("query", QUERY_CONFIG),
    ("index", INDEX_CONFIG),
    ("simple", SIMPLE_CONFIG),
    ("query-stem", replace(QUERY_CONFIG, stem=True)),
    ("index-stem", replace(INDEX_CONFIG, stem=True)),
    ("query-nostop", replace(QUERY_CONFIG, remove_stopwords=False)),
    ("query-len", replace(QUERY_CONFIG, min_token_len=2,
                          max_token_len=8)),
]

LANGS = [None, "python", "PYTHON", "markdown", "nosuchlang", ""]


@pytest.mark.parametrize("tag,config", CONFIGS)
def test_scalar_matches_batch(tag, config):
    for q in QUERIES:
        for lang in LANGS:
            assert analyze_query(q, lang, config) == batch_reference(
                q, lang, config
            ), (tag, q, lang)


def test_scalar_matches_batch_fuzz():
    import random

    rng = random.Random(42)
    alphabet = (
        "abc XYZ 123 _-. éü "
        "data value return size the import def "
        "parseBuffer hash_byte A1 9z"
    ).split(" ")
    for trial in range(300):
        q = " ".join(rng.choice(alphabet) for _ in range(rng.randrange(6)))
        config = CONFIGS[trial % len(CONFIGS)][1]
        lang = LANGS[trial % len(LANGS)]
        assert analyze_query(q, lang, config) == batch_reference(
            q, lang, config
        ), (q, lang)
