"""Phonetic matching — Solr PhoneticFilterFactory (encoder=Soundex)
re-expressed as a query-time MultiTermQuery rewrite: classic-Soundex
dictionary expansion (StringStartsWith-pruned, cluster-side filter) +
scoring-boolean retrieval. The SQL formulation of the same algorithm is
hash-gated by oracle entry q89."""

from __future__ import annotations

import json

import pytest

from ckanext_extractor_spark.analysis.phonetic import soundex
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

DOCS = [
    ("r/p", "p0", "c0", "markdown", "smith forge hammer", {}),
    ("r/p", "p1", "c1", "markdown", "smyth cutlery", {}),
    ("r/p", "p2", "c2", "markdown", "smote the anvil smith", {}),
    ("r/p", "p3", "c3", "markdown", "spark plug", {}),
    ("r/p", "p4", "c4", "markdown", "unrelated words here", {}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("phon"))
    eng = ExtractorEngine(spark, root, n_buckets=4, salt_threshold=50)
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="ph")
    return eng


def test_soundex_golden_vectors():
    # the classic published vectors, incl. the H/W rule and run collapse
    for w, want in [
        ("Robert", "R163"), ("Rupert", "R163"),
        ("Ashcraft", "A261"), ("Ashcroft", "A261"),  # H transparent
        ("Tymczak", "T522"),   # vowel-separated same code coded twice
        ("Pfister", "P236"),   # first-letter run collapses
        ("Honeyman", "H555"), ("Bob", "B100"),
        ("smith", "S530"), ("smyth", "S530"), ("smote", "S530"),
        ("spark", "S162"),
    ]:
        assert soundex(w) == want, w
    assert soundex("123") == ""
    assert soundex("x1y2") == soundex("xy")


def test_expand_phonetic_finds_sound_alikes(engine):
    got = engine.expand_phonetic("smith")
    assert got == ["smith", "smote", "smyth"]
    # no sound-alikes beyond itself
    assert engine.expand_phonetic("spark") == ["spark"]


def test_phonetic_search_equals_disjunctive_over_expansions(engine):
    hits = engine.phonetic_search("smith", k=10)
    want = engine.search("smith smyth smote", k=10, conjunctive=False,
                         mode="exact")
    assert hits == want
    assert len(hits) == 3  # p0, p1, p2


def test_phonetic_warm_cold_parity(engine):
    cold = engine.phonetic_search("smith", k=10)
    engine.warm()
    try:
        assert engine.expand_phonetic("smith") == ["smith", "smote",
                                                   "smyth"]
        assert engine.phonetic_search("smith", k=10) == cold
    finally:
        engine.cool()


def test_phonetic_validation(engine):
    for bad in ("", "  ", "two words", "123", 7):
        with pytest.raises(ValidationError):
            engine.expand_phonetic(bad)
    with pytest.raises(ValidationError):
        engine.phonetic_search("smith", k=0)
    # cap: smith expands to 3 terms
    with pytest.raises(ValidationError):
        engine.expand_phonetic("smith", max_expansions=2)


def test_cli_phonetic(engine, capsys):
    from ckanext_extractor_spark.cli.main import main

    assert main(["query", "--index", engine.root, "--q", "smyth",
                 "--phonetic", "--buckets", "4"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3


def test_soundex_col_matches_python(spark):
    """The Catalyst soundex (r6: replaced the cold-path python UDF) must
    equal the python reference on every term shape the dictionary can
    hold: goldens, unicode, digits-only, empty, h/w clusters, runs."""
    from ckanext_extractor_spark.analysis.phonetic import soundex_col

    words = [
        "smith", "smyth", "smote", "ashcraft", "ashcroft", "pfister",
        "tymczak", "robert", "rupert", "honeyman", "wu", "h", "w",
        "", "123", "a1b2", "naïve", "café", "Zürich", "hello_world",
        "xxxxxx", "aeiou", "bfpv", "hwhwhw", "s2s", "o'brien",
    ]
    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_éü"
    words += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 12)))
        for _ in range(200)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["sx"]
        for r in df.select(
            "term", soundex_col(F.col("term")).alias("sx")
        ).collect()
    }
    for w in words:
        assert got[w] == soundex(w), w
