"""Porter stemmer (optional T4 stage) — canonical pairs from Porter
(1980) run through the FULL pipeline (later steps keep stripping, e.g.
electriciti -> electric (step 3) -> electr (step 4), matching the
standard implementations), plus analyzer/engine integration."""

from __future__ import annotations

import pandas as pd
import pytest

from ckanext_extractor_spark.analysis.stem import porter_stem

CANONICAL = {
    # step 1
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3 (+ step 4 continuation)
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas", "roll": "roll",
    # multi-step words
    "generalizations": "gener", "oscillators": "oscil",
}


@pytest.mark.parametrize("word,want", sorted(CANONICAL.items()))
def test_porter_canonical(word, want):
    assert porter_stem(word) == want


def test_porter_leaves_nonwords_alone():
    assert porter_stem("src13") == "src13"  # digits: not stemmed
    assert porter_stem("ab") == "ab"  # too short
    assert porter_stem("café") == "café"  # non-ascii untouched


def test_analyzer_stem_flag():
    from ckanext_extractor_spark.analysis.tokenizer import (
        AnalyzerConfig,
        analyze_batch,
        analyze_query,
        query_config_for,
    )

    cfg = AnalyzerConfig(mode="index", stem=True)
    toks = analyze_batch(
        pd.Series(["running dogs relational"]), pd.Series(["markdown"]), cfg
    )
    assert toks["term"].tolist() == ["run", "dog", "relat"]
    # query config derived from the index config stems identically
    qcfg = query_config_for(cfg)
    assert qcfg.stem and qcfg.mode == "query"
    assert analyze_query("running relational", config=qcfg) == ["run", "relat"]
    # default contract unchanged: stem off
    off = analyze_batch(pd.Series(["running dogs"]), None, AnalyzerConfig())
    assert off["term"].tolist() == ["running", "dogs"]


def test_engine_stemmed_index_search(spark, tmp_path):
    """A stem=True index matches morphological variants both ways and
    persists the analyzer contract in index_meta (a reopened engine
    analyzes queries with the same chain)."""
    from ckanext_extractor_spark.analysis.tokenizer import AnalyzerConfig
    from ckanext_extractor_spark.api import ExtractorEngine

    corpus = spark.createDataFrame(
        [
            ("r", "p0", "c0", "markdown", "the runner was running fast"),
            ("r", "p1", "c1", "markdown", "relational databases joined"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    root = str(tmp_path / "stemidx")
    eng = ExtractorEngine(
        spark, root, analyzer=AnalyzerConfig(mode="index", stem=True),
        n_buckets=8,
    )
    eng.extract(corpus, build_id="s1")
    assert len(eng.search("runs", k=5)) == 1  # runs -> run matches running
    assert len(eng.search("relations join", k=5)) == 1
    # reopened engine restores the stem contract from index_meta
    eng2 = ExtractorEngine(spark, root)
    assert eng2.analyzer.stem is True
    assert len(eng2.search("runs", k=5)) == 1
