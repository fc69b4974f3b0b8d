"""Index-carried token->char offsets for snippets (Lucene
IndexOptions..AND_OFFSETS / term vectors with offsets, the
FastVectorHighlighter's input; reference analog: Solr's highlighter over
stored fields, travis/solr/ckan-2.8/schema.xml). The blob is a per-doc
delta+varbyte position->char map written in the same scan as doc_store;
snippet anchors become point varbyte decodes instead of query-time
re-analysis."""

from __future__ import annotations

import re

import pytest

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    SIMPLE_CONFIG,
    _expand_word,
)
from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.operators.offsets import (
    char_of_position_blob,
    position_offsets_blob,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "mergeSort data structure with camelCase identifiers",
    "snake_case_name and  double  spaces\ttabs\nnewlines",
    "a",
    "",
    "!!! ... ???",  # zero-width words only
    "x " * 200 + "needle haystack",
]


def _reference_map(text: str, analyzer) -> list[int]:
    """position -> char offset by the definition: each whitespace word
    consumes its analyzer width at its start char."""
    out: list[int] = []
    for m in re.finditer(r"\S+", text):
        out.extend([m.start()] * _expand_word(m.group(0), analyzer)[2])
    return out


@pytest.mark.parametrize("analyzer", [INDEX_CONFIG, SIMPLE_CONFIG])
def test_blob_roundtrip_matches_definition(analyzer):
    for text in TEXTS:
        blob = position_offsets_blob(text, analyzer)
        want = _reference_map(text, analyzer)
        for pos, char in enumerate(want):
            assert char_of_position_blob(blob, pos) == char, (text, pos)
        # past-the-end and negative -> None (caller falls back)
        assert char_of_position_blob(blob, len(want)) is None
        assert char_of_position_blob(blob, -1) is None
    assert position_offsets_blob("", INDEX_CONFIG) == b""
    assert char_of_position_blob(b"", 0) is None


DOCS = [
    ("r", "p0", "c0", "markdown", "the mergeSort routine sorts data fast"),
    ("r", "p1", "c1", "markdown",
     "filler " * 40 + "needle appears late in this doc"),
    ("r", "p2", "c2", "markdown", "needle early here"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


def _build(spark, root, **kw):
    eng = ExtractorEngine(
        spark, root, n_buckets=8, salt_threshold=50, store_content=True, **kw
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="off")
    return eng


def test_snippets_identical_with_and_without_offsets(spark, tmp_path):
    plain = _build(spark, str(tmp_path / "plain"))
    stored = _build(spark, str(tmp_path / "stored"), store_offsets=True)
    for q in ("needle", "sort data", "mergesort"):
        a = plain.snippets(q, k=10, width=20)
        b = stored.snippets(q, k=10, width=20)
        assert [(s, t) for _, s, t in a] == [(s, t) for _, s, t in b], q
    # the blob column really exists and is non-empty
    rows = spark.read.parquet(stored._p("doc_store")).collect()
    assert all(r["pos_offsets"] for r in rows)


def test_offsets_flag_persisted_on_reopen(spark, tmp_path):
    root = str(tmp_path / "meta")
    _build(spark, root, store_offsets=True)
    eng2 = ExtractorEngine(spark, root)
    assert eng2.store_offsets and eng2.store_content
    snips = eng2.snippets("needle", k=10, width=20)
    assert snips and all("needle" in s for _, _, s in snips)


def test_mixed_store_upgrade_falls_back(spark, tmp_path):
    """Docs stored before offsets were enabled keep null blobs
    (allowMissingColumns merge) and snippet anchors fall back to the
    analyzer re-scan — same output either way."""
    root = str(tmp_path / "mix")
    eng = _build(spark, root)  # no offsets
    eng.store_offsets = True  # upgrade in place; next batch writes blobs
    extra = [("r", "p3", "c3", "markdown", "pad " * 30 + "needle at the end")]
    eng.extract(spark.createDataFrame(extra, SCHEMA), build_id="off2")
    rows = {
        r["path"]: r
        for r in spark.read.parquet(eng._p("doc_stats"))
        .select("path", "doc_id").collect()
    }
    store = {
        int(r["doc_id"]): r["pos_offsets"]
        for r in spark.read.parquet(eng._p("doc_store")).collect()
    }
    assert store[int(rows["p3"]["doc_id"])]  # new doc has a blob
    assert store[int(rows["p1"]["doc_id"])] is None  # old doc: null
    snips = {d: s for d, _, s in eng.snippets("needle", k=10, width=20)}
    assert "needle" in snips[int(rows["p1"]["doc_id"])]
    assert "needle" in snips[int(rows["p3"]["doc_id"])]


def test_store_offsets_requires_store_content(spark, tmp_path):
    with pytest.raises(ValidationError):
        ExtractorEngine(spark, str(tmp_path / "bad"), store_offsets=True)


def test_offsets_with_stemmed_index(spark, tmp_path):
    """Stemming renames tokens without changing widths — the stored map
    still anchors the stemmed query term at the original surface word."""
    from dataclasses import replace

    eng = ExtractorEngine(
        spark, str(tmp_path / "stem"), n_buckets=8, salt_threshold=50,
        store_content=True, store_offsets=True,
        analyzer=replace(INDEX_CONFIG, stem=True),
    )
    docs = [("r", "p0", "c0", "markdown",
             "pad " * 25 + "running quickly through the forest")]
    eng.extract(spark.createDataFrame(docs, SCHEMA), build_id="st")
    snips = eng.snippets("running", k=5, width=15)
    assert snips and "running" in snips[0][2]
