"""Atomic metadata updates (Solr atomic update set/remove) — sidecar-only
rewrites: doc_stats map + field_postings + field_norms change for the
affected docs; content, postings, and segments are untouched.

Reference analog: the reference re-submits the whole doc to Solr to
change one metadata field (tasks.py:99-104); here a field update never
re-extracts."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.analysis.tokenizer import SIMPLE_CONFIG
from ckanext_extractor_spark.api import (
    ExtractorEngine,
    ValidationError,
)
from ckanext_extractor_spark.operators.fields import build_field_norms

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta spark",
     {"Group": ["g1"], "Size": ["5"]}),
    ("r/a", "p1", "c1", "markdown", "alpha spark join",
     {"Group": ["g1"], "Size": ["15"]}),
    ("r/a", "p2", "c2", "markdown", "spark stream",
     {"Group": ["g2"]}),
    ("r/a", "p3", "c3", "markdown", "plain text", None),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = ExtractorEngine(
        spark, str(tmp_path / "upd"), n_buckets=4, salt_threshold=50,
        analyzer=SIMPLE_CONFIG, indexed_fields=("group", "size", "tag*"),
    )
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="u0")
    return eng


def _ids(eng):
    return {r["path"]: int(r["doc_id"])
            for r in eng.spark.read.parquet(eng._p("doc_stats"))
            .select("path", "doc_id").collect()}


def _norms_invariant(eng):
    """field_norms must equal the norms derived from field_postings."""
    fp = eng.spark.read.parquet(eng._p("field_postings"))
    fn = eng.spark.read.parquet(eng._p("field_norms"))
    derived = {(r["doc_id"], r["field"]): r["dl"]
               for r in build_field_norms(fp).collect()}
    stored = {(r["doc_id"], r["field"]): r["dl"] for r in fn.collect()}
    assert stored == derived


def test_set_updates_map_and_field_search(engine):
    ids = _ids(engine)
    engine.update_metadata({ids["p0"]: {"Group": "g9 special"}})
    assert engine.show(ids["p0"])["metadata"]["group"] == "g9 special"
    # field search sees the new tokens; old token gone for p0
    assert engine.search_field("group", "special") == [ids["p0"]]
    assert ids["p0"] not in engine.search_field("group", "g1")
    # other docs untouched
    assert engine.show(ids["p1"])["metadata"]["group"] == "g1"
    _norms_invariant(engine)


def test_remove_field(engine):
    ids = _ids(engine)
    engine.update_metadata({ids["p1"]: {"Size": None}})
    assert "size" not in engine.show(ids["p1"])["metadata"]
    assert engine.show(ids["p1"])["metadata"]["group"] == "g1"
    assert ids["p1"] not in engine.search_field("size", "15")
    _norms_invariant(engine)


def test_set_new_field_on_doc_without_metadata(engine):
    ids = _ids(engine)
    engine.update_metadata({ids["p3"]: {"Tag_One": ["x", "y"]}})
    # key cleaned, multivalue ', '-collapsed (extract parity)
    assert engine.show(ids["p3"])["metadata"] == {"tag-one": "x, y"}
    assert engine.search_field("tag-one", "y") == [ids["p3"]]
    _norms_invariant(engine)


def test_body_index_untouched(engine):
    ids = _ids(engine)
    before = engine.search("spark", k=10)

    def seg_listing():
        return sorted(
            (p, engine.fs.mtime(engine._gen_segments_path(g) + "/" + p))
            for g in engine._gens
            for p in engine.fs.listdir(engine._gen_segments_path(g))
        )

    seg_files = seg_listing()
    engine.update_metadata({ids["p0"]: {"Group": "changed"}})
    assert engine.search("spark", k=10) == before
    assert seg_listing() == seg_files


def test_dismax_sees_updated_field(engine):
    ids = _ids(engine)
    engine.update_metadata({ids["p2"]: {"Group": "unique wording"}})
    hits = engine.dismax_search("unique", {"group": 1.0}, k=10)
    assert [d for d, _ in hits] == [ids["p2"]]
    _norms_invariant(engine)


def test_update_survives_incremental_extract(engine, spark):
    ids = _ids(engine)
    engine.update_metadata({ids["p0"]: {"Group": "kept"}})
    # incremental extract with one changed doc (new content for p1)
    docs2 = [d if d[1] != "p1" else
             ("r/a", "p1", "c1x", "markdown", "alpha spark join extra",
              {"Group": ["g1"], "Size": ["15"]})
             for d in DOCS]
    engine.extract(spark.createDataFrame(docs2, SCHEMA), build_id="u1")
    # unchanged docs keep their updated metadata
    assert engine.show(ids["p0"])["metadata"]["group"] == "kept"
    _norms_invariant(engine)


def test_update_then_delete(engine):
    ids = _ids(engine)
    engine.update_metadata({ids["p0"]: {"Group": "doomed"}})
    engine.delete([ids["p0"]])
    assert engine.search_field("group", "doomed") == []
    _norms_invariant(engine)


def test_validation_unknown_doc_and_atomicity(engine):
    ids = _ids(engine)
    before = engine.show(ids["p0"])["metadata"]
    with pytest.raises(ValidationError):
        engine.update_metadata({
            ids["p0"]: {"Group": "half"},
            10**9: {"Group": "x"},
        })
    # atomic: the valid half did NOT publish
    assert engine.show(ids["p0"])["metadata"] == before


def test_validation_deleted_doc(engine):
    ids = _ids(engine)
    engine.delete([ids["p2"]])
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p2"]: {"Group": "x"}})


def test_validation_shapes(engine):
    ids = _ids(engine)
    with pytest.raises(ValidationError):
        engine.update_metadata({})
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p0"]: {}})
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p0"]: {"": "x"}})
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p0"]: {"Group": 7}})
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p0"]: {"Group": ["a", 3]}})
    with pytest.raises(ValidationError):
        engine.update_metadata({"p0": {"Group": "x"}})
    # field outside indexed_fields patterns rejected (Solr: not in schema)
    with pytest.raises(ValidationError):
        engine.update_metadata({ids["p0"]: {"other": "x"}})
    with pytest.raises(ValidationError):
        engine.update_metadata_df(None, None)


def test_update_metadata_df_bulk(engine, spark):
    ids = _ids(engine)
    set_df = spark.createDataFrame(
        [(ids["p0"], "group", "bulk0"), (ids["p1"], "group", "bulk1")],
        "doc_id long, field string, value string",
    )
    remove_df = spark.createDataFrame(
        [(ids["p1"], "size")], "doc_id long, field string"
    )
    engine.update_metadata_df(set_df, remove_df)
    assert engine.show(ids["p0"])["metadata"]["group"] == "bulk0"
    assert engine.show(ids["p1"])["metadata"] == {"group": "bulk1"}
    _norms_invariant(engine)
