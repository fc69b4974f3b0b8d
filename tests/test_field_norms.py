"""Build-time per-field norms (VERDICT r3 #6).

The engine persists a ``field_norms`` table — (doc_id, field, dl), the
per-(doc, field) token length Lucene writes as norms at flush — next to
``field_postings``, maintained with the same kept/dropped incremental
discipline, so dismax stops re-aggregating the whole field table per
query. Reference analog: Solr keeps per-field norms inside the same
index the dynamic ``ckanext-extractor_{id}_{key}`` fields live in
(plugin.py:40,140; schema.xml:161)."""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.operators import fields as fields_mod
from ckanext_extractor_spark.operators.fields import (
    build_field_norms,
    build_field_postings,
    dismax_search_fields,
)

DOCS = [
    ("r/a", "p0", "c0", "markdown", "alpha beta",
     {"Title": ["spark streaming guide"], "Tags": ["spark", "guide"]}),
    ("r/a", "p1", "c1", "markdown", "beta gamma",
     {"Title": ["joins in spark"], "Tags": ["joins"]}),
    ("r/a", "p2", "c2", "markdown", "gamma delta",
     {"Title": ["guide to ducks"], "Tags": ["ducks", "guide", "guide"]}),
    ("r/a", "p3", "c3", "markdown", "delta alpha",
     {"Title": ["spark spark spark"], "Tags": ["misc"]}),
]

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, metadata map<string, array<string>>"
)

QF = {"title": 2.0, "tags": 1.0}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fnorms"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags"))
    eng.extract(spark.createDataFrame(DOCS, SCHEMA), build_id="fn")
    return eng


def _norms_invariant(eng):
    """field_norms must equal the aggregate of field_postings exactly."""
    fp = eng.spark.read.parquet(eng._p("field_postings"))
    fn = eng.spark.read.parquet(eng._p("field_norms"))
    want = {(r["doc_id"], r["field"]): r["dl"]
            for r in build_field_norms(fp).collect()}
    got = {(r["doc_id"], r["field"]): r["dl"] for r in fn.collect()}
    assert got == want


def test_extract_writes_norms_matching_postings(engine):
    _norms_invariant(engine)


def test_dismax_norms_path_matches_query_time_aggregate(spark, engine):
    fp = spark.read.parquet(engine._p("field_postings"))
    fn = spark.read.parquet(engine._p("field_norms"))
    with_norms = dismax_search_fields(
        fp, "spark guide", QF, k=10, tie=0.3, norms=fn
    ).collect()
    without = dismax_search_fields(
        fp, "spark guide", QF, k=10, tie=0.3
    ).collect()
    assert [(r["doc_id"], round(r["score"], 10)) for r in with_norms] == \
        [(r["doc_id"], round(r["score"], 10)) for r in without]
    assert with_norms  # the query actually matches


def test_engine_dismax_uses_persisted_norms(engine, monkeypatch):
    """The engine must hand the persisted norms table to the operator —
    and must not fall back to the doc-scale aggregate when it exists."""
    seen = {}
    real = fields_mod.dismax_search_fields

    def spy(fp, query, qf, **kw):
        seen["norms"] = kw.get("norms")
        return real(fp, query, qf, **kw)

    # the engine imports the symbol function-locally from the module
    monkeypatch.setattr(fields_mod, "dismax_search_fields", spy)
    hits = engine.dismax_search("spark guide", QF, k=10, tie=0.3)
    assert hits
    assert seen["norms"] is not None
    assert sorted(seen["norms"].columns) == ["dl", "doc_id", "field"]


def test_incremental_extract_and_delete_keep_norms_consistent(
    spark, tmp_path
):
    root = str(tmp_path / "fn-incr")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags"))
    eng.extract(spark.createDataFrame(DOCS[:2], SCHEMA), build_id="b1")
    _norms_invariant(eng)
    # second batch: one changed doc (new commit) + two new docs
    changed = [("r/a", "p1", "c1x", "markdown", "beta gamma",
                {"Title": ["joins rewritten"], "Tags": ["joins", "new"]})]
    eng.extract(spark.createDataFrame(changed + DOCS[2:], SCHEMA),
                build_id="b2")
    _norms_invariant(eng)
    ids = {r["path"]: r["doc_id"]
           for r in spark.read.parquet(eng._p("doc_stats"))
           .select("path", "doc_id").collect()}
    eng.delete([ids["p0"]])
    _norms_invariant(eng)
    fn = spark.read.parquet(eng._p("field_norms"))
    assert fn.where(fn.doc_id == ids["p0"]).count() == 0


def test_pre_norms_store_upgrades_on_next_extract(spark, tmp_path):
    """A store built before field_norms existed (simulated by removing
    the table) serves dismax via the fallback aggregate, and the next
    incremental extract backfills norms for ALL docs."""
    import shutil

    root = str(tmp_path / "fn-up")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          indexed_fields=("title", "tags"))
    eng.extract(spark.createDataFrame(DOCS[:3], SCHEMA), build_id="b1")
    shutil.rmtree(eng._p("field_norms"))
    hits = eng.dismax_search("spark guide", QF, k=10, tie=0.3)
    assert hits  # fallback path still serves
    eng.extract(spark.createDataFrame(DOCS[3:], SCHEMA), build_id="b2")
    _norms_invariant(eng)
    fn = spark.read.parquet(eng._p("field_norms"))
    # old docs' norms were backfilled, not just the new batch's
    assert fn.select("doc_id").distinct().count() == 4


def test_build_field_norms_counts_tokens(spark):
    prepared = spark.createDataFrame(
        [(1, {"title": "a b a", "tags": "x"})],
        "doc_id long, metadata map<string,string>",
    )
    fp = build_field_postings(prepared)
    rows = {(r["field"], r["dl"])
            for r in build_field_norms(fp).collect()}
    assert rows == {("title", 3), ("tags", 1)}
