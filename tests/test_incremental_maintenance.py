"""Incremental index maintenance: generational segments, tombstone
delete, compaction, build lock, bounded warm serving (SURVEY.md Q6/B2/B4;
VERDICT r1 next-round items #2, #4, #5).

Key invariant pinned here: a 1-doc update or delete leaves every
previously-written segment file BYTE-IDENTICAL (the build appends a new
generation + tombstones; it never rewrites old generations)."""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
import pytest

from ckanext_extractor_spark.api import (
    BuildInProgressError,
    ExtractorEngine,
)
from ckanext_extractor_spark.corpus import corpus_pdf

N_DOCS = 60


@pytest.fixture(scope="module")
def base_pdf():
    return corpus_pdf(N_DOCS)


def make_corpus(spark, pdf):
    return spark.createDataFrame(pdf)


def file_digests(root: str) -> dict[str, str]:
    """sha256 of every data file under gens/*/segments."""
    out = {}
    groot = os.path.join(root, "gens")
    if not os.path.isdir(groot):
        return out
    for dirpath, _, files in os.walk(groot):
        if "/segments" not in dirpath and not dirpath.endswith("segments"):
            continue
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = hashlib.sha256(
                    f.read()
                ).hexdigest()
    return out


def search_map(eng, q, **kw):
    return {d: round(s, 9) for d, s in eng.search(q, **kw)}


def test_update_and_delete_touch_no_old_segment_files(spark, tmp_path, base_pdf):
    eng = ExtractorEngine(
        spark, str(tmp_path / "idx"), n_buckets=8, salt_threshold=50
    )
    eng.DEAD_FRAC = 2.0  # disable lazy compaction: pin pure tombstone behavior
    corpus = make_corpus(spark, base_pdf)
    eng.extract(corpus, build_id="g1")
    before = file_digests(eng.root)
    assert before, "expected segment files after the initial build"

    # ---- 1-doc update: old generation files untouched ------------------
    pdf2 = base_pdf.copy()
    pdf2.loc[pdf2.index[3], "content"] = "updatedzzz fresh token stream"
    rep = eng.extract(make_corpus(spark, pdf2), build_id="g2")
    assert rep.status_counts.get("update") == 1
    after_update = file_digests(eng.root)
    for path, digest in before.items():
        assert after_update.get(path) == digest, f"{path} was rewritten"
    # new generation added
    assert len(after_update) > len(before)
    # search semantics: new token findable, old token gone
    assert len(eng.search("updatedzzz", k=5)) == 1
    assert eng.search("golden000003x", k=5) == []

    # ---- 1-doc delete: zero segment files touched -----------------------
    victim = eng.search("updatedzzz", k=1)[0][0]
    eng.delete([victim])
    after_delete = file_digests(eng.root)
    assert after_delete == after_update  # not one byte changed
    assert eng.search("updatedzzz", k=5) == []
    assert eng.show(victim)["status"] == "deleted"


def test_incremental_matches_fresh_rebuild(spark, tmp_path, base_pdf):
    """After updates + deletes, every query must rank identically to a
    from-scratch index over the same logical corpus (the oracle property
    of tombstones + generations)."""
    pdf2 = base_pdf.copy()
    pdf2.loc[pdf2.index[5], "content"] = "changed tokens mergeSort applyFn"
    pdf2.loc[pdf2.index[7], "content"] = "another changed doc parseBuffer"
    # incremental path
    inc = ExtractorEngine(
        spark, str(tmp_path / "inc"), n_buckets=8, salt_threshold=50
    )
    inc.extract(make_corpus(spark, base_pdf), build_id="b1")
    inc.extract(make_corpus(spark, pdf2), build_id="b2")
    del_doc = inc.search("golden000009x", k=1)[0][0]
    inc.delete([del_doc])
    # fresh path over the final logical corpus
    pdf3 = pdf2.drop(pdf2.index[9]).reset_index(drop=True)
    fresh = ExtractorEngine(
        spark, str(tmp_path / "fresh"), n_buckets=8, salt_threshold=50
    )
    fresh.extract(make_corpus(spark, pdf3), build_id="f1")

    assert inc.corpus_stats()["n_docs"] == fresh.corpus_stats()["n_docs"]
    assert abs(
        inc.corpus_stats()["avgdl"] - fresh.corpus_stats()["avgdl"]
    ) < 1e-9
    for q, conj in [
        ("data value", True),
        ("mergesort", True),
        ("vector stream cache", False),
        ("parsebuffer", True),
    ]:
        got = inc.search(q, k=10, conjunctive=conj)
        want = fresh.search(q, k=10, conjunctive=conj)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9, q


def test_compaction_reclaims_and_preserves_results(spark, tmp_path, base_pdf):
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxc"), n_buckets=8, salt_threshold=50
    )
    eng.extract(make_corpus(spark, base_pdf), build_id="c1")
    # churn: update the same 30 docs so gen c1 goes >25% dead
    pdf2 = base_pdf.copy()
    for i in range(30):
        pdf2.loc[pdf2.index[i], "content"] = f"churned{i:04d} data value"
    rep2 = eng.extract(make_corpus(spark, pdf2), build_id="c2")
    assert rep2.status_counts.get("update") == 30
    # compaction ran (c1 was half dead)
    assert rep2.compacted, "expected the dead-heavy generation to compact"
    before = search_map(eng, "data value")
    # a fresh engine over the same root (reload from meta) agrees
    eng2 = ExtractorEngine(spark, str(tmp_path / "idxc"))
    assert search_map(eng2, "data value") == before
    # tombstone table was GC'd down (nothing older than the compacted gen)
    dead = eng2._dead_docs()
    assert len(dead) == 0


def test_build_lock_matrix(spark, tmp_path, base_pdf):
    """status x force x in-flight (reference logic/test_action.py:79-247):
    a held lock refuses extract (in_progress report) and delete (raise),
    force does NOT bypass the lock, a stale lock is broken."""
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxl"), n_buckets=8, salt_threshold=50
    )
    corpus = make_corpus(spark, base_pdf.head(10))
    eng.extract(corpus, build_id="l1")

    # simulate an in-flight build from another worker
    assert eng._acquire_lock("other-build")
    rep = eng.extract(corpus, build_id="l2")
    assert rep.in_progress and rep.n_indexed == 0
    rep_force = eng.extract(corpus, force=True, build_id="l3")
    assert rep_force.in_progress  # force re-extracts docs, not locks
    with pytest.raises(BuildInProgressError):
        eng.delete([1])
    info = eng.in_progress()
    assert info["build_id"] == "other-build"

    # stale lock (holder crashed long ago) is broken and the build runs.
    # A crashed holder's lock is old in BOTH mtime and payload ts — the
    # breaker verifies the payload it actually took (rename-then-verify,
    # ADVICE r2), so backdate both.
    old = time.time() - 3 * 3600
    import json as _json

    payload = _json.loads(open(eng._lock_path()).read())
    payload["ts"] = old
    open(eng._lock_path(), "w").write(_json.dumps(payload))
    os.utime(eng._lock_path(), (old, old))
    rep4 = eng.extract(corpus, build_id="l4")
    assert not rep4.in_progress
    # lock released after a successful build
    assert eng.in_progress() is None


def test_capped_warm_serving_identical_results(spark, tmp_path, base_pdf):
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxw"), n_buckets=8, salt_threshold=50
    )
    eng.extract(make_corpus(spark, base_pdf), build_id="w1")
    cold = search_map(eng, "data value")
    # force lazy serving: raw preload budget below the segment size
    eng.RAW_PRELOAD_BYTES = 1
    eng.warm(max_cache_bytes=1 << 20)
    assert eng._lazy_serve
    # this test pins the DECODE path — bypass the query-result memo so
    # every search actually exercises lazy fetch + decoded-LRU
    eng._query_cache.clear()
    first = search_map(eng, "data value")  # cache miss -> cold fetch
    eng._query_cache.clear()
    second = search_map(eng, "data value")  # decoded-LRU hit
    assert first == cold and second == cold
    assert "data" in eng._decoded_cache and "value" in eng._decoded_cache
    # LRU eviction under a tiny decoded budget still serves correctly
    eng.warm(max_cache_bytes=1)
    eng.RAW_PRELOAD_BYTES = 1
    for q in ("data value", "vector stream", "hash byte"):
        eng._query_cache.clear()
        assert search_map(eng, q) == {
            d: round(s, 9) for d, s in eng.search(q, k=10)
        }
    assert len(eng._decoded_cache) <= 2  # budget of 1 byte keeps ~1 entry


def test_metadata_sidecar_end_to_end(spark, tmp_path):
    """EAV metadata carried corpus -> doc_stats -> show(), with key
    cleaning, multivalue collapse, and indexed_fields filtering applied
    (reference ResourceMetadatum + clean_metadatum, model.py:117-127,
    lib.py:55-65, tasks.py:82-95; golden pair test_lib.py:50-51)."""
    rows = [
        (
            "r/a", "p0", "c0", "python", "alpha beta content",
            {"Content_Type": ["text/plain"],
             "Author_Name": ["Ada", "Grace"],
             "X_Secret": ["drop-me"]},
        ),
        ("r/a", "p1", "c1", "python", "gamma delta content", {}),
    ]
    corpus = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, metadata map<string, array<string>>",
    )
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxm"), n_buckets=8,
        indexed_fields=("content-*", "author-*"),
    )
    eng.extract(corpus, build_id="m1")
    ds = spark.read.parquet(eng._p("doc_stats")).collect()
    by_path = {r["path"]: r for r in ds}
    info = eng.show(by_path["p0"]["doc_id"])
    assert info["metadata"] == {
        "content-type": "text/plain",
        "author-name": "Ada, Grace",  # multivalue collapsed (tasks.py:89-95)
    }  # keys lowercased + '_'->'-'; x-secret filtered by indexed_fields
    assert info["status"] == "indexed"
    assert eng.show(by_path["p1"]["doc_id"])["metadata"] == {}
    # Q5 per-field search: boolean AND within one metadata key
    d0 = by_path["p0"]["doc_id"]
    assert eng.search_field("author-name", "ada") == [d0]
    assert eng.search_field("author-name", "Ada Grace") == [d0]  # AND
    assert eng.search_field("author-name", "missing") == []
    assert eng.search_field("content-type", "plain text") == [d0]
    # filtered-out key is not searchable (purged like the reference)
    assert eng.search_field("x-secret", "drop") == []
    # field search survives delete purge
    eng.delete([d0])
    assert eng.search_field("author-name", "ada") == []


def test_deleted_docs_filtered_in_slow_and_distributed_paths(
    spark, tmp_path, base_pdf
):
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxs"), n_buckets=8, salt_threshold=50
    )
    eng.extract(make_corpus(spark, base_pdf.head(20)), build_id="s1")
    victim = eng.search("golden000002x", k=1)[0][0]
    eng.delete([victim])
    # slow DataFrame path consults tombstones via the live-postings view
    assert eng.search("golden000002x", k=5, mode="slow") == []
    got = eng.search("data value", k=10, mode="slow")
    want = eng.search("data value", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
