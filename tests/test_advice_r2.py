"""Regression tests for the round-2 ADVICE findings:

* ``file:``-scheme index roots must address the same on-disk tree for
  Spark table IO and the engine's own os/shutil bookkeeping (fsio.py);
* stale-lock takeover must not delete another writer's FRESH lock
  (rename-then-verify break, api.py _acquire_lock);
* snippets() must window the hits the caller actually computed, not
  re-search with default semantics (CLI --phrase/--or --snippets);
* the lazy-serving raw segment-row cache is byte-bounded (LRU), like the
  decoded cache — a long-tail workload cannot grow it without bound.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.corpus import corpus_pdf
from ckanext_extractor_spark.fsio import FsIO, _lp


def make_corpus(spark, pdf):
    return spark.createDataFrame(pdf)


def test_lp_strips_file_scheme():
    assert _lp("file:///a/b c") == "/a/b c"
    assert _lp("file:/a/b") == "/a/b"
    assert _lp("/a/b") == "/a/b"
    assert _lp("hdfs://nn/a") == "hdfs://nn/a"  # not local, untouched


def test_fsio_file_scheme_root(spark, tmp_path):
    """A file:// root must not grow a literal './file:/...' tree and must
    see Spark-written tables through fs.exists (ADVICE r2, fsio.py:39)."""
    real = tmp_path / "fidx"
    root = "file://" + str(real)
    fs = FsIO(spark, root)
    assert fs.is_local
    sub = root + "/meta_dir"
    fs.makedirs(sub)
    assert (real / "meta_dir").is_dir()
    assert not os.path.exists("file:"), "literal file: dir created in cwd"
    fs.write_text_atomic(sub + "/x.json", "{}")
    assert (real / "meta_dir" / "x.json").read_text() == "{}"
    assert fs.exists(sub + "/x.json")
    # Spark writes through the URI; fsio must see the same files
    spark.range(3).write.mode("overwrite").parquet(root + "/tbl")
    assert fs.exists(root + "/tbl")
    assert fs.has_part_files(root + "/tbl")
    fs.rename(root + "/tbl", root + "/tbl2")
    assert (real / "tbl2").is_dir() and not (real / "tbl").exists()
    fs.rmtree(root + "/tbl2")
    assert not (real / "tbl2").exists()


def test_engine_on_file_scheme_root(spark, tmp_path):
    """End-to-end: build + search with a file:// index root."""
    root = "file://" + str(tmp_path / "fidx2")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    rep = eng.extract(make_corpus(spark, corpus_pdf(20)), build_id="f1")
    assert rep.n_indexed == 20
    hits = eng.search("data value", k=5)
    assert hits
    # reload from meta through the same URI
    eng2 = ExtractorEngine(spark, root)
    assert eng2.search("data value", k=5) == hits


def test_stale_lock_with_fresh_payload_not_stolen(spark, tmp_path):
    """The break path re-reads the payload it actually took: if the lock
    turns out FRESH (another writer re-locked between the age check and
    the break), it is restored and the acquire backs off (ADVICE r2,
    api.py:280)."""
    eng = ExtractorEngine(spark, str(tmp_path / "idxs"), n_buckets=8)
    path = eng._lock_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"build_id": "fresh-holder", "pid": 1, "ts": time.time()}
    assert eng.fs.create_excl(path, json.dumps(payload))
    # mtime says stale, payload says fresh — models the re-lock race
    old = time.time() - 3 * 3600
    os.utime(path, (old, old))
    assert not eng._acquire_lock("thief")
    restored = eng.fs.read_json(path)
    assert restored and restored["build_id"] == "fresh-holder"


def test_stale_lock_genuinely_stale_is_broken(spark, tmp_path):
    eng = ExtractorEngine(spark, str(tmp_path / "idxs2"), n_buckets=8)
    path = eng._lock_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"build_id": "crashed", "pid": 1, "ts": time.time() - 3 * 3600}
    assert eng.fs.create_excl(path, json.dumps(payload))
    old = time.time() - 3 * 3600
    os.utime(path, (old, old))
    assert eng._acquire_lock("successor")
    assert eng.in_progress()["build_id"] == "successor"
    eng._release_lock()


def test_snippets_respects_given_hits(spark, tmp_path):
    pdf = corpus_pdf(40)
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxsn"), n_buckets=8, salt_threshold=50,
        store_content=True,
    )
    eng.extract(make_corpus(spark, pdf), build_id="s1")
    or_hits = eng.search("data value", k=5, conjunctive=False)
    snips = eng.snippets("data value", k=5, hits=or_hits)
    assert [(d, s) for d, s, _ in snips] == or_hits
    # phrase flag routes through phrase_search when hits not given
    ph = eng.phrase_search("data value", k=5)
    snips_ph = eng.snippets("data value", k=5, phrase=True)
    assert [(d, s) for d, s, _ in snips_ph] == ph


def test_lazy_raw_cache_is_byte_bounded(spark, tmp_path):
    eng = ExtractorEngine(
        spark, str(tmp_path / "idxrc"), n_buckets=8, salt_threshold=50
    )
    eng.extract(make_corpus(spark, corpus_pdf(60)), build_id="rc1")
    cold = eng.search("data value", k=5)
    eng.RAW_PRELOAD_BYTES = 1  # force lazy serving
    eng.warm(max_cache_bytes=1 << 20)
    assert eng._lazy_serve
    # tiny raw budget: every insert must evict; cache may hold at most the
    # most recent term's rows (the >1-entry guard)
    eng._raw_budget = 1
    probes = ["data", "value", "alpha", "beta", "gamma", "delta", "epsilon"]
    for t in probes:
        eng._query_cache.clear()
        eng._decoded_cache.clear()
        eng._decoded_bytes = 0
        eng.search(t, k=3)
    assert len(eng._rows_cache) <= 2
    assert eng._raw_bytes <= 2 * max(
        eng._raw_rows_bytes(r) for r in eng._rows_cache.values()
    ) if eng._rows_cache else True
    # results identical to cold through all that eviction
    eng._query_cache.clear()
    assert eng.search("data value", k=5) == cold
