"""Training-pipeline ops: token-window chunking and deterministic
hash sampling/splitting (functions/chunking.py, functions/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from ckanext_extractor_spark.functions.chunking import chunk_documents
from ckanext_extractor_spark.functions.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g"),            # 7 tokens
        (1, "one two three"),            # 3 tokens
        (2, "   ...   "),                # 0 tokens
        (3, "x"),                        # 1 token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_with_overlap(docs):
    out = chunk_documents(docs, size=3, overlap=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # stride 2: starts 0,2,4,6 over 7 tokens
    assert got[(0, 0)] == (3, "a b c")
    assert got[(0, 1)] == (3, "c d e")
    assert got[(0, 2)] == (3, "e f g")
    assert got[(0, 3)] == (1, "g")
    assert got[(1, 0)] == (3, "one two three")
    assert got[(1, 1)] == (1, "three")
    assert got[(3, 0)] == (1, "x")
    # zero-token docs produce zero chunks (pinned)
    assert not any(d == 2 for d, _ in got)


def test_chunk_no_overlap_and_exact_fit(docs):
    out = chunk_documents(docs, size=7)
    got = {(r["doc_id"], r["chunk_id"]): r["n_tokens"]
           for r in out.collect()}
    assert got[(0, 0)] == 7
    assert (0, 1) not in got


@pytest.mark.parametrize("size,overlap", [
    (0, 0), (-1, 0), (3, 3), (3, 4), (3, -1), (True, 0), (3, True),
])
def test_chunk_validation(docs, size, overlap):
    with pytest.raises(ValueError):
        chunk_documents(docs, size=size, overlap=overlap)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, grp string",
    )


def _py_prefix(i, salt=""):
    return hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:4]


def test_hash_split_matches_reference_md5(ids):
    out = {r["doc_id"]: r["split"]
           for r in hash_split(ids, 0.25, salt="s").collect()}
    thr = format(int(round(0.25 * 65536)), "04x")
    for i in (0, 1, 7, 123, 1999):
        want = "test" if _py_prefix(i, "s") < thr else "train"
        assert out[i] == want
    frac = sum(1 for v in out.values() if v == "test") / len(out)
    assert 0.2 < frac < 0.3
    # deterministic across invocations
    again = {r["doc_id"]: r["split"]
             for r in hash_split(ids, 0.25, salt="s").collect()}
    assert again == out


def test_hash_split_salt_independence(ids):
    a = {r["doc_id"]: r["split"]
         for r in hash_split(ids, 0.5, salt="a").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(ids, 0.5, salt="b").collect()}
    assert a != b  # different salt, different draw


def test_hash_sample_subset_and_fraction(ids):
    kept = hash_sample(ids, 0.3, salt="x").collect()
    assert 0.25 < len(kept) / 2000 < 0.35
    all_ids = {r["doc_id"] for r in ids.collect()}
    assert {r["doc_id"] for r in kept} <= all_ids
    assert hash_sample(ids, 0.0).count() == 0
    assert hash_sample(ids, 1.0).count() == 2000


def test_stratified_mixing(ids):
    kept = stratified_hash_sample(
        ids, "grp", {"a": 1.0, "b": 0.0}
    ).collect()
    assert all(r["grp"] == "a" for r in kept)
    assert len(kept) == 1000
    half_b = stratified_hash_sample(
        ids, "grp", {"b": 0.5}, default_frac=0.0, salt="m"
    )
    n = half_b.count()
    assert 400 < n < 600
    # unlisted groups keep default_frac
    assert all(r["grp"] == "b" for r in half_b.collect())


@pytest.mark.parametrize("bad", [-0.1, 1.5, "x", True])
def test_sampling_validation(ids, bad):
    with pytest.raises(ValueError):
        hash_split(ids, bad)
    with pytest.raises(ValueError):
        hash_sample(ids, bad)
    with pytest.raises(ValueError):
        stratified_hash_sample(ids, "grp", {"a": bad})
    with pytest.raises(ValueError):
        stratified_hash_sample(ids, "grp", {})
