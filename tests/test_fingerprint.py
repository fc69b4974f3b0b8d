"""Winnowing fingerprints (functions/fingerprint.py).

Pins: (1) the Catalyst winnowing selection equals a from-scratch python
reference (k-gram md5-60-bit hashes, w-window rightmost-min) on docs
covering normal / short-window / sub-k lengths; (2) the Schleimer
guarantee — a shared token run of length >= w + k - 1 yields a shared
fingerprint; (3) candidate pairs respect min_shared and the max_df
boilerplate guard; (4) validation.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from ckanext_extractor_spark.functions.fingerprint import (
    fingerprint_candidates,
    winnow_fingerprints,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) < k:
        return set()
    grams = [
        (i, _h60(" ".join(toks[i:i + k])))
        for i in range(len(toks) - k + 1)
    ]
    n = len(grams)
    out = set()
    if n < w:
        windows = [grams]
    else:
        windows = [grams[j:j + w] for j in range(n - w + 1)]
    for win in windows:
        best = win[0]
        for g in win[1:]:
            if g[1] <= best[1]:  # rightmost min
                best = g
        out.add(best)
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away"),
    (1, "short doc here"),            # < k tokens -> nothing
    (2, "one two three four five"),   # exactly k -> 1 gram, 1 window
    (3, "one two three four five six seven"),  # n_grams=3 < w
    (4, "Commas, CASE; and   spacing should not matter one two three "
        "four five six seven eight nine"),
]


def test_winnow_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=5, w=4).collect()
    }
    want = {
        (i, pos, fp)
        for i, text in DOCS
        for pos, fp in _ref_winnow(text, k=5, w=4)
    }
    assert got == want
    assert not any(i == 1 for i, _, _ in got)  # sub-k doc emits nothing
    assert sum(1 for i, _, _ in got if i == 2) == 1  # single-gram doc


def test_shared_run_guarantee(spark):
    # docs share an 8-token run (= w + k - 1 with k=5, w=4): the
    # winnowing guarantee says they must share >= 1 fingerprint hash
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (10, f"completely different prefix words {shared}"),
            (11, f"{shared} and then an unrelated suffix tail"),
        ],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(df, k=5, w=4).collect()
    fps = {i: {r["fp"] for r in rows if r["doc_id"] == i} for i in (10, 11)}
    assert fps[10] & fps[11]


def test_candidates_min_shared_and_guard(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (0, base + " lambda mu"),
            (1, base + " nu xi"),          # near-dup of 0
            (2, "totally unrelated text about spark shuffles and joins "
                "with enough tokens to fingerprint"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in fingerprint_candidates(fps, min_shared=2).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] >= 2
    # max_df=2 guard: a fp present in all 3 docs would be dropped; here
    # shared fps live in exactly 2 docs so the pair survives max_df=2
    pairs2 = {
        (r["id_a"], r["id_b"])
        for r in fingerprint_candidates(fps, min_shared=2, max_df=2)
        .collect()
    }
    assert pairs2 == {(0, 1)}


def test_candidates_max_df_drops_boilerplate(spark):
    # every doc carries the same boilerplate header: with max_df below
    # the doc count those fingerprints are dropped and no pair forms
    header = "standard license header apache version two point zero"
    df = spark.createDataFrame(
        [(i, f"{header} body{i} filler{i} words{i} here{i} now{i}")
         for i in range(5)],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    got = fingerprint_candidates(fps, min_shared=1, max_df=4).collect()
    # header fps appear in 5 docs > max_df=4 -> dropped; bodies differ
    assert got == []


@pytest.mark.parametrize(
    "kw",
    [{"k": 0}, {"k": True}, {"w": 0}, {"w": "4"}],
)
def test_winnow_validation(spark, kw):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, **kw)


@pytest.mark.parametrize(
    "kw", [{"min_shared": 0}, {"min_shared": True}, {"max_df": 1}]
)
def test_candidates_validation(spark, kw):
    df = spark.createDataFrame([(0, "a b c d e f")], ["doc_id", "text"])
    fps = winnow_fingerprints(df)
    with pytest.raises(ValueError):
        fingerprint_candidates(fps, **kw)
