"""Composed curation pass (functions/curate.py:curate_corpus):
quality rules -> exact dedup -> per-group quota -> split, one plan."""

from __future__ import annotations

import hashlib
import re

import pytest

from ckanext_extractor_spark.functions.curate import curate_corpus


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


LONG = " ".join(f"word{i} text" for i in range(30))  # 60 tokens, alpha-heavy


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # survivors (same source, distinct contents)
        (0, "a", LONG),
        (1, "a", LONG + " extra tail tokens here"),
        (2, "a", LONG + " another distinct suffix"),
        # exact duplicate of doc 0 -> dropped, keeper is min id
        (3, "a", LONG),
        # too short
        (4, "b", "tiny doc"),
        # low alpha ratio (digits + punctuation)
        (5, "b", " ".join("12345 !!!" for _ in range(30))),
        # low distinct ratio (one token repeated)
        (6, "b", " ".join("same" for _ in range(40))),
        # survivor in source b
        (7, "b", LONG + " source b version"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _curated(docs, **kw):
    base = dict(min_tokens=20, max_tokens=10_000, min_alpha_ratio=0.5,
                min_distinct_ratio=0.3, test_frac=0.5, salt="t")
    base.update(kw)
    return {r["doc_id"]: r.asDict() for r in curate_corpus(docs, **base).collect()}


def test_stages_filter_and_dedup(docs):
    out = _curated(docs)
    # 4 dup of 0 (keeper=0); 4/5/6 fail a rule each
    assert set(out) == {0, 1, 2, 7}
    assert out[0]["n_tokens"] == len(_tok(LONG)) == 60


def test_rule_reasons(docs):
    # loosening one rule at a time readmits exactly the matching doc
    assert 4 in _curated(docs, min_tokens=1)
    assert 5 in _curated(docs, min_alpha_ratio=0.0, min_distinct_ratio=0.0)
    assert 6 in _curated(docs, min_distinct_ratio=0.0)


def test_quota_caps_per_group_after_dedup(docs):
    out = _curated(docs, quota_per_group=2)
    by_src = {}
    for r in out.values():
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["a"]) == 2 and by_src["b"] == [7]
    # survivors are the quota hash-rank winners among {0,1,2} — NOT
    # raw rows: the duplicate (3) must not consume source a's budget.
    # The quota draw uses the domain-separated salt+':quota' hash so
    # it cannot correlate with the split hash below.
    ranked = sorted([0, 1, 2], key=lambda i: (_md5(f"{i}t:quota"), i))
    assert sorted(by_src["a"]) == sorted(ranked[:2])


def test_split_matches_hash_rule(docs):
    out = _curated(docs, test_frac=0.25)
    for i, r in out.items():
        want = "test" if _md5(f"{i}t")[:4] < "4000" else "train"
        assert r["split"] == want


def test_ratios_are_exact_int_divisions(docs):
    out = _curated(docs)
    toks = _tok(LONG)
    alpha = sum(c.isalpha() for c in LONG) / len(LONG)
    assert out[0]["alpha_ratio"] == round(alpha, 6)
    assert out[0]["distinct_ratio"] == round(len(set(toks)) / len(toks), 6)


def test_quota_and_split_are_decorrelated(spark):
    # Pre-fix regression: quota and split both drew on md5(id||salt),
    # so a capped group's survivors were exactly the lowest-hash rows
    # — all labeled 'test' (quota 20 of 100 at test_frac 0.25 gave a
    # 0-doc train split). With the ':quota' domain separation the
    # survivors must carry BOTH labels.
    rows = [(i, "h", LONG + f" unique suffix number {i}")
            for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = curate_corpus(docs, min_tokens=20, max_tokens=10_000,
                        min_alpha_ratio=0.5, min_distinct_ratio=0.3,
                        quota_per_group=20, test_frac=0.25, salt="c5")
    splits = {r["split"] for r in out.collect()}
    assert splits == {"test", "train"}


def test_bad_band_rejected(docs):
    with pytest.raises(ValueError):
        curate_corpus(docs, min_tokens=10, max_tokens=5)
