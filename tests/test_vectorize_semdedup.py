"""Round-4 pipeline ops: SemDeDup semantic dedup (similarity.py),
hashing-trick TF-IDF (vectorize.py), overlapping duplicate spans
(chunking.py) — verified against driver-side numpy/python oracles."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from ckanext_extractor_spark.functions.chunking import duplicate_spans
from ckanext_extractor_spark.functions.similarity import semantic_dedup
from ckanext_extractor_spark.functions.vectorize import hashed_tfidf


# ----------------------------------------------------------- semantic dedup


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_planted_duplicates(spark):
    # seeds = ids 0 and 1 (K=2). id 2 is a near-copy of seed 0,
    # id 3 a scaled copy of seed 1 (cosine 1.0), id 4 orthogonal-ish.
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.99, 0.05, 0.0, 0.0],
        [0.0, 5.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb_df(spark, vecs), n_clusters=2, threshold=0.95
        ).collect()
    }
    assert len(out) == 5  # every row present
    # seeds keep themselves (smallest ids of their clusters)
    assert not out[0]["is_dup"] and out[0]["cluster_id"] == 0
    assert not out[1]["is_dup"] and out[1]["cluster_id"] == 1
    # planted near-copies marked duplicate in the right clusters
    assert out[2]["cluster_id"] == 0 and out[2]["is_dup"]
    assert out[3]["cluster_id"] == 1 and out[3]["is_dup"]
    # orthogonal vector assigned somewhere but never a duplicate
    assert not out[4]["is_dup"]


def test_semdedup_keep_smallest_id(spark):
    # three mutual near-dups: only the smallest id survives
    vecs = [[1.0, 0.0], [1.0, 0.001], [1.0, 0.002], [0.0, 1.0]]
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(
            _emb_df(spark, vecs), n_clusters=1, threshold=0.99
        ).collect()
    }
    assert out == {0: False, 1: True, 2: True, 3: False}


def test_semdedup_max_cluster_size_skips_pairs_not_rows(spark):
    vecs = [[1.0, 0.0], [1.0, 0.001], [1.0, 0.002]]
    out = semantic_dedup(
        _emb_df(spark, vecs), n_clusters=1, threshold=0.99,
        max_cluster_size=2,
    ).collect()
    # oversized cluster: no pair scan -> nothing marked, rows all kept
    assert len(out) == 3
    assert all(not r["is_dup"] for r in out)


def test_semdedup_threshold_monotone(spark):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(40, 8)).tolist()
    df = _emb_df(spark, vecs)
    n_low = sum(
        r["is_dup"] for r in semantic_dedup(df, 4, threshold=0.2).collect()
    )
    n_high = sum(
        r["is_dup"] for r in semantic_dedup(df, 4, threshold=0.8).collect()
    )
    assert n_low >= n_high


@pytest.mark.parametrize("bad_k,bad_t", [(0, 0.5), (-1, 0.5), (True, 0.5),
                                         (2, 1.5), (2, -2.0), (2, True)])
def test_semdedup_validation(spark, bad_k, bad_t):
    df = _emb_df(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError):
        semantic_dedup(df, n_clusters=bad_k, threshold=bad_t)


# ------------------------------------------------------------- hashed tfidf


def _bucket(term: str, dim: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % dim


def test_hashed_tfidf_matches_python_oracle(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, ""),  # zero-token doc: counts toward N, emits no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dim, n = 64, 3
    # python oracle
    tf: dict[tuple[int, int], float] = {}
    for did, text in rows:
        for t in [w for w in text.lower().split() if w]:
            k = (did, _bucket(t, dim))
            tf[k] = tf.get(k, 0.0) + 1.0
    dfreq: dict[int, int] = {}
    for (_, b) in tf:
        dfreq[b] = dfreq.get(b, 0) + 1
    w = {k: v * (math.log((n + 1) / (dfreq[k[1]] + 1)) + 1) for k, v in tf.items()}
    norms = {}
    for (did, _b), ww in w.items():
        norms[did] = norms.get(did, 0.0) + ww * ww
    expect = {
        k: round(v / math.sqrt(norms[k[0]]), 6) for k, v in w.items()
    }
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_tfidf(df, dim=dim).collect()
    }
    assert got == expect
    # unnormalized weights too
    got_raw = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_tfidf(df, dim=dim, l2_normalize=False).collect()
    }
    assert got_raw == {k: round(v, 6) for k, v in w.items()}


def test_hashed_tfidf_l2_norm_is_unit(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j k")], "doc_id long, text string"
    )
    rows = hashed_tfidf(df, dim=16).collect()
    assert abs(sum(r["weight"] ** 2 for r in rows) - 1.0) < 1e-4


def test_hashed_tfidf_collisions_fold(spark):
    # dim=1: every term lands in bucket 0 -> one row per doc
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "p q")], "doc_id long, text string"
    )
    rows = hashed_tfidf(df, dim=1, l2_normalize=False).collect()
    assert {(r["doc_id"], r["bucket"]) for r in rows} == {(0, 0), (1, 0)}


def test_hashed_tfidf_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    for bad in (0, -2, True, "64"):
        with pytest.raises(ValueError):
            hashed_tfidf(df, dim=bad)


# ---------------------------------------------------------- duplicate spans


def test_duplicate_spans_any_offset(spark):
    # the 3-token span "license block text" appears at offset 2 in doc
    # 0 and offset 0 in doc 1 — stride-1 shingling finds it anywhere
    # (the aligned-window op would miss the offset-2 copy for size 3).
    rows = [
        (0, "intro words license block text more"),
        (1, "license block text trailing stuff here"),
        (2, "nothing shared at all in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["start_pos"]): r["n_docs"]
        for r in duplicate_spans(df, size=3, min_docs=2).collect()
    }
    assert got == {(0, 2): 2, (1, 0): 2}


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    # repeats within ONE doc don't cross the distinct-doc threshold
    df = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "x y z w v u")],
        "doc_id long, text string",
    )
    assert duplicate_spans(df, size=3, min_docs=2).count() == 0


def test_duplicate_spans_short_docs_and_validation(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    # docs shorter than size emit no shingles
    assert duplicate_spans(df, size=3, min_docs=2).count() == 0
    # exactly size tokens -> one shingle at pos 0
    df2 = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
    )
    got = duplicate_spans(df2, size=3, min_docs=2).collect()
    assert {(r["doc_id"], r["start_pos"]) for r in got} == {(0, 0), (1, 0)}
    for bad_size, bad_min in ((1, 2), (0, 2), (True, 2), (3, 1), (3, True)):
        with pytest.raises(ValueError):
            duplicate_spans(df, size=bad_size, min_docs=bad_min)


# ------------------------------------------------------------------ IVF ANN


def test_ivf_full_probe_equals_exact(spark):
    from ckanext_extractor_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(60, 8)).tolist()
    df = _emb_df(spark, vecs)
    q = vecs[7]
    exact = [(r["vec_id"], round(r["cosine"], 6))
             for r in cosine_topk(df, q, k=5).collect()]
    full = [(r["vec_id"], round(r["cosine"], 6))
            for r in ivf_topk(df, q, k=5, n_clusters=4, nprobe=4).collect()]
    assert full == exact  # probing every cluster IS the exact scan


def test_ivf_probe_prunes_and_finds_planted(spark):
    from ckanext_extractor_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
    )

    # seeds 0/1 orthogonal; 2 near seed 0, 3 near seed 1
    vecs = [
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
        [0.98, 0.1, 0.0], [0.1, 0.98, 0.0], [0.0, 0.0, 1.0],
    ]
    df = _emb_df(spark, vecs)
    hits = ivf_topk(df, [1.0, 0.05, 0.0], k=2, n_clusters=2,
                    nprobe=1).collect()
    ids = [r["vec_id"] for r in hits]
    assert ids[0] in (0, 2) and set(ids) <= {0, 2}  # cluster-0 members only
    # precomputed assignments give the identical result
    assigns = ivf_assign(df, n_clusters=2)
    hits2 = ivf_topk(df, [1.0, 0.05, 0.0], k=2, n_clusters=2, nprobe=1,
                     assignments=assigns).collect()
    assert [(r["vec_id"], round(r["cosine"], 6)) for r in hits2] == \
        [(r["vec_id"], round(r["cosine"], 6)) for r in hits]


def test_ivf_validation(spark):
    from ckanext_extractor_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
    )

    df = _emb_df(spark, [[1.0, 0.0], [0.0, 1.0]])
    for bad in (0, 3, True, -1):
        with pytest.raises(ValueError):
            ivf_topk(df, [1.0, 0.0], n_clusters=2, nprobe=bad)
    with pytest.raises(ValueError):
        ivf_assign(df, n_clusters=0)


# ------------------------------------------------------- unigram surprisal


def test_unigram_surprisal_python_oracle(spark):
    from ckanext_extractor_spark.functions.textstats import (
        unigram_surprisal,
    )

    rows = [(0, "a a b"), (1, "a c"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # corpus: a=3, b=1, c=1, total=5
    p = {"a": 3 / 5, "b": 1 / 5, "c": 1 / 5}
    s = {t: -math.log2(v) for t, v in p.items()}
    exp0 = (s["a"] + s["a"] + s["b"]) / 3
    exp1 = (s["a"] + s["c"]) / 2
    got = {
        r["doc_id"]: r
        for r in unigram_surprisal(df).collect()
    }
    assert got[0]["n_tokens"] == 3
    assert got[0]["mean_surprisal"] == round(exp0, 6)
    assert got[0]["ppl"] == round(2 ** exp0, 4)
    assert got[1]["mean_surprisal"] == round(exp1, 6)
    # zero-token docs pass through pinned to 0
    assert got[2]["n_tokens"] == 0 and got[2]["mean_surprisal"] == 0.0
    assert got[2]["ppl"] == 1.0


def test_unigram_surprisal_ordering(spark):
    from ckanext_extractor_spark.functions.textstats import (
        unigram_surprisal,
    )

    # a doc made of corpus-common tokens scores lower surprisal than
    # one made of corpus-rare tokens
    rows = [(i, "common words common words") for i in range(5)]
    rows.append((5, "zxqj vwpk"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_surprisal"]
           for r in unigram_surprisal(df).collect()}
    assert got[5] > got[0]
