"""Round-5 additions: RRF hybrid fusion, DSIR importance resampling,
and PMI co-occurrence — numpy/pure-python reference oracles plus
contract edges (caps, determinism, guard rails)."""

from __future__ import annotations

import math
import hashlib

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.cooccur import pmi_pairs
from ckanext_extractor_spark.functions.dsir import (
    dsir_logratio,
    dsir_resample,
    dsir_weights,
)
from ckanext_extractor_spark.functions.hybrid import hybrid_topk, rrf_fuse


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- RRF


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_matches_hand_computation(spark):
    # list A ranks: 1 -> doc 3, 2 -> doc 1, 3 -> doc 2
    a = _ranked(spark, [(3, 9.0), (1, 5.0), (2, 1.0)])
    # list B ranks: 1 -> doc 2, 2 -> doc 3
    b = _ranked(spark, [(2, 0.9), (3, 0.8)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    assert out[3]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert out[2]["rrf_score"] == round(1 / 63 + 1 / 61, 6)
    assert out[1]["rrf_score"] == round(1 / 62, 6)
    assert out[3]["n_lists"] == 2 and out[1]["n_lists"] == 1
    # fused order: doc3 > doc2 > doc1
    order = [r["doc_id"] for r in rrf_fuse([a, b], k=60).collect()]
    assert order == [3, 2, 1]


def test_rrf_tie_break_is_rounded_score_then_id(spark):
    # scores equal after ROUND(.,6) -> rank by id asc
    a = _ranked(spark, [(7, 1.0000001), (4, 1.0000002)])
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a]).collect()}
    assert out[4] == round(1 / 61, 6)  # id 4 wins rank 1
    assert out[7] == round(1 / 62, 6)


def test_rrf_weights_and_topk(spark):
    a = _ranked(spark, [(1, 2.0), (2, 1.0)])
    b = _ranked(spark, [(2, 2.0), (1, 1.0)])
    out = hybrid_topk(a, b, topk=1, k=10, lexical_weight=3.0,
                      dense_weight=1.0).collect()
    # doc1: 3/11 + 1/12 ; doc2: 3/12 + 1/11 -> doc1 wins
    assert len(out) == 1 and out[0]["doc_id"] == 1
    assert out[0]["rrf_score"] == round(3 / 11 + 1 / 12, 6)


def test_rrf_max_list_rows_truncates_in_plan(spark):
    rows = [(i, float(1000 - i)) for i in range(100)]
    a = _ranked(spark, rows)
    fused = rrf_fuse([a], k=1, max_list_rows=10)
    got = fused.collect()
    assert len(got) == 10  # ranks 11..100 dropped in-plan
    assert [r["doc_id"] for r in got] == list(range(10))


def test_rrf_validation(spark):
    a = _ranked(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([a], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        rrf_fuse([a], max_list_rows=0)


# --------------------------------------------------------------- DSIR


def _docs(spark):
    rows = [
        (0, "spark spark join", "en"),
        (1, "join merge window", "en"),
        (2, "fenster strom quelle", "de"),
        (3, "strom strom fenster", "de"),
        (4, "spark quelle", "de"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _py_dsir(rows, target_rows, dim):
    """Pure-python reference for dsir_weights."""
    def toks(t):
        import re
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    def bucket(term):
        return _h60(term) % dim

    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _i, t, _l in rows:
        for tok in toks(t):
            rc[bucket(tok)] = rc.get(bucket(tok), 0) + 1
    for _i, t, _l in target_rows:
        for tok in toks(t):
            tc[bucket(tok)] = tc.get(bucket(tok), 0) + 1
    tr, tt = sum(rc.values()), sum(tc.values())
    lr = {
        b: math.log((tc.get(b, 0) + 1) / (tt + dim))
        - math.log((rc.get(b, 0) + 1) / (tr + dim))
        for b in range(dim)
    }
    out = {}
    for i, t, _l in rows:
        w = sum(lr[bucket(tok)] for tok in toks(t))
        out[i] = round(w, 6)
    return out


def test_dsir_weights_match_python_reference(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    trows = [r for r in rows if r[2] == "en"]
    expect = _py_dsir(rows, trows, dim=32)
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(docs, target, dim=32).collect()
    }
    assert got == pytest.approx(expect, abs=2e-6)
    # english docs must out-weigh german ones under an english target
    assert got[0] > got[2] and got[1] > got[3]
    # empty doc scores exactly 0
    assert got[5] == 0.0


def test_dsir_logratio_spine_covers_all_buckets(spark):
    docs = _docs(spark)
    lr = dsir_logratio(docs, docs.limit(1), dim=16)
    assert lr.count() == 16
    assert lr.where(F.col("logratio").isNull()).count() == 0


def test_dsir_resample_deterministic_and_temperature(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    a = dsir_resample(docs, target, n=3, dim=32, salt="x").collect()
    b = dsir_resample(docs, target, n=3, dim=32, salt="x").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    # scale=0 -> hard top-weights: selection is exactly the 3 largest
    # weights (ties by id)
    hard = dsir_resample(docs, target, n=3, dim=32, gumbel_scale=0.0)
    w = dsir_weights(docs, target, dim=32).collect()
    top3 = [
        r["doc_id"]
        for r in sorted(w, key=lambda r: (-r["weight"], r["doc_id"]))[:3]
    ]
    assert sorted(r["doc_id"] for r in hard.collect()) == sorted(top3)
    # a different salt redraws the gumbel noise: same docs, different
    # keys (keys are continuous, so any collision means salt was
    # ignored)
    keys_x = {r["doc_id"]: r["key"]
              for r in dsir_resample(docs, docs, n=6, dim=32,
                                     salt="x").collect()}
    keys_y = {r["doc_id"]: r["key"]
              for r in dsir_resample(docs, docs, n=6, dim=32,
                                     salt="y").collect()}
    assert set(keys_x) == set(keys_y)  # target==raw -> weight 0 for all
    assert all(keys_x[d] != keys_y[d] for d in keys_x)
    # keys are weight + noise: with scale 0, key == weight
    for r in hard.collect():
        assert r["key"] == pytest.approx(r["weight"], abs=1e-6)


def test_dsir_precomputed_logratio_reused(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    lr = dsir_logratio(docs, target, dim=32)
    direct = dsir_weights(docs, target, dim=32).collect()
    via = dsir_weights(docs, target, dim=32, logratio=lr).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via))


def test_dsir_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        dsir_logratio(docs, docs, dim=0)
    with pytest.raises(ValueError):
        dsir_resample(docs, docs, n=0)
    with pytest.raises(ValueError):
        dsir_resample(docs, docs, n=1, gumbel_scale=-1.0)


# ---------------------------------------------------------------- PMI


def _pmi_docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "alpha beta"),
        (3, "gamma delta"),
        (4, "alpha gamma"),
        (5, "common common alpha"),
        (6, "common beta"),
        (7, "common delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pmi_matches_hand_computation(spark):
    docs = _pmi_docs(spark)
    out = {
        (r["term_a"], r["term_b"]): r
        for r in pmi_pairs(docs, min_df=2, min_pair_count=2).collect()
    }
    n = 8
    # alpha df=5, beta df=4, pair alpha,beta=3
    ab = out[("alpha", "beta")]
    assert ab["pair_count"] == 3 and ab["df_a"] == 5 and ab["df_b"] == 4
    assert ab["pmi"] == round(math.log(n * 3 / (5 * 4)), 6)
    # pairs below min_pair_count are absent
    assert ("beta", "gamma") not in out  # co-occur only in doc 0


def test_pmi_max_df_band_drops_ubiquitous_terms(spark):
    docs = _pmi_docs(spark)
    out = pmi_pairs(docs, min_df=2, max_df=3, min_pair_count=1).collect()
    terms = {r["term_a"] for r in out} | {r["term_b"] for r in out}
    assert "alpha" not in terms  # df 5 > 3
    assert "beta" not in terms   # df 4 > 3
    assert {"gamma", "delta", "common"} >= terms and terms


def test_pmi_per_doc_cap_is_deterministic_prefix(spark):
    docs = _pmi_docs(spark)
    # cap 2 keeps the 2 lexicographically-first banded terms per doc:
    # doc0 {alpha,beta,gamma} -> {alpha,beta}
    out = pmi_pairs(
        docs, min_df=1, min_pair_count=1, max_terms_per_doc=2
    ).collect()
    got = {
        (r["term_a"], r["term_b"]): r["pair_count"] for r in out
    }
    # uncapped, (alpha, gamma) co-occurs in docs 0 and 4; with the cap
    # doc0 keeps only {alpha, beta}, so the pair survives via doc4 alone
    assert got[("alpha", "gamma")] == 1
    assert got[("alpha", "beta")] == 3  # alpha/beta always make the cut


def test_pmi_topk_and_order(spark):
    docs = _pmi_docs(spark)
    allp = pmi_pairs(docs, min_df=2, min_pair_count=2).collect()
    top2 = pmi_pairs(docs, min_df=2, min_pair_count=2, topk=2).collect()
    assert [tuple(r) for r in top2] == [tuple(r) for r in allp[:2]]
    pmis = [r["pmi"] for r in allp]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_validation(spark):
    docs = _pmi_docs(spark)
    with pytest.raises(ValueError):
        pmi_pairs(docs, min_df=0)
    with pytest.raises(ValueError):
        pmi_pairs(docs, min_df=5, max_df=4)
    with pytest.raises(ValueError):
        pmi_pairs(docs, min_pair_count=0)
    with pytest.raises(ValueError):
        pmi_pairs(docs, max_terms_per_doc=1)
