"""Round-5 pipeline ops: sparse TF-IDF cosine top-k neighbors
(vectorize.tfidf_neighbors_topk) and the hashing-trick multinomial
Naive Bayes corpus classifier (functions/classify.py) — verified
against driver-side numpy/python oracles."""

from __future__ import annotations

import hashlib
import math

import pytest

from ckanext_extractor_spark.functions.classify import (
    nb_classify,
    nb_evaluate,
    nb_train,
)
from ckanext_extractor_spark.functions.vectorize import (
    hashed_tfidf,
    tfidf_neighbors_topk,
)


def _h60(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


# ------------------------------------------------- tfidf neighbors


def _py_tfidf(texts, dim):
    """Replicates hashed_tfidf (smooth idf, L2, 6dp round)."""
    tf = []
    for t in texts:
        counts = {}
        for w in [w for w in _split(t) if w]:
            b = _h60(w) % dim
            counts[b] = counts.get(b, 0.0) + 1.0
        tf.append(counts)
    df = {}
    for counts in tf:
        for b in counts:
            df[b] = df.get(b, 0) + 1
    n = float(len(texts))
    out = []
    for counts in tf:
        w = {b: c * (math.log((n + 1.0) / (df[b] + 1.0)) + 1.0)
             for b, c in counts.items()}
        norm = math.sqrt(sum(v * v for v in w.values()))
        out.append({b: round(v / norm, 6) for b, v in w.items()})
    return out


def _split(t):
    import re

    return re.split(r"[^a-z0-9]+", t.lower())


def test_neighbors_match_numpy_oracle(spark):
    texts = [
        "spark join shuffle partition",
        "spark join broadcast hash",
        "duck pond water lily",
        "duck pond water reeds",
        "spark shuffle partition skew salt",
        "lily water garden pond duck",
    ]
    dim = 64
    got = {
        (r["doc_id"], r["neighbor_id"]): r["cosine"]
        for r in tfidf_neighbors_topk(
            _docs_df(spark, texts), k=3, dim=dim
        ).collect()
    }
    vecs = _py_tfidf(texts, dim)
    # python oracle: all-pairs cosine from the SAME rounded weights
    want = {}
    for i in range(len(texts)):
        sims = []
        for j in range(len(texts)):
            if i == j:
                continue
            c = round(
                sum(w * vecs[j].get(b, 0.0) for b, w in vecs[i].items()), 6
            )
            sims.append((c, j))
        sims.sort(key=lambda p: (-p[0], p[1]))
        for c, j in sims[:3]:
            want[(i, j)] = c
    assert got == want


def test_neighbors_k_bound_and_symmetric_presence(spark):
    texts = ["a b c", "a b d", "a c d", "b c d", "a b c d"]
    out = tfidf_neighbors_topk(_docs_df(spark, texts), k=2, dim=32).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 2 for v in per_doc.values())
    assert set(per_doc) == {0, 1, 2, 3, 4}


def test_neighbors_max_bucket_df_prunes_hot_buckets(spark):
    # 'the' is in every doc (hot bucket); docs 0/1 share ONLY 'the',
    # so with the hot bucket pruned they get no pair.
    texts = ["the alpha", "the beta", "the gamma delta",
             "the gamma delta epsilon"]
    out = tfidf_neighbors_topk(
        _docs_df(spark, texts), k=3, dim=128, max_bucket_df=2
    ).collect()
    pairs = {(r["doc_id"], r["neighbor_id"]) for r in out}
    assert (0, 1) not in pairs and (1, 0) not in pairs
    # docs 2/3 still pair through 'gamma'/'delta' (df=2 buckets kept)
    assert (2, 3) in pairs and (3, 2) in pairs


def test_neighbors_min_cosine_floor(spark):
    texts = ["x y z", "x y w", "q r s"]
    vecs = _py_tfidf(texts, 32)
    c01 = round(sum(w * vecs[1].get(b, 0.0)
                    for b, w in vecs[0].items()), 6)
    assert 0.0 < c01 < 0.99
    out = tfidf_neighbors_topk(
        _docs_df(spark, texts), k=3, dim=32, min_cosine=0.99
    ).collect()
    assert out == []  # nothing survives a floor above c01
    out2 = tfidf_neighbors_topk(
        _docs_df(spark, texts), k=3, dim=32, min_cosine=c01 - 1e-6
    ).collect()
    assert {(r["doc_id"], r["neighbor_id"]) for r in out2} == {(0, 1), (1, 0)}


def test_neighbors_validation(spark):
    df = _docs_df(spark, ["a"])
    with pytest.raises(ValueError):
        tfidf_neighbors_topk(df, k=0)
    with pytest.raises(ValueError):
        tfidf_neighbors_topk(df, k=True)
    with pytest.raises(ValueError):
        tfidf_neighbors_topk(df, k=2, max_bucket_df=1)


# ------------------------------------------------- naive bayes


def _labeled_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, g) for i, (t, g) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_nb_separable_corpus_perfect(spark):
    rows = [
        ("der hund läuft schnell", "de"),
        ("die katze schläft hier", "de"),
        ("the dog runs fast", "en"),
        ("the cat sleeps here", "en"),
        ("der die das hund katze", "de"),
        ("the a an dog cat", "en"),
    ]
    df = _labeled_df(spark, rows)
    model = nb_train(df, dim=256)
    pred = {r["doc_id"]: r["pred_label"]
            for r in nb_classify(df, model, dim=256).collect()}
    assert pred == {i: g for i, (_, g) in enumerate(rows)}


def test_nb_model_shape_and_summary_rows(spark):
    df = _labeled_df(spark, [("a b c", "x"), ("d e f", "y")])
    rows = nb_train(df, dim=64).collect()
    labels = {r["label"] for r in rows}
    assert labels == {"x", "y"}
    for lab in labels:
        kinds = {r["bucket"] for r in rows if r["label"] == lab}
        # prior + unseen default + recorded dim
        assert -1 in kinds and -2 in kinds and -3 in kinds
        assert all(b < 64 for b in kinds)
    dims = {r["log_prob"] for r in rows if r["bucket"] == -3}
    assert dims == {64.0}
    # priors: 1 doc each of 2 -> ln(0.5)
    pri = {r["label"]: r["log_prob"] for r in rows if r["bucket"] == -1}
    assert all(abs(v - round(math.log(0.5), 6)) < 1e-9 for v in pri.values())


def test_nb_matches_python_oracle(spark):
    rows = [
        ("spark spark join", "code"),
        ("join shuffle spark", "code"),
        ("pond duck water", "nature"),
        ("water lily pond pond", "nature"),
        ("spark pond", "code"),
    ]
    dim, alpha = 32, 1.0
    df = _labeled_df(spark, rows)
    model = nb_train(df, dim=dim, alpha=alpha)
    got = {
        r["doc_id"]: (r["pred_label"], r["score"])
        for r in nb_classify(df, model, dim=dim).collect()
    }
    # python NB with the same md5-60 hash and 6dp model rounding
    counts, totals, ndocs = {}, {}, {}
    for t, g in rows:
        ndocs[g] = ndocs.get(g, 0) + 1
        for w in [w for w in _split(t) if w]:
            b = _h60(w) % dim
            counts[(g, b)] = counts.get((g, b), 0.0) + 1.0
            totals[g] = totals.get(g, 0.0) + 1.0
    n = float(len(rows))
    lp = {k: round(math.log((c + alpha) / (totals[k[0]] + alpha * dim)), 6)
          for k, c in counts.items()}
    prior = {g: round(math.log(c / n), 6) for g, c in ndocs.items()}
    dflt = {g: round(math.log(alpha / (totals[g] + alpha * dim)), 6)
            for g in totals}
    for i, (t, _) in enumerate(rows):
        tf = {}
        for w in [w for w in _split(t) if w]:
            tf[_h60(w) % dim] = tf.get(_h60(w) % dim, 0.0) + 1.0
        best = None
        for g in sorted(prior):
            s = prior[g] + sum(
                c * lp.get((g, b), dflt[g]) for b, c in tf.items()
            )
            s = round(s, 6)
            if best is None or s > best[1]:
                best = (g, s)
        assert got[i] == best, f"doc {i}"


def test_nb_zero_token_doc_gets_prior_argmax(spark):
    rows = [("aaa bbb", "big"), ("aaa ccc", "big"), ("ddd", "small")]
    df = _labeled_df(spark, rows)
    model = nb_train(df, dim=32)
    target = spark.createDataFrame(
        [(99, "???")], "doc_id long, text string"
    )  # tokenizes to nothing
    out = nb_classify(target, model, dim=32).collect()
    assert len(out) == 1
    # prior-only argmax -> the majority class
    assert out[0]["pred_label"] == "big"
    assert out[0]["score"] == round(math.log(2.0 / 3.0), 6)


def test_nb_null_labels_excluded_from_training(spark):
    df = spark.createDataFrame(
        [(0, "aaa", "x"), (1, "bbb", None), (2, "ccc", "y")],
        "doc_id long, text string, lang string",
    )
    labels = {r["label"] for r in nb_train(df, dim=32).collect()}
    assert labels == {"x", "y"}


def test_nb_evaluate_confusion(spark):
    rows = [("aaa aaa", "x"), ("aaa aab", "x"), ("zzz zzy", "y"),
            ("zzz aaa", "y")]
    df = _labeled_df(spark, rows)
    model = nb_train(df, dim=64)
    pred = nb_classify(df, model, dim=64)
    conf = {(r["true_label"], r["pred_label"]): r["n"]
            for r in nb_evaluate(pred, df).collect()}
    assert sum(conf.values()) == 4
    # separable enough: the all-x docs classify x, the zzz docs y or x
    assert conf.get(("x", "x"), 0) == 2


def test_nb_validation(spark):
    df = _labeled_df(spark, [("a", "x")])
    with pytest.raises(ValueError):
        nb_train(df, dim=0)
    with pytest.raises(ValueError):
        nb_train(df, alpha=0.0)
    with pytest.raises(ValueError):
        nb_classify(df, nb_train(df), dim=-1)
