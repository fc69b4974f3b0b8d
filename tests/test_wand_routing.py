"""Optimization r6: ``wand_topk`` routes to the vectorized kernels; the
literal document-at-a-time BMW loop survives as ``wand_topk_daat``.
These fuzz both against each other and against ``exact_topk`` — the
rank-identity contract every kernel already carries."""

import numpy as np

from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1
from ckanext_extractor_spark.operators.wand import (
    TermPostings,
    exact_topk,
    maxscore_topk,
    wand_topk,
    wand_topk_daat,
)

BLOCK = 64


def _tp(term, rng, n_docs, df, max_tf=7, avgdl=20.0):
    ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, max_tf, size=df).astype(np.int64)
    dls = rng.integers(5, 60, size=df).astype(np.int64)
    idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    tfn = tfs / (tfs + BM25_K1 * (1 - BM25_B + BM25_B * dls / avgdl))
    nb = (df + BLOCK - 1) // BLOCK
    bl = np.array([ids[min((i + 1) * BLOCK, df) - 1] for i in range(nb)])
    bm = np.array([tfn[i * BLOCK : (i + 1) * BLOCK].max() for i in range(nb)])
    return TermPostings(term, idf, ids, tfs, dls, bl, bm)


def test_wand_routes_rank_identical_fuzz():
    rng = np.random.default_rng(1234)
    avgdl = 20.0
    for trial in range(60):
        n_docs = int(rng.integers(50, 3000))
        n_terms = int(rng.integers(1, 5))
        tls = [
            _tp(f"t{i}", rng, n_docs, int(rng.integers(1, n_docs)))
            for i in range(n_terms)
        ]
        k = int(rng.integers(1, 15))
        for conj in (True, False):
            want = exact_topk(tls, k, avgdl, conjunctive=conj)
            got_router = wand_topk(tls, k, avgdl, conjunctive=conj)
            got_daat = wand_topk_daat(tls, k, avgdl, conjunctive=conj)
            docs_w = [d for d, _ in want]
            assert [d for d, _ in got_router] == docs_w, (trial, conj)
            assert [d for d, _ in got_daat] == docs_w, (trial, conj)
            for (d1, s1), (d2, s2) in zip(want, got_router):
                assert abs(s1 - s2) < 1e-9
            for (d1, s1), (d2, s2) in zip(want, got_daat):
                assert abs(s1 - s2) < 1e-6


def test_wand_empty_and_zero_df():
    assert wand_topk([], 10, 20.0) == []
    rng = np.random.default_rng(7)
    tp = _tp("a", rng, 100, 30)
    empty = TermPostings(
        "b", 0.0,
        np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        np.array([], dtype=np.float64),
    )
    # AND with a zero-df term matches nothing (both forms)
    assert wand_topk([tp, empty], 10, 20.0, conjunctive=True) == []
    assert wand_topk_daat([tp, empty], 10, 20.0, conjunctive=True) == []
    # OR ignores the empty list
    got = wand_topk([tp, empty], 10, 20.0, conjunctive=False)
    assert got == maxscore_topk([tp], 10, 20.0, conjunctive=False)
