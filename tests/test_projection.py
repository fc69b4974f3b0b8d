"""Round-5 embedding sketches: deterministic signed random projection
(srp_project / srp_bits) and product quantization (pq_codebooks /
pq_encode / pq_adc_topk) — verified against driver-side numpy/python
oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ckanext_extractor_spark.functions.projection import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    srp_bits,
    srp_project,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _sign(seed, i, j):
    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def _py_project(vecs, out_dim, seed="srp"):
    out = []
    for v in vecs:
        v64 = [float(np.float32(x)) for x in v]
        out.append([
            round(sum(x * _sign(seed, i, j) for i, x in enumerate(v64)), 6)
            for j in range(out_dim)
        ])
    return out


def test_srp_matches_python_oracle(spark):
    vecs = [[0.5, -1.25, 2.0, 0.125], [1.0, 1.0, -1.0, 0.0],
            [0.0, 0.0, 0.0, 0.0]]
    got = {
        (r["vec_id"], r["j"]): r["value"]
        for r in srp_project(_emb_df(spark, vecs), out_dim=8).collect()
    }
    want = _py_project(vecs, 8)
    assert got == {
        (i, j): want[i][j] for i in range(3) for j in range(8)
    }


def test_srp_linearity(spark):
    base = [0.5, -0.75, 1.5, 2.0, -0.25, 0.125, 1.0, -1.0]
    vecs = [base, [2 * x for x in base]]
    rows = srp_project(_emb_df(spark, vecs), out_dim=4).collect()
    v = {(r["vec_id"], r["j"]): r["value"] for r in rows}
    for j in range(4):
        assert v[(1, j)] == pytest.approx(2 * v[(0, j)], abs=2e-6)


def test_srp_seed_changes_matrix(spark):
    vecs = [[1.0, 2.0, 3.0, 4.0]]
    a = {r["j"]: r["value"]
         for r in srp_project(_emb_df(spark, vecs), out_dim=8,
                              seed="a").collect()}
    b = {r["j"]: r["value"]
         for r in srp_project(_emb_df(spark, vecs), out_dim=8,
                              seed="b").collect()}
    assert a != b


def test_srp_bits_pack(spark):
    vecs = [[0.5, -1.25, 2.0, 0.125], [-1.0, 0.5, 0.25, -2.0]]
    proj = _py_project(vecs, 12)
    want = [
        sum((1 << j) for j, x in enumerate(row) if x >= 0)
        for row in proj
    ]
    got = {r["vec_id"]: r["bits"]
           for r in srp_bits(_emb_df(spark, vecs), n_bits=12).collect()}
    assert got == {0: want[0], 1: want[1]}


def test_srp_validation(spark):
    df = _emb_df(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError):
        srp_project(df, out_dim=0)
    with pytest.raises(ValueError):
        srp_bits(df, n_bits=61)
    with pytest.raises(ValueError):
        srp_project(df.limit(0), out_dim=4)


# ----------------------------------------------------------------- PQ


def test_pq_codebooks_pinned_seeds(spark):
    vecs = [[1.0, 0.0, 0.0, 2.0], [0.0, 1.0, 3.0, 0.0],
            [1.0, 1.0, 1.0, 1.0]]
    books = pq_codebooks(_emb_df(spark, vecs), m=2, n_codes=2, rounds=0)
    assert len(books) == 2
    # seeds = the 2 smallest-id subvectors per subspace
    assert books[0] == [[1.0, 0.0], [0.0, 1.0]]
    assert books[1] == [[0.0, 2.0], [3.0, 0.0]]


def test_pq_encode_matches_numpy_argmin(spark):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=4, n_codes=4, rounds=1)
    got = {(r["vec_id"], r["subspace"]): r["code"]
           for r in pq_encode(df, books).collect()}
    arr = np.array([[float(np.float32(x)) for x in v] for v in vecs])
    for i in range(20):
        for s in range(4):
            subv = arr[i, s * 2:(s + 1) * 2]
            d = [round(float(np.sum((subv - np.array(c)) ** 2)), 6)
                 for c in books[s]]
            want = min(range(4), key=lambda c: (d[c], c))
            assert got[(i, s)] == want, (i, s)


def test_pq_adc_exact_when_codebook_complete(spark):
    # n_codes = n_vecs with rounds=0: every subvector IS a centroid,
    # so encode is lossless and ADC == the exact dot product.
    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(4, 6)).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=3, n_codes=4, rounds=0)
    codes = pq_encode(df, books)
    q = [1.0, -0.5, 0.25, 2.0, -1.5, 0.75]
    got = {r["vec_id"]: r["score"]
           for r in pq_adc_topk(codes, books, q, k=4).collect()}
    arr = np.array([[float(np.float32(x)) for x in v] for v in vecs])
    for i in range(4):
        # ADC sums per-subspace 6dp-rounded partials; allow that slack
        assert got[i] == pytest.approx(float(arr[i] @ np.array(q)),
                                       abs=5e-6)


def test_pq_adc_topk_order_and_k(spark):
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [-1.0, 0.0]]
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=1, n_codes=4, rounds=0)
    codes = pq_encode(df, books)
    out = pq_adc_topk(codes, books, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in out] == [0, 2]


def test_pq_validation(spark):
    df = _emb_df(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError):
        pq_codebooks(df, m=2, n_codes=1)  # 3 not divisible by 2
    books = pq_codebooks(df, m=3, n_codes=1)
    with pytest.raises(ValueError):
        pq_adc_topk(pq_encode(df, books), books, [1.0, 2.0], k=1)
    with pytest.raises(ValueError):
        pq_adc_topk(pq_encode(df, books), books, [1.0, 2.0, 3.0], k=0)
