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


# -------------------------------------------------- srp near-dup pairs


def _py_bits(vecs, n_bits, seed="srp"):
    proj = _py_project(vecs, n_bits, seed)
    return [sum((1 << j) for j, x in enumerate(row) if x >= 0)
            for row in proj]


def test_srp_neardup_scaled_copy_hamming0(spark):
    from ckanext_extractor_spark.functions.projection import (
        srp_neardup_pairs,
    )

    rng = np.random.RandomState(3)
    base = rng.normal(size=8).tolist()
    vecs = [base, [2.0 * x for x in base], rng.normal(size=8).tolist()]
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in srp_neardup_pairs(
               _emb_df(spark, vecs), n_bits=16, n_bands=2,
               max_hamming=0).collect()}
    # positive scaling never flips a sign bit -> hamming 0 pair
    assert out.get((0, 1)) == 0


def test_srp_neardup_matches_python_oracle(spark):
    from ckanext_extractor_spark.functions.projection import (
        srp_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(12, 6)).astype(np.float32).tolist()
    n_bits, n_bands, w = 12, 3, 4
    bits = _py_bits(vecs, n_bits)
    want = {}
    for i in range(12):
        for j in range(i + 1, 12):
            if any(((bits[i] >> (b * w)) & ((1 << w) - 1))
                   == ((bits[j] >> (b * w)) & ((1 << w) - 1))
                   for b in range(n_bands)):
                want[(i, j)] = bin(bits[i] ^ bits[j]).count("1")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in srp_neardup_pairs(
               _emb_df(spark, vecs), n_bits=n_bits, n_bands=n_bands,
               max_hamming=n_bits).collect()}
    assert got == want


def test_srp_neardup_bucket_guard(spark):
    from ckanext_extractor_spark.functions.projection import (
        srp_neardup_pairs,
    )

    vecs = [[1.0, 2.0, 3.0, 4.0]] * 3  # identical -> one hot bucket
    out = srp_neardup_pairs(_emb_df(spark, vecs), n_bits=8, n_bands=2,
                            max_hamming=8, max_bucket_size=1).collect()
    assert out == []  # every bucket bigger than 1 dropped pre-join


def test_srp_neardup_validation(spark):
    from ckanext_extractor_spark.functions.projection import (
        srp_neardup_pairs,
    )

    df = _emb_df(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError):
        srp_neardup_pairs(df, n_bits=10, n_bands=3)  # not divisible
    with pytest.raises(ValueError):
        srp_neardup_pairs(df, max_hamming=-1)
    with pytest.raises(ValueError):
        srp_neardup_pairs(df, max_bucket_size=0)


# --------------------------------------------------------- ivf-pq


def test_ivfpq_full_probe_equals_adc(spark):
    from ckanext_extractor_spark.functions.projection import ivfpq_topk

    rng = np.random.RandomState(13)
    vecs = rng.normal(size=(20, 8)).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=4, n_codes=4, rounds=0)
    codes = pq_encode(df, books)
    q = rng.normal(size=8).tolist()
    full = [(r["vec_id"], r["score"])
            for r in pq_adc_topk(codes, books, q, k=5).collect()]
    got = [(r["vec_id"], r["score"])
           for r in ivfpq_topk(codes, books, q, k=5, nprobe=4,
                               embeddings=df, n_clusters=4).collect()]
    assert got == full


def test_ivfpq_probe_prunes_to_near_cluster(spark):
    from ckanext_extractor_spark.functions.projection import ivfpq_topk
    from ckanext_extractor_spark.functions.similarity import (
        kmeans_centroids,
    )

    # two tight planted clusters far apart; ids 0-4 near +e1, 5-9 near +e2
    rng = np.random.RandomState(17)
    a = (np.array([10.0, 0.0, 0.0, 0.0]) + 0.01 * rng.normal(size=(5, 4)))
    b = (np.array([0.0, 10.0, 0.0, 0.0]) + 0.01 * rng.normal(size=(5, 4)))
    vecs = np.vstack([a, b]).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    cents = kmeans_centroids(df, n_clusters=2, rounds=2)
    books = pq_codebooks(df, m=2, n_codes=4, rounds=1)
    codes = pq_encode(df, books)
    out = ivfpq_topk(codes, books, [10.0, 0.1, 0.0, 0.0], k=10,
                     nprobe=1, centroids=cents, embeddings=df).collect()
    ids = {r["vec_id"] for r in out}
    # nprobe=1 scans only the +e1 cluster's members
    assert ids and ids <= ({0, 1, 2, 3, 4} if 0 in ids else {5, 6, 7, 8, 9})
    assert ids == {0, 1, 2, 3, 4}


def test_ivfpq_validation(spark):
    from ckanext_extractor_spark.functions.projection import ivfpq_topk

    df = _emb_df(spark, [[1.0, 2.0]])
    books = pq_codebooks(df, m=1, n_codes=1)
    codes = pq_encode(df, books)
    with pytest.raises(ValueError):
        ivfpq_topk(codes, books, [1.0, 2.0], nprobe=0, embeddings=df)
    with pytest.raises(ValueError):
        ivfpq_topk(codes, books, [1.0, 2.0], nprobe=1)  # no source


# --------------------------------------------------------- packed PQ


def test_pq_packed_encode_matches_eav(spark):
    from ckanext_extractor_spark.functions.projection import (
        pq_encode_packed,
    )

    rng = np.random.RandomState(23)
    vecs = rng.normal(size=(15, 8)).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=4, n_codes=4, rounds=1)
    eav = {(r["vec_id"], r["subspace"]): r["code"]
           for r in pq_encode(df, books).collect()}
    packed = {r["vec_id"]: r["codes"]
              for r in pq_encode_packed(df, books).collect()}
    assert set(packed) == set(range(15))
    for i in range(15):
        assert packed[i] == [eav[(i, s)] for s in range(4)]


def test_pq_packed_adc_matches_eav_adc(spark):
    from ckanext_extractor_spark.functions.projection import (
        pq_adc_topk_packed,
        pq_encode_packed,
    )

    rng = np.random.RandomState(29)
    vecs = rng.normal(size=(25, 8)).astype(np.float32).tolist()
    df = _emb_df(spark, vecs)
    books = pq_codebooks(df, m=4, n_codes=4, rounds=1)
    q = rng.normal(size=8).tolist()
    eav = [(r["vec_id"], r["score"]) for r in
           pq_adc_topk(pq_encode(df, books), books, q, k=25).collect()]
    packed = [(r["vec_id"], r["score"]) for r in
              pq_adc_topk_packed(pq_encode_packed(df, books), books,
                                 q, k=25).collect()]
    assert packed == eav


def test_pq_packed_validation(spark):
    from ckanext_extractor_spark.functions.projection import (
        pq_adc_topk_packed,
        pq_encode_packed,
    )

    df = _emb_df(spark, [[1.0, 2.0]])
    books = pq_codebooks(df, m=1, n_codes=1)
    packed = pq_encode_packed(df, books)
    with pytest.raises(ValueError):
        pq_adc_topk_packed(packed, books, [1.0], k=1)
    with pytest.raises(ValueError):
        pq_adc_topk_packed(packed, books, [1.0, 2.0], k=0)
