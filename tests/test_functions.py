"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing — verified against driver-side numpy/pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import (
    exact_duplicates,
    jaccard_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
)
from ckanext_extractor_spark.functions.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synthetic_media,
)
from ckanext_extractor_spark.functions.similarity import (
    add_lsh_buckets,
    cosine_topk,
    lsh_bucket_topk,
)
from ckanext_extractor_spark.functions.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "der schnelle braune fuchs und der faule hund ist mit"),
    (4, "completely different tokens entirely unrelated words"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string").cache()


def test_exact_duplicates(docs):
    out = exact_duplicates(docs, include_members=True).toPandas()
    dups = out[out.group_size > 1]
    assert len(dups) == 1
    assert dups.iloc[0]["group_size"] == 2
    assert dups.iloc[0]["keeper_doc_id"] == 0
    assert sorted(dups.iloc[0]["member_ids"]) == [0, 1]
    # default path omits the unbounded member list (100 TB safety)
    assert "member_ids" not in exact_duplicates(docs).columns


def test_minhash_identical_docs_same_signature(docs):
    sig = minhash_signatures(docs).toPandas().set_index("doc_id")
    assert list(sig.loc[0, "minhash"]) == list(sig.loc[1, "minhash"])
    # near-dup shares most hash minima, disjoint doc shares none
    s0, s2, s4 = (np.array(sig.loc[i, "minhash"]) for i in (0, 2, 4))
    assert (s0 == s2).sum() >= 4
    assert (s0 == s4).sum() == 0


def test_minhash_lsh_finds_near_dups(docs):
    pairs = minhash_lsh_pairs(docs, n_hashes=8, rows_per_band=2).toPandas()
    got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (0, 1) in got  # exact dup always collides
    assert not any(4 in p for p in got)  # disjoint doc never pairs


def test_jaccard_exact_values(docs):
    out = jaccard_candidate_pairs(docs, threshold=0.0).toPandas()
    out = out.set_index(["doc_a", "doc_b"])["jaccard"]
    # docs 0 and 1 identical -> J=1; 0 vs 2: tokens differ by jumps/leaps
    assert out.loc[(0, 1)] == pytest.approx(1.0)
    toks0 = set("the quick brown fox jumps over lazy dog".split())
    toks2 = set("the quick brown fox leaps over lazy dog".split())
    expected = len(toks0 & toks2) / len(toks0 | toks2)
    assert out.loc[(0, 2)] == pytest.approx(expected)
    assert (0, 4) not in out.index or out.loc[(0, 4)] == 0


def test_jaccard_with_candidates_matches_full(docs):
    cand = minhash_lsh_pairs(docs, n_hashes=8, rows_per_band=2)
    out = jaccard_candidate_pairs(docs, threshold=0.5, candidates=cand).toPandas()
    full = jaccard_candidate_pairs(docs, threshold=0.5).toPandas()
    got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    want = set(map(tuple, full[["doc_a", "doc_b"]].to_numpy()))
    assert got <= want  # LSH-verified subset of exact
    assert (0, 1) in got


def test_simhash_neardup_close_hamming(docs):
    sh = simhash64(docs, n_bits=32).toPandas().set_index("doc_id")["simhash"]
    assert sh.loc[0] == sh.loc[1]
    ham_near = bin(int(sh.loc[0]) ^ int(sh.loc[2])).count("1")
    ham_far = bin(int(sh.loc[0]) ^ int(sh.loc[4])).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.RandomState(0)
    base = rng.normal(size=(50, 16)).astype(np.float32)
    base[7] = base[3] * 0.95 + 0.05 * rng.normal(size=16).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache(), base


def test_cosine_topk_matches_numpy(embeddings):
    df, base = embeddings
    q = base[3].astype(np.float64)
    got = cosine_topk(df, list(q), k=5).toPandas()
    sims = (base.astype(np.float64) @ q) / (
        np.linalg.norm(base.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    order = np.lexsort((np.arange(50), -sims))[:5]
    assert got["vec_id"].tolist() == order.tolist()
    assert np.allclose(got["cosine"].to_numpy(), sims[order], rtol=1e-6)
    assert got["vec_id"].iloc[0] == 3  # self-match first
    assert got["vec_id"].iloc[1] == 7  # planted near-neighbor second


def test_lsh_bucket_topk_finds_planted_neighbor(embeddings):
    df, base = embeddings
    bucketed = add_lsh_buckets(df, dim=16, n_planes=6).cache()
    got = lsh_bucket_topk(
        bucketed, list(base[3].astype(np.float64)), dim=16, n_planes=6,
        probe_hamming=2, k=3,
    ).toPandas()
    assert 3 in got["vec_id"].tolist()
    # candidate set is smaller than the full table (the point of LSH)
    assert bucketed.where(
        F.col("lsh_bucket").isin(
            [int(b) for b in bucketed.select("lsh_bucket").distinct().toPandas()["lsh_bucket"]]
        )
    ).count() == 50


def test_token_stats_and_quality(docs):
    ts = token_stats(docs, text_col="content").toPandas().set_index("doc_id")
    assert ts.loc[0, "n_tokens"] == 9
    assert ts.loc[0, "n_distinct_tokens"] == 8  # 'the' twice
    assert ts.loc[5, "n_tokens"] == 0
    q = quality_score(docs, text_col="content").toPandas().set_index("doc_id")
    assert q.loc[5, "quality"] == 0.0
    assert q.loc[0, "quality"] > q.loc[5, "quality"]
    assert 0.0 <= q["quality"].max() <= 1.0


def test_language_id(docs):
    lid = language_id(docs, text_col="content").toPandas().set_index("doc_id")
    assert lid.loc[0, "lang_guess"] == "en"
    assert lid.loc[3, "lang_guess"] == "de"
    assert lid.loc[5, "lang_guess"] == "und"


def test_doc_fingerprint_dups_match(docs):
    fp = doc_fingerprint(docs, text_col="content").toPandas().set_index("doc_id")
    assert fp.loc[0, "fp_min"] == fp.loc[1, "fp_min"]
    assert fp.loc[0, "fp_max"] == fp.loc[1, "fp_max"]
    assert fp.loc[0, "n_distinct_terms"] == 8


def test_real_image_and_audio_decoders():
    """Pure-numpy PPM/BMP/WAV decoders parse real payloads exactly."""
    import numpy as np

    from ckanext_extractor_spark.functions.multimodal import (
        _decode_bmp,
        _decode_ppm,
        _decode_wav,
        _grid_embedding,
        make_ppm,
        make_wav,
    )

    w, h, gray = _decode_ppm(make_ppm(20, 9, seed=3))
    assert (w, h) == (20, 9) and gray.shape == (9, 20)
    emb = _grid_embedding(gray)
    assert emb.shape == (16,) and abs(float(np.linalg.norm(emb)) - 1) < 1e-5
    n, rate = _decode_wav(make_wav(1234, 8000, seed=1))
    assert (n, rate) == (1234, 8000)
    # minimal 24-bit BMP, 2x2, bottom-up
    import struct

    px_rows = bytes([255, 0, 0, 0, 255, 0, 0, 0]) + bytes(
        [0, 0, 255, 10, 10, 10, 0, 0]
    )  # 2 rows, stride 8 (2*3 padded to 8)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(px_rows), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px_rows),
                         0, 0, 0, 0) + px_rows)
    w, h, gray = _decode_bmp(bmp)
    assert (w, h) == (2, 2) and gray.shape == (2, 2)
    # unknown format -> None (falls back to the declared fake)
    assert _decode_ppm(b"\x89PNG....") is None
    assert _decode_wav(b"\x89PNG....") is None


def test_multimodal_features_and_frames(spark):
    media = synthetic_media(spark, 24)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == 24
    assert (feats["n_bytes"] > 0).all()
    assert feats["embedding"].map(len).eq(16).all()
    # real decoders ran: image dims match the generated PPM headers and
    # audio rows carry (sample_rate, n_samples)
    imgs = feats[feats["kind"] == "image"].set_index("media_id")
    for mid in imgs.index:
        assert imgs.loc[mid, "width"] == 16 + mid % 13
        assert imgs.loc[mid, "height"] == 12 + mid % 7
    auds = feats[feats["kind"] == "audio"].set_index("media_id")
    for mid in auds.index:
        assert auds.loc[mid, "width"] == 8000 + 100 * (mid % 5)
        assert auds.loc[mid, "n_frames"] == 800 + 37 * mid
    # deterministic: same payload -> same sha/embedding
    feats2 = extract_media_features(media).toPandas()
    assert feats.sort_values("media_id")["sha256"].tolist() == \
        feats2.sort_values("media_id")["sha256"].tolist()
    frames = frame_sample_plan(media, every_n=5).toPandas()
    vids = feats[feats["kind"] == "video"]
    assert set(frames["media_id"]) <= set(vids["media_id"])
    assert (frames["frame_idx"] % 5 == 0).all()
