"""Round-5 training-pipeline ops: interpolated bigram-LM perplexity
(functions/textstats.py:bigram_perplexity) and per-group quota capping
(functions/sampling.py:group_quota)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from ckanext_extractor_spark.functions.sampling import group_quota
from ckanext_extractor_spark.functions.textstats import bigram_perplexity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat"),
        (3, "   ...   "),        # 0 tokens -> pinned zeros
        (4, "mat"),              # 1 token -> unigram-only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_bigram_ppl(rows, lam):
    toks = {i: _tok(t) for i, t in rows}
    uni = Counter(w for ts in toks.values() for w in ts)
    total = sum(uni.values())
    bi = Counter(
        (ts[j], ts[j + 1])
        for ts in toks.values() for j in range(len(ts) - 1)
    )
    hist = Counter()
    for (p, _w), c in bi.items():
        hist[p] += c
    out = {}
    for i, ts in toks.items():
        if not ts:
            out[i] = (0, 0.0, 1.0)
            continue
        bits = [-math.log2(uni[ts[0]] / total)]
        for j in range(1, len(ts)):
            p_bi = bi[(ts[j - 1], ts[j])] / hist[ts[j - 1]]
            p_uni = uni[ts[j]] / total
            bits.append(-math.log2(lam * p_bi + (1 - lam) * p_uni))
        m = sum(bits) / len(bits)
        out[i] = (len(ts), round(m, 6), round(2.0 ** m, 4))
    return out


def test_bigram_ppl_matches_python_reference(docs):
    want = _py_bigram_ppl(
        [(r["doc_id"], r["text"]) for r in docs.collect()], lam=0.75
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_bits"], r["ppl"])
        for r in bigram_perplexity(docs, lam=0.75).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i
        assert got[i][2] == pytest.approx(want[i][2], rel=1e-5), i


def test_bigram_ppl_repetition_scores_low(spark):
    # a doc made of one repeated bigram must be the most predictable
    rows = [(0, "ab cd " * 30), (1, "q7 w8 e9 r1 t2 y3 u4 i5 o6 p0")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"] for r in bigram_perplexity(df).collect()}
    assert got[0] < got[1]


def test_bigram_ppl_lam_validation(docs):
    for bad in (-0.1, 1.1, True, "x", None):
        with pytest.raises((ValueError, TypeError)):
            bigram_perplexity(docs, lam=bad)


@pytest.fixture(scope="module")
def grouped(spark):
    rows = [(i, f"g{i % 3}") for i in range(60)] + [(100, "solo")]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _py_quota(rows, n, salt):
    by_g = {}
    for i, g in rows:
        key = hashlib.md5(f"{i}{salt}".encode()).hexdigest()
        by_g.setdefault(g, []).append((key, i))
    keep = set()
    for g, items in by_g.items():
        for _k, i in sorted(items)[:n]:
            keep.add(i)
    return keep


def test_group_quota_deterministic_cap(grouped):
    rows = [(r["doc_id"], r["source"]) for r in grouped.collect()]
    want = _py_quota(rows, 7, "s")
    out = group_quota(grouped, "source", 7, salt="s")
    got = {r["doc_id"] for r in out.collect()}
    assert got == want
    # per-group sizes: 3 groups of 20 capped at 7, solo passes through
    sizes = Counter(r["source"] for r in out.collect())
    assert sizes == {"g0": 7, "g1": 7, "g2": 7, "solo": 1}


def test_group_quota_under_quota_passthrough(grouped):
    out = group_quota(grouped, "source", 1000)
    assert out.count() == grouped.count()
    assert out.columns == grouped.columns  # helper column dropped


def test_group_quota_salt_redraws(grouped):
    a = {r["doc_id"] for r in
         group_quota(grouped, "source", 7, salt="s1").collect()}
    b = {r["doc_id"] for r in
         group_quota(grouped, "source", 7, salt="s2").collect()}
    assert a != b  # 7-of-20 three times: astronomically unlikely equal


def test_group_quota_validation(grouped):
    for bad in (0, -1, True, 1.5, None):
        with pytest.raises((ValueError, TypeError)):
            group_quota(grouped, "source", bad)


# -------------------------------------------------- temperature_mix


def _mix_docs(spark):
    # head group a: 64 rows, mid b: 16, tail c: 4 -> sqrt weights 8/4/2
    rows = [(i, "a") for i in range(64)]
    rows += [(100 + i, "b") for i in range(16)]
    rows += [(200 + i, "c") for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_mix_quotas_follow_alpha(spark):
    from ckanext_extractor_spark.functions.sampling import temperature_mix

    docs = _mix_docs(spark)
    # alpha=0.5: weights 8/4/2, sum 14; total=14 -> quotas 8/4/2
    out = temperature_mix(docs, "source", alpha=0.5, total=14)
    sizes = {r["source"]: r["count"]
             for r in out.groupBy("source").count().collect()}
    assert sizes == {"a": 8, "b": 4, "c": 2}
    # alpha=1: natural proportions 64/16/4 of 84 -> total=84 keeps all
    out1 = temperature_mix(docs, "source", alpha=1.0, total=84)
    s1 = {r["source"]: r["count"]
          for r in out1.groupBy("source").count().collect()}
    assert s1 == {"a": 64, "b": 16, "c": 4}
    # alpha=0: uniform thirds
    out0 = temperature_mix(docs, "source", alpha=0.0, total=9)
    s0 = {r["source"]: r["count"]
          for r in out0.groupBy("source").count().collect()}
    assert s0 == {"a": 3, "b": 3, "c": 3}


def test_temperature_mix_caps_at_group_size_no_redistribution(spark):
    from ckanext_extractor_spark.functions.sampling import temperature_mix

    docs = _mix_docs(spark)
    # total huge: tail group c (4 rows) caps at 4; no redistribution
    out = temperature_mix(docs, "source", alpha=0.5, total=1400)
    sizes = {r["source"]: r["count"]
             for r in out.groupBy("source").count().collect()}
    assert sizes["c"] == 4
    assert sizes["a"] == 64  # capped at count too (quota 800 > 64)


def test_temperature_mix_deterministic_and_salted(spark):
    from ckanext_extractor_spark.functions.sampling import temperature_mix

    docs = _mix_docs(spark)
    a = {r["doc_id"] for r in temperature_mix(
        docs, "source", total=14, salt="s").collect()}
    b = {r["doc_id"] for r in temperature_mix(
        docs.repartition(7), "source", total=14, salt="s").collect()}
    assert a == b  # partition-layout independent
    c = {r["doc_id"] for r in temperature_mix(
        docs, "source", total=14, salt="t").collect()}
    assert a != c  # salt redraws the in-group sample


def test_temperature_mix_validation(spark):
    from ckanext_extractor_spark.functions.sampling import temperature_mix

    docs = _mix_docs(spark)
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_mix(docs, "source", alpha=-0.1)
    with _pt.raises(ValueError):
        temperature_mix(docs, "source", total=0)


def test_cli_temperature_mix(spark, tmp_path, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    src = str(tmp_path / "mix.parquet")
    _mix_docs(spark).write.parquet(src)
    assert main(["pipeline", "temperature-mix", "--in", src,
                 "--group-col", "source", "--mix-alpha", "0.5",
                 "--total", "14"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_out"] == 14
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["pipeline", "temperature-mix", "--in", src])
