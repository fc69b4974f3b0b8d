"""Passage retrieval (chunk-level BM25 + per-doc collapse) and the
count-min sketch family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.passage import passage_topk
from ckanext_extractor_spark.functions.sketch import (
    cms_build,
    cms_merge,
    cms_query,
)


def _docs(spark):
    rows = [
        # doc 0: alpha in both windows (size 4), heavier in the second
        (0, "alpha x x x alpha alpha x x"),
        (1, "alpha x x x x x x x"),
        (2, "x x x x x x x x"),
        (3, "alpha beta x x"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_passage(rows, terms, size, per_doc):
    """Pure-python reference (stride = size, overlap 0)."""
    chunks = []
    for d, text in rows:
        toks = [t for t in text.lower().split() if t]
        for ci, s in enumerate(range(0, len(toks), size)):
            win = toks[s:s + size]
            chunks.append((d, ci, win))
    n = len(chunks)
    avgdl = sum(len(w) for _, _, w in chunks) / n
    dfs = {
        t: sum(1 for _, _, w in chunks if t in w) for t in terms
    }
    scored = []
    for d, ci, w in chunks:
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl)
            )
        if s > 0:
            scored.append((d, ci, len(w), round(s, 4)))
    best = {}
    for d, ci, nt, s in sorted(
        scored, key=lambda x: (x[0], -round(x[3], 6), x[1])
    ):
        best.setdefault(d, []).append((d, ci, nt, s))
    kept = [r for v in best.values() for r in v[:per_doc]]
    kept.sort(key=lambda x: (-round(x[3], 6), x[0], x[1]))
    return kept


def test_passage_matches_python_reference(spark):
    docs = _docs(spark)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _py_passage(rows, ["alpha"], size=4, per_doc=1)
    got = [
        tuple(r)
        for r in passage_topk(docs, ["alpha"], size=4, k=10,
                              per_doc=1).collect()
    ]
    assert got == [tuple(w) for w in want]
    # doc 0's best passage is its SECOND window (3x alpha)
    assert got[0][0] == 0 and got[0][1] == 1


def test_passage_per_doc_collapse(spark):
    docs = _docs(spark)
    one = passage_topk(docs, ["alpha"], size=4, k=10, per_doc=1).collect()
    assert len([r for r in one if r["doc_id"] == 0]) == 1
    two = passage_topk(docs, ["alpha"], size=4, k=10, per_doc=2).collect()
    assert len([r for r in two if r["doc_id"] == 0]) == 2
    # non-matching docs never appear
    assert all(r["doc_id"] != 2 for r in two)


def test_passage_overlap_windows(spark):
    docs = spark.createDataFrame(
        [(0, "a b alpha c d")], "doc_id long, text string"
    )
    # size 4, overlap 2 -> windows start at 0 and 2: alpha in both
    got = passage_topk(docs, ["alpha"], size=4, overlap=2, k=10,
                       per_doc=10).collect()
    # windows [a b alpha c], [alpha c d], [d]: alpha in the first two;
    # the shorter window scores higher (same tf, smaller dl)
    assert [r["chunk_id"] for r in got] == [1, 0]


def test_passage_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        passage_topk(docs, [], size=4)
    with pytest.raises(ValueError):
        passage_topk(docs, ["a"], size=4, k=0)
    with pytest.raises(ValueError):
        passage_topk(docs, ["a"], size=4, per_doc=0)
    with pytest.raises(ValueError):
        passage_topk(docs, [""], size=4)


def test_cms_overestimates_and_exact_without_collisions(spark):
    docs = _docs(spark)
    sk = cms_build(docs, width=1024, depth=3)
    exact = {
        r["t"]: r["count"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        ).groupBy("t").count().collect()
    }
    est = {
        r["term"]: r["est"]
        for r in cms_query(sk, ["alpha", "beta", "x", "nope"],
                           width=1024, depth=3).collect()
    }
    for t in ("alpha", "beta", "x"):
        assert est[t] >= exact[t]  # count-min never undercounts
    # 4 distinct terms in a 1024-wide row: collisions absent -> exact
    assert est["alpha"] == exact["alpha"]
    assert est["nope"] == 0


def test_cms_partitioning_invariance(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, cms_build(docs, width=64, depth=2).collect()))
    b = sorted(map(tuple, cms_build(
        docs.repartition(7), width=64, depth=2).collect()))
    assert a == b


def test_cms_merge_adds(spark):
    docs = _docs(spark)
    sk = cms_build(docs, width=256, depth=2)
    twice = cms_merge(sk, sk)
    one = {r["term"]: r["est"]
           for r in cms_query(sk, ["alpha"], 256, 2).collect()}
    two = {r["term"]: r["est"]
           for r in cms_query(twice, ["alpha"], 256, 2).collect()}
    assert two["alpha"] == 2 * one["alpha"]


def test_cms_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        cms_build(docs, width=0)
    with pytest.raises(ValueError):
        cms_build(docs, depth=0)
    sk = cms_build(docs, width=64, depth=2)
    with pytest.raises(ValueError):
        cms_query(sk, [], 64, 2)
    with pytest.raises(ValueError):
        cms_merge()


def test_cli_passage_and_cms(spark, tmp_path, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    src = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(src)
    s = run("pipeline", "passage", "--in", src, "--terms", "alpha",
            "--size", "4", "--k", "10")
    assert s["rows_out"] > 0
    assert set(s["columns"]) == {"doc_id", "chunk_id", "n_tokens",
                                 "score"}
    sk = str(tmp_path / "sk.parquet")
    run("pipeline", "cms-build", "--in", src, "--width", "128",
        "--depth", "2", "--out", sk)
    s2 = run("pipeline", "cms-query", "--in", sk, "--terms",
             "alpha,nope", "--width", "128", "--depth", "2")
    assert s2["rows_out"] == 2
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["pipeline", "passage", "--in", src])
    with _pt.raises(SystemExit):
        main(["pipeline", "cms-query", "--in", sk])


# ------------------------------------------------------- HLL / Bloom


def _h60py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hll_registers_match_python(spark):
    docs = _docs(spark)
    p = 6
    got = {r["register"]: r["max_rho"]
           for r in __import__("ckanext_extractor_spark.functions.sketch",
                               fromlist=["hll_registers"])
           .hll_registers(docs, p=p).collect()}
    want = {}
    toks = []
    for r in docs.collect():
        toks += [t for t in r["text"].lower().split() if t]
    for t in set(toks):
        h = _h60py(t)
        reg, w = h % (1 << p), h >> p
        rho = (60 - p) - (w.bit_length() - 1) if w > 0 else 60 - p + 1
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want


def test_hll_estimate_accuracy_and_small_range(spark):
    import math

    from ckanext_extractor_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
    )

    # 2000 distinct tokens, p=9 -> relative error ~1.04/sqrt(512) ≈ 4.6%
    big = spark.range(2000).selectExpr(
        "concat('tok', id) AS text"
    )
    est = hll_estimate(hll_registers(big, p=9), p=9).collect()[0]
    assert abs(est["estimate"] - 2000) / 2000 < 0.15
    # tiny corpus -> linear counting: estimate == m * ln(m / n_empty)
    small = _docs(spark)
    row = hll_estimate(hll_registers(small, p=9), p=9).collect()[0]
    m, v = row["m"], row["n_empty"]
    assert v > 0
    assert row["estimate"] == round(m * math.log(m / v), 4)


def test_hll_merge_is_register_max(spark):
    from pyspark.sql import functions as F

    from ckanext_extractor_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
    )

    docs = _docs(spark)
    a = hll_registers(docs.where("doc_id < 2"), p=8)
    b = hll_registers(docs.where("doc_id >= 2"), p=8)
    merged = a.unionByName(b).groupBy("register").agg(
        F.max("max_rho").cast("int").alias("max_rho"))
    whole = hll_registers(docs, p=8)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    assert hll_estimate(merged, p=8).collect() == \
        hll_estimate(whole, p=8).collect()


def test_hll_validation(spark):
    from ckanext_extractor_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
    )

    docs = _docs(spark)
    with pytest.raises(ValueError):
        hll_registers(docs, p=3)
    with pytest.raises(ValueError):
        hll_estimate(hll_registers(docs, p=8), p=19)


def test_bloom_no_false_negatives_and_python_parity(spark):
    from ckanext_extractor_spark.functions.sketch import (
        bloom_build,
        bloom_query,
    )

    docs = _docs(spark)
    m_bits, kh = 256, 3
    bl = bloom_build(docs, m_bits=m_bits, k_hashes=kh)
    bits = {r["bit"] for r in bl.collect()}
    toks = set()
    for r in docs.collect():
        toks |= {t for t in r["text"].lower().split() if t}
    want_bits = {
        _h60py(f"bf{i}#{t}") % m_bits for t in toks for i in range(kh)
    }
    assert bits == want_bits
    got = {r["term"]: r["maybe_present"]
           for r in bloom_query(bl, sorted(toks) + ["nope1", "nope2"],
                                m_bits, kh).collect()}
    for t in toks:
        assert got[t] is True  # never a false negative
    for t in ("nope1", "nope2"):
        want = all(
            _h60py(f"bf{i}#{t}") % m_bits in bits for i in range(kh)
        )
        assert got[t] is want  # matches the exact bit test


def test_bloom_merge_is_union(spark):
    from ckanext_extractor_spark.functions.sketch import bloom_build

    docs = _docs(spark)
    a = bloom_build(docs.where("doc_id < 2"), m_bits=128, k_hashes=2)
    b = bloom_build(docs.where("doc_id >= 2"), m_bits=128, k_hashes=2)
    merged = a.unionByName(b).distinct()
    whole = bloom_build(docs, m_bits=128, k_hashes=2)
    assert sorted(r["bit"] for r in merged.collect()) == \
        sorted(r["bit"] for r in whole.collect())


def test_cli_hll_and_bloom(spark, tmp_path, capsys):
    import json

    from ckanext_extractor_spark.cli.main import main

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    src = str(tmp_path / "d2.parquet")
    _docs(spark).write.parquet(src)
    s = run("pipeline", "hll", "--in", src, "--hll-p", "8")
    assert s["rows_out"] == 1
    assert set(s["columns"]) == {"m", "n_empty", "estimate"}
    bl = str(tmp_path / "bl.parquet")
    run("pipeline", "bloom-build", "--in", src, "--m-bits", "256",
        "--k-hashes", "2", "--out", bl)
    s2 = run("pipeline", "bloom-query", "--in", bl, "--terms",
             "alpha,nope", "--m-bits", "256", "--k-hashes", "2")
    assert s2["rows_out"] == 2
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["pipeline", "bloom-query", "--in", bl])
