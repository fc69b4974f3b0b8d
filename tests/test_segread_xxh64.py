"""Optimization r6 pins: the driver-side pyarrow read path must return
exactly the rows the Spark read returned, and the pure-python XXH64 must
equal the JVM expression (a mismatch would prune the wrong bucket and
silently drop a term's postings)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.analysis.xxh64 import xxh64, xxh64_str


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from ckanext_extractor_spark.api import ExtractorEngine
    from ckanext_extractor_spark.corpus import corpus_df

    root = str(tmp_path_factory.mktemp("segread_idx"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=100_000)
    eng.extract(corpus_df(spark, 300), build_id="segread")
    return eng


def test_xxh64_matches_jvm(spark):
    random.seed(11)
    samples = [
        "spark", "", "a", "x" * 31, "y" * 32, "z" * 33, "w" * 64,
        "naïve", "日本語", "mix🙂ed",
    ] + [
        "".join(
            random.choice(string.printable[:94] + "äöüßéあ漢")
            for _ in range(random.randint(0, 70))
        )
        for _ in range(150)
    ]
    got = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in samples], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    for s in set(samples):
        assert xxh64_str(s) == got[s], repr(s)


def test_xxh64_signed_range():
    # at least one sample must exercise the negative (top-bit) half
    vals = [xxh64(str(i).encode()) for i in range(64)]
    assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
    assert all(-(1 << 63) <= v < (1 << 63) for v in vals)


def _canon(rows):
    out = []
    for r in rows:
        out.append(
            (
                r["term"],
                int(r["gen_seq"]),
                int(r["n_postings"]),
                bytes(r["blob"]),
                tuple(r["block_last_doc"]),
                tuple(r["block_max_tfn"]),
                tuple(r["block_offs"]) if r["block_offs"] is not None else None,
            )
        )
    return sorted(out)


def test_pyarrow_rows_match_spark_collect(engine):
    terms = ["data", "spark", "value", "golden000777x", "nosuchterm"]
    # pyarrow path (the default on a local root)
    assert engine.fs.is_local
    local = engine._local_segment_rows(terms)
    # spark path, forced
    seg = engine._segments_union(terms)
    spark_rows = seg.collect() if seg is not None else []
    assert _canon(local) == _canon(spark_rows)
    assert len(local) > 0


def test_pyarrow_full_scan_matches_spark(engine):
    local = engine._local_segment_rows(None)
    spark_rows = engine._segments_union().collect()
    assert len(local) == len(spark_rows)
    assert _canon(local) == _canon(spark_rows)


def test_fetch_rows_grouping(engine):
    got = engine._fetch_rows(["data", "nosuchterm"])
    assert set(got) >= {"data", "nosuchterm"}
    assert got["nosuchterm"] == []
    assert all(r["term"] == "data" for r in got["data"])


def test_df_for_terms_local_matches_spark(engine, monkeypatch):
    terms = ["data", "spark", "value"]
    local = engine._df_for_terms(terms)
    # force the Spark branch (a non-local root returns None here)
    monkeypatch.setattr(
        engine, "_local_segment_rows", lambda *a, **k: None
    )
    via_spark = engine._df_for_terms(terms)
    assert local == via_spark
