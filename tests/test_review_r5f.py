"""Sixth self-review pass regression pins (session-2 surfaces):

1. hll_estimate on an empty corpus returns 0.0, not NULL.
2. cms_build / bloom_build scan the source exactly ONCE (a union of
   per-hash-row selects used to re-scan and re-tokenize depth times).
3. hybrid_search dedupes duplicate ids in the dense list (keep-best)
   and raises ValidationError (not bare TypeError) on junk scores.
4. CLI `build --store-content` against an existing index built
   without it fails loudly instead of silently dropping the flag.
5. bloom shape errors name m_bits/k_hashes, not width/depth.
"""

from __future__ import annotations

import pytest

from ckanext_extractor_spark.functions.sketch import (
    bloom_build,
    cms_build,
    hll_estimate,
    hll_registers,
)


def test_hll_empty_corpus_estimates_zero(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = hll_estimate(hll_registers(empty, p=8), p=8).collect()[0]
    assert row["estimate"] == 0.0 and row["n_empty"] == 256
    # all-empty-text corpora too
    blank = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = hll_estimate(hll_registers(blank, p=8), p=8).collect()[0]
    assert row["estimate"] == 0.0


def _scan_count(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return plan.count("LogicalRDD") + plan.count("Relation [")


def test_sketch_builds_scan_source_once(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "c d")], "doc_id long, text string"
    )
    assert _scan_count(cms_build(docs, width=64, depth=3)) == 1
    assert _scan_count(bloom_build(docs, m_bits=64, k_hashes=3)) == 1


def test_bloom_validation_names_its_parameters(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(docs, m_bits=0)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(docs, k_hashes=0)


def test_hybrid_dense_duplicates_keep_best(spark, tmp_path_factory):
    from ckanext_extractor_spark.api import ExtractorEngine, ValidationError

    root = str(tmp_path_factory.mktemp("hybdup"))
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(
        spark.createDataFrame(
            [("r", "p0", "c0", "python", "alpha beta")],
            "repo string, path string, commit string, lang string, "
            "content string",
        ),
        build_id="b",
    )
    # duplicate id 7 must contribute ONE rank (its best), not two
    got = dict(eng.hybrid_search("alpha", [(7, 0.9), (7, 0.5)], k=10))
    assert got[7] == round(1 / 61, 6)
    with pytest.raises(ValidationError):
        eng.hybrid_search("alpha", [(7, "high")], k=5)
    with pytest.raises(ValidationError):
        eng.hybrid_search("alpha", [(7, 1.0)], k=5,
                          dense_weight="heavy")


def test_cli_store_content_conflict_rejected(spark, tmp_path, capsys):
    from ckanext_extractor_spark.cli.main import main

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [("r", "p0", "c0", "python", "alpha beta")],
        "repo string, path string, commit string, lang string, "
        "content string",
    ).write.parquet(src)
    root = str(tmp_path / "idx")
    assert main(["build", "--source", src, "--index", root,
                 "--format", "parquet", "--buckets", "8"]) == 0
    capsys.readouterr()
    with pytest.raises(SystemExit, match="store-content"):
        main(["build", "--source", src, "--index", root,
              "--format", "parquet", "--buckets", "8",
              "--store-content"])
