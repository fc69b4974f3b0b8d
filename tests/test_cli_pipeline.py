"""CLI `pipeline` subcommand: the training-data function family driven
end-to-end from the command line (parquet in -> parquet out + JSON
summary), so a pipeline user never has to write Spark code."""

from __future__ import annotations

import json

import pytest

from ckanext_extractor_spark.cli.main import main


@pytest.fixture(scope="module")
def docs_pq(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plcli") / "docs.parquet")
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "email me at a@b.com please"),
        (3, ""),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(p)
    return p


@pytest.fixture(scope="module")
def emb_pq(spark, tmp_path_factory):
    import numpy as np

    p = str(tmp_path_factory.mktemp("plcli") / "emb.parquet")
    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(20, 8)).tolist()
    vecs[7] = [v + 1e-4 for v in vecs[3]]  # planted near-dup of 3
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).write.parquet(p)
    return p


def _run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_pipeline_exact_dedup(docs_pq, capsys, tmp_path):
    out = str(tmp_path / "o1")
    s = _run(capsys, "pipeline", "exact-dedup", "--in", docs_pq,
             "--out", out)
    # docs 0 and 1 are identical -> 3 content groups from 4 docs
    assert s["rows_in"] == 4 and s["rows_out"] == 3
    assert set(s["columns"]) == {"content_hash", "group_size",
                                 "keeper_doc_id"}


def test_pipeline_tfidf_and_split(docs_pq, capsys, tmp_path, spark):
    s = _run(capsys, "pipeline", "tfidf", "--in", docs_pq,
             "--dim", "32")
    assert s["rows_out"] > 0 and set(s["columns"]) == \
        {"doc_id", "bucket", "weight"}
    out = str(tmp_path / "split")
    s2 = _run(capsys, "pipeline", "split", "--in", docs_pq,
              "--out", out, "--test-frac", "0.5")
    assert s2["rows_out"] == 4
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "text", "split"}
    assert {r["split"] for r in got.collect()} <= {"train", "test"}


def test_pipeline_semdedup(emb_pq, capsys):
    s = _run(capsys, "pipeline", "semdedup", "--in", emb_pq,
             "--id-col", "vec_id", "--n-clusters", "2",
             "--threshold", "0.99")
    assert s["rows_out"] == 20
    assert set(s["columns"]) == {"vec_id", "cluster_id", "is_dup"}


def test_pipeline_semdedup_kmeans_and_flag_guards(emb_pq, capsys):
    # k-means sketch path (ADVICE r4 #1 follow-up: --id-col/--vec-col
    # honored; --kmeans-rounds drives the sampled-Lloyd quantizer)
    s = _run(capsys, "pipeline", "semdedup", "--in", emb_pq,
             "--id-col", "vec_id", "--vec-col", "embedding",
             "--n-clusters", "2", "--threshold", "0.99",
             "--kmeans-rounds", "1")
    assert s["rows_out"] == 20
    assert set(s["columns"]) == {"vec_id", "cluster_id", "is_dup"}
    # --text-col on an embeddings-shaped op is a loud error, not a
    # silent drop
    import pytest

    with pytest.raises(SystemExit):
        main(["pipeline", "semdedup", "--in", emb_pq,
              "--text-col", "text"])
    capsys.readouterr()


def test_pipeline_pii_and_boilerplate(docs_pq, capsys):
    s = _run(capsys, "pipeline", "pii-scrub", "--in", docs_pq)
    assert s["rows_out"] == 4
    s2 = _run(capsys, "pipeline", "boilerplate", "--in", docs_pq,
              "--size", "4", "--min-docs", "2")
    assert s2["rows_out"] == 4  # every doc present, dups cleaned


def test_pipeline_decontaminate(docs_pq, capsys, tmp_path, spark):
    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(100, "quick brown fox jumps over")],
        "doc_id long, text string",
    ).write.parquet(bench)
    s = _run(capsys, "pipeline", "decontaminate", "--in", docs_pq,
             "--bench", bench, "--ngram", "3")
    # docs 0 and 1 share 3-grams with the benchmark -> dropped
    assert s["rows_in"] == 4 and s["rows_out"] == 2
    with pytest.raises(SystemExit):
        main(["pipeline", "decontaminate", "--in", docs_pq])


def test_pipeline_bad_op_rejected(docs_pq):
    with pytest.raises(SystemExit):
        main(["pipeline", "no-such-op", "--in", docs_pq])


def test_pipeline_winnow_and_candidates(docs_pq, capsys):
    s = _run(capsys, "pipeline", "winnow", "--in", docs_pq,
             "--gram-k", "3", "--window-w", "2")
    # docs 0/1 (9 tokens, k=3 -> 7 grams) fingerprint; 2 has 5 tokens
    # -> 3 grams; 3 is empty -> nothing
    assert s["rows_in"] == 4 and s["rows_out"] > 0
    assert set(s["columns"]) == {"doc_id", "pos", "fp"}
    s2 = _run(capsys, "pipeline", "fp-candidates", "--in", docs_pq,
              "--gram-k", "3", "--window-w", "2", "--min-shared", "1")
    # identical docs 0 and 1 share every fingerprint
    assert s2["rows_out"] == 1
    assert set(s2["columns"]) == {"id_a", "id_b", "n_shared"}


def test_pipeline_bigram_ppl_and_group_quota(docs_pq, capsys, spark,
                                             tmp_path):
    s = _run(capsys, "pipeline", "bigram-ppl", "--in", docs_pq,
             "--lam", "0.5")
    assert s["rows_in"] == 4 and s["rows_out"] == 4
    assert set(s["columns"]) == {"doc_id", "n_tokens", "mean_bits",
                                 "ppl"}
    grp = str(tmp_path / "grp.parquet")
    spark.createDataFrame(
        [(i, f"h{i % 2}") for i in range(10)],
        "doc_id long, source string",
    ).write.parquet(grp)
    s2 = _run(capsys, "pipeline", "group-quota", "--in", grp,
              "--group-col", "source", "--n-per-group", "3")
    assert s2["rows_in"] == 10 and s2["rows_out"] == 6
    with pytest.raises(SystemExit):
        main(["pipeline", "group-quota", "--in", grp])


def test_pipeline_pmi(docs_pq, capsys):
    s = _run(capsys, "pipeline", "pmi", "--in", docs_pq,
             "--min-df", "1", "--min-shared", "1", "--topk", "5")
    assert s["rows_in"] == 4 and 0 < s["rows_out"] <= 5
    assert set(s["columns"]) == {"term_a", "term_b", "pair_count",
                                 "df_a", "df_b", "pmi"}


def test_pipeline_dsir(docs_pq, capsys, spark, tmp_path):
    tgt = str(tmp_path / "tgt.parquet")
    spark.createDataFrame(
        [(0, "quick brown fox")], "doc_id long, text string"
    ).write.parquet(tgt)
    s = _run(capsys, "pipeline", "dsir-weights", "--in", docs_pq,
             "--target", tgt, "--dim", "64")
    assert s["rows_in"] == 4 and s["rows_out"] == 4
    assert set(s["columns"]) == {"doc_id", "weight"}
    s2 = _run(capsys, "pipeline", "dsir-select", "--in", docs_pq,
              "--target-where", "doc_id = 2", "--dim", "64",
              "--n-select", "2")
    assert s2["rows_out"] == 2
    assert set(s2["columns"]) == {"doc_id", "weight", "key"}
    with pytest.raises(SystemExit):
        main(["pipeline", "dsir-select", "--in", docs_pq])


def test_pipeline_rrf_fuse(capsys, spark, tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(1, 9.0), (2, 5.0)], "doc_id long, score double"
    ).write.parquet(a)
    spark.createDataFrame(
        [(2, 0.9), (3, 0.7)], "doc_id long, score double"
    ).write.parquet(b)
    s = _run(capsys, "pipeline", "rrf-fuse", "--in", a,
             "--second", b, "--topk", "3", "--rrf-k", "10")
    assert s["rows_out"] == 3
    assert set(s["columns"]) == {"doc_id", "rrf_score", "n_lists"}
    with pytest.raises(SystemExit):
        main(["pipeline", "rrf-fuse", "--in", a])
    with pytest.raises(SystemExit):
        main(["pipeline", "rrf-fuse", "--in", a, "--second", b,
              "--text-col", "text"])
