"""Fifth self-review pass (r5 session 2) regression pins:

1. pmi_pairs only FORCES a broadcast of the banded dictionary when
   max_df bounds it; unbounded bands are left to AQE.
2. pmi_pairs constructs its plan lazily — no driver action (count)
   fires until the caller materializes the result.
3. pipeline rrf-fuse without --topk emits the FULL fused list (it used
   to silently cap at 10).
4. query --span-not rejects contradictory --span-near / --unordered
   instead of silently ignoring them.
"""

from __future__ import annotations

import json

import pytest

from ckanext_extractor_spark.functions.cooccur import pmi_pairs


def _pmi_docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "alpha beta"),
        (3, "gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pmi_broadcast_hint_only_with_max_df(spark):
    docs = _pmi_docs(spark)
    unbounded = pmi_pairs(docs, min_df=1, min_pair_count=1)
    bounded = pmi_pairs(docs, min_df=1, max_df=100, min_pair_count=1)
    # the 1-row N fold is always one broadcast hint; the BAND hint
    # must appear only when max_df bounds the dictionary (it shows up
    # on both sides of the self-join, so bounded = 1 + 2)
    plan_u = unbounded._jdf.queryExecution().analyzed().toString()
    plan_b = bounded._jdf.queryExecution().analyzed().toString()
    assert plan_u.count("ResolvedHint") == 1
    assert plan_b.count("ResolvedHint") == 3
    # and the results agree when the ceiling doesn't bite
    assert sorted(map(tuple, unbounded.collect())) == \
        sorted(map(tuple, bounded.collect()))


def test_pmi_plan_construction_is_lazy(spark, monkeypatch):
    from pyspark.sql import DataFrame as SDF

    docs = _pmi_docs(spark)

    def boom(self):
        raise AssertionError("eager driver action during pmi_pairs()")

    monkeypatch.setattr(SDF, "count", boom)
    monkeypatch.setattr(SDF, "collect", boom)
    out = pmi_pairs(docs, min_df=1, min_pair_count=1)  # must not raise
    monkeypatch.undo()
    rows = out.collect()
    assert rows and all(r["pmi"] is not None for r in rows)


def test_cli_rrf_fuse_full_list_without_topk(spark, tmp_path, capsys):
    from ckanext_extractor_spark.cli.main import main

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(i, float(100 - i)) for i in range(15)],
        "doc_id long, score double",
    ).write.parquet(a)
    spark.createDataFrame(
        [(i + 10, float(50 - i)) for i in range(15)],
        "doc_id long, score double",
    ).write.parquet(b)
    assert main(["pipeline", "rrf-fuse", "--in", a, "--second", b]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_out"] == 25  # 15 + 15 with 5 overlapping ids — no cap


def test_cli_span_flag_conflicts_rejected(spark, tmp_path):
    from ckanext_extractor_spark.api import ExtractorEngine
    from ckanext_extractor_spark.cli.main import main

    root = str(tmp_path / "idx")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)
    eng.extract(
        spark.createDataFrame(
            [("r", "p0", "c0", "python", "alpha beta")],
            "repo string, path string, commit string, lang string, "
            "content string",
        ),
        build_id="b",
    )
    with pytest.raises(SystemExit):
        main(["query", "--index", root, "--q", "alpha beta",
              "--span-not", "gamma", "--span-near", "--buckets", "8"])
    with pytest.raises(SystemExit):
        main(["query", "--index", root, "--q", "alpha beta",
              "--span-not", "gamma", "--unordered", "--buckets", "8"])
