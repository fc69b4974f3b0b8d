"""Round-5 fourth self-review pass (code-review findings over
streaming/, sources/, cli/, fsio.py — each fixed):

1. stream_incremental_build committed micro-batches whose extract()
   was declined by the build lock (BuildReport.in_progress) — the
   checkpoint then marked those files ingested FOREVER. The epoch now
   fails (raises) so the stream retries after the lock clears.
2. Fresh streams (no checkpoint) clear a leftover sink dir: epoch
   numbering restarts at 0, so an abandoned run's epochs would
   survive the per-epoch overwrites and pollute the read-back
   (duplicate dedup keys / stale latest totals).
3. session_event_stats adds a watermark on streaming frames (Spark
   requires one for streaming session_window aggregation).
4. read_corpus(fmt='parquet') skips the iceberg/catalog probes, so a
   temp view sharing the path's name cannot shadow the parquet data.
5. CLI: --bf + --boost now errors (the old `bf or boost` applied bf
   multiplicatively and dropped boost); --snippets with an
   early-returning variant (--group/--sort/...) errors instead of
   silently printing unhighlighted output.
6. fsio: remote read_text fetches the file in ONE JVM call; remote
   write_text_atomic uses FileContext.rename(OVERWRITE) (atomic on
   HDFS) instead of delete-then-rename. Both are URI-scheme-gated and
   fall back to the old behavior — not coverable on a local-only CI,
   pinned here by the local path staying byte-identical.
"""

from __future__ import annotations

import os

import pytest

from ckanext_extractor_spark.streaming.windows import EVENTS_SCHEMA  # noqa
from tests.test_streaming_windows import _write_events, _ts


def _write_docs(path, rows, mtime):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["t"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_incremental_build_fails_epoch_when_lock_held(spark, tmp_path):
    from pyspark.errors import StreamingQueryException

    from ckanext_extractor_spark.api import BuildReport, ExtractorEngine
    from ckanext_extractor_spark.streaming.incremental import (
        stream_incremental_build,
    )

    eng = ExtractorEngine(spark, str(tmp_path / "idx"), n_buckets=4)
    src = tmp_path / "src"
    src.mkdir()
    # the file source lists plain files, not nested Spark-write dirs
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "repo": pa.array(["r"]), "path": pa.array(["p0"]),
            "commit": pa.array(["c"]), "lang": pa.array(["text"]),
            "content": pa.array(["alpha beta"]),
        }),
        str(src / "b0.parquet"),
    )

    declined = BuildReport("locked", in_progress=True)
    real_extract = eng.extract
    eng.extract = lambda *a, **k: declined  # lock-held simulation
    with pytest.raises(StreamingQueryException):
        stream_incremental_build(
            spark, eng, str(src), checkpoint_dir=str(tmp_path / "ckpt")
        )
    # the epoch FAILED -> the checkpoint must not have committed it:
    # the retry (lock released) indexes the batch
    eng.extract = real_extract
    reports = stream_incremental_build(
        spark, eng, str(src), checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert sum(r.n_indexed for r in reports) == 1
    assert len(eng.search("alpha", k=5)) == 1


def test_fresh_stream_clears_stale_sink(spark, tmp_path):
    from ckanext_extractor_spark.streaming.dedup import (
        stream_dedup_documents,
    )

    src1 = tmp_path / "src1"
    src1.mkdir()
    _write_docs(str(src1 / "a.parquet"), [(1, "old text")], 1_000_000)
    out = stream_dedup_documents(
        spark, str(src1), checkpoint_dir=str(tmp_path / "ck1"),
        out_dir=str(tmp_path / "out"),
    )
    assert out.count() == 1
    # NEW checkpoint, SAME out_dir: the old run's epoch=0 must not
    # leak into the fresh run's read-back
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write_docs(str(src2 / "b.parquet"), [(7, "new text")], 2_000_000)
    out2 = stream_dedup_documents(
        spark, str(src2), checkpoint_dir=str(tmp_path / "ck2"),
        out_dir=str(tmp_path / "out"),
    )
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7


def test_session_stats_runs_on_streaming_frame(spark, tmp_path):
    from ckanext_extractor_spark.streaming.windows import (
        session_event_stats,
    )

    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        str(src / "e.parquet"),
        [(1, _ts(9, 0), 1, "view", 1.0), (2, _ts(9, 10), 1, "view", 2.0)],
        1_000_000,
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    agg = session_event_stats(stream, gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sessq")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessq").collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_read_corpus_parquet_ignores_shadowing_view(spark):
    # a RELATIVE source name that is also a valid view identifier —
    # the shadowing case the probe order made possible. Relative Spark
    # paths resolve against the JVM's cwd (chdir in python has no
    # effect), so write with overwrite and clean up explicitly.
    import shutil

    from ckanext_extractor_spark.sources.corpus_source import read_corpus

    name = "corpus_shadow_t"
    try:
        spark.createDataFrame(
            [("r", "p0", "c", "text", "real parquet row")],
            "repo string, path string, commit string, lang string, "
            "content string",
        ).write.mode("overwrite").parquet(name)
        spark.createDataFrame(
            [("SHADOW", "x", "y", "z", "shadow row")],
            "repo string, path string, commit string, lang string, "
            "content string",
        ).createOrReplaceTempView(name)
        got = read_corpus(spark, name, fmt="parquet").collect()
        assert [r["repo"] for r in got] == ["r"]
        # auto mode still resolves the view first (documented order)
        auto = read_corpus(spark, name, fmt="auto").collect()
        assert [r["repo"] for r in auto] == ["SHADOW"]
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(name, ignore_errors=True)


def test_cli_bf_boost_conflict_and_snippets_guard(tmp_path):
    from ckanext_extractor_spark.cli.main import main

    with pytest.raises(SystemExit):
        main(["query", "--index", str(tmp_path / "i"), "--q", "x",
              "--bf", "recip(n-chars,1,1000,1000)", "--boost", "rank^2"])
    with pytest.raises(SystemExit):
        main(["query", "--index", str(tmp_path / "i"), "--q", "x",
              "--group", "lang", "--snippets"])
