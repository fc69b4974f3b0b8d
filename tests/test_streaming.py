"""availableNow streaming incremental build: Spark file checkpoint dedups
files; the sha manifest dedups docs (SURVEY.md §1.2 stretch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.corpus import corpus_pdf
from ckanext_extractor_spark.sources.corpus_source import CORPUS_SCHEMA
from ckanext_extractor_spark.streaming import stream_incremental_build


def test_stream_incremental_build(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "idx")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50)

    batch1 = spark.createDataFrame(corpus_pdf(30), CORPUS_SCHEMA)
    batch1.write.mode("append").parquet(src)
    reports1 = stream_incremental_build(spark, eng, src, ckpt)
    assert sum(r.status_counts.get("new", 0) for r in reports1) == 30
    assert eng.list_indexed().count() == 30

    # second run, nothing new -> no micro-batch at all (file checkpoint)
    reports2 = stream_incremental_build(spark, eng, src, ckpt)
    assert reports2 == []

    # add 10 more docs as a new file -> only those are processed
    batch2 = spark.createDataFrame(corpus_pdf(10, start=30), CORPUS_SCHEMA)
    batch2.write.mode("append").parquet(src)
    reports3 = stream_incremental_build(spark, eng, src, ckpt)
    assert sum(r.status_counts.get("new", 0) for r in reports3) == 10
    # earlier docs are untouched by this batch (not re-tokenized)
    assert all("unchanged" not in r.status_counts for r in reports3)
    assert eng.list_indexed().count() == 40

    # index remains searchable across batches
    assert len(eng.search("golden000035x", k=5)) == 1
    assert len(eng.search("golden000003x", k=5)) == 1
