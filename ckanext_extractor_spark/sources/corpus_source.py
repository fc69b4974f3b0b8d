"""Corpus source connectors (SURVEY.md §2.1 S1/S5).

The reference pulls resource bytes over HTTP and pushes them through
Solr Cell/Tika (lib.py:33-52); for a source-code corpus the content is
already text in an Iceberg/Parquet table, so "ingest" is a table scan
with schema enforcement + optional lang pruning pushed into the scan.

Iceberg needs its runtime jar on the classpath; this container ships
without it, so `read_corpus` tries the Iceberg reader and falls back to
Parquet — the engine sees an identical DataFrame either way.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

REQUIRED_COLS = [f.name for f in CORPUS_SCHEMA.fields]


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    langs: Iterable[str] | None = None,
) -> DataFrame:
    """Load the corpus table.

    source: an Iceberg table identifier (catalog.db.table) or a
    parquet path. fmt: "iceberg" | "parquet" | "auto" (try table id
    first, then parquet path).
    """
    df = None
    if fmt == "parquet":
        # explicit format skips the iceberg/catalog probes: a temp view
        # or catalog table that happens to share the path's name must
        # not shadow the parquet data the caller asked for
        # (code-review r5 finding)
        df = spark.read.parquet(source)
    if df is None and fmt in ("auto", "iceberg"):
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception:
            if fmt == "iceberg":
                raise
    if df is None:
        try:
            df = spark.read.table(source)
        except Exception:
            df = spark.read.parquet(source)

    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus source {source!r} missing required columns {missing}; "
            f"expected {REQUIRED_COLS}"
        )
    df = df.select(*REQUIRED_COLS)
    if langs:
        from ckanext_extractor_spark.operators.build import glob_filter_expr

        df = df.where(glob_filter_expr(F.col("lang"), langs))
    return df


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the driver's documents.parquet viewed as a corpus table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
