"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features.

The pretraining-data selection method: given a huge RAW corpus and a
small TARGET corpus (the domain you want more of — e.g. docs that look
like Wikipedia, or like a particular language's code), fit two bag-of-
hashed-ngram unigram models, weight every raw doc by its target/raw
log-likelihood ratio, and resample the raw corpus toward the target
distribution with Gumbel top-k (sampling without replacement in one
pass — Vieira 2014).

Spark-first shape, all Catalyst:

* features: the portable lowercase ``[^a-z0-9]+`` tokenizer ->
  md5-60-bit bucket (``dedup._h60 % dim``) — the same fit-free hashing
  trick as ``vectorize.hashed_tfidf``, so nothing is trained,
  broadcast, or kept in sync across executors.
* the two bucket-count tables are ONE hash aggregate each, at most
  ``dim`` rows — folded back as a broadcast join, never a shuffle of
  the corpus.
* per-doc weight: explode -> (doc, bucket) counts (the only
  corpus-sized shuffle, map-side combined) -> broadcast-join the
  dim-row log-ratio table -> per-doc sum.
* resampling: Gumbel key = weight + (-ln(-ln(u))) with u a md5-derived
  uniform in (0,1) per (id, salt) — engine-independent (Spark md5 ==
  DuckDB md5), partition-independent, reproducible; top-n by key is
  a TakeOrdered, no global sort materialized.

At 100 TB the plan is: one tokenize+hash-agg pass over raw (and one
over the small target), a broadcast of 2·dim longs, and a top-n —
exactly the two-pass shape the DSIR paper runs at CommonCrawl scale.

Laplace (+1) smoothing on both models keeps every bucket finite, so
docs hitting target-unseen buckets are penalized but never -inf.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import _h60
from ckanext_extractor_spark.functions.textstats import _tokens


def _bucket(term: Column, dim: int) -> Column:
    return _h60(term) % F.lit(dim)


def _bucket_counts(df: DataFrame, dim: int, text_col: str) -> DataFrame:
    """(bucket, n) hash aggregate — at most ``dim`` rows out."""
    return (
        df.select(
            F.explode(_tokens(F.col(text_col))).alias("_term")
        )
        .select(_bucket(F.col("_term"), dim).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket importance log-ratio table (bucket, logratio):

        logratio(b) = ln( p_target(b) / p_raw(b) )

    with add-one smoothing: p(b) = (count(b) + 1) / (total + dim).
    At most ``dim`` rows — broadcast it into the scoring join.
    Buckets unseen in BOTH corpora still get a (finite, equal-prior)
    ratio via the full 0..dim-1 spine, so scoring never drops a
    feature."""
    if isinstance(dim, bool) or not isinstance(dim, int) or dim < 1:
        raise ValueError(f"dim must be an int >= 1, got {dim!r}")
    spark = raw.sparkSession
    spine = spark.range(dim).select(F.col("id").cast("long").alias("bucket"))
    rc = _bucket_counts(raw, dim, text_col).withColumnRenamed("n", "_nr")
    tc = _bucket_counts(target, dim, text_col).withColumnRenamed("n", "_nt")
    joined = (
        spine.join(rc, "bucket", "left").join(tc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_nr", F.lit(0)).alias("_nr"),
            F.coalesce("_nt", F.lit(0)).alias("_nt"),
        )
    )
    tot = joined.agg(
        F.sum("_nr").cast("double").alias("_tr"),
        F.sum("_nt").cast("double").alias("_tt"),
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.col("_nt") + 1.0) / (F.col("_tt") + float(dim)))
                - F.log((F.col("_nr") + 1.0) / (F.col("_tr") + float(dim)))
            ).alias("logratio"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    logratio: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-doc importance weight (id, weight):

        weight(d) = sum_b  count_b(d) * logratio(b)

    i.e. the target/raw log-likelihood ratio of d under the two hashed
    unigram models. Zero-token docs get weight 0.0 (empty product —
    neither model prefers them). ``logratio`` lets callers reuse a
    precomputed table (e.g. fit once on a sample, score many shards —
    the DSIR-at-scale deployment shape). Weight is rounded to 6
    decimals for engine-portable ordering."""
    lr = logratio if logratio is not None else dsir_logratio(
        raw, target, dim=dim, text_col=text_col
    )
    per_doc = (
        raw.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_term")
        )
        .select(id_col, _bucket(F.col("_term"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("_c"))
        .join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("_c") * F.col("logratio")).alias("_w"))
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.round(F.coalesce("_w", F.lit(0.0)), 6).alias("weight"),
        )
    )


def _gumbel(id_col: Column, salt: str) -> Column:
    """Deterministic standard Gumbel noise per (id, salt): u =
    (h60 + 1) / (2^60 + 1) in (0, 1), g = -ln(-ln(u)). md5-based, so
    Spark == DuckDB == any engine; independent of partitioning."""
    u = (
        (_h60(F.concat(id_col.cast("string"), F.lit(salt))) + 1.0)
        / F.lit(float(2**60) + 1.0)
    )
    return -F.log(-F.log(u))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    dim: int = 1024,
    gumbel_scale: float = 1.0,
    salt: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
    logratio: Optional[DataFrame] = None,
) -> DataFrame:
    """Select ``n`` raw docs by Gumbel top-k over DSIR weights —
    importance sampling WITHOUT replacement toward the target
    distribution (key = weight + scale * Gumbel(id, salt); top-n keys
    win). ``gumbel_scale`` is the sampling temperature: 0 = hard
    argmax of the weights, 1 = proportional-to-exp(weight) sampling
    (the paper's setting).

    Returns (id, weight, key) for the selected docs ordered by
    (key DESC, id ASC); key rounded to 6 decimals. The top-n is a
    TakeOrdered (no full sort), and the ordering is reproducible
    across engines and partitionings."""
    if isinstance(n, bool) or not isinstance(n, int) or n < 1:
        raise ValueError(f"n must be an int >= 1, got {n!r}")
    if gumbel_scale < 0.0:
        raise ValueError(f"gumbel_scale must be >= 0, got {gumbel_scale!r}")
    w = dsir_weights(
        raw, target, dim=dim, text_col=text_col, id_col=id_col,
        logratio=logratio,
    )
    keyed = w.select(
        id_col,
        "weight",
        F.round(
            F.col("weight")
            + F.lit(float(gumbel_scale)) * _gumbel(F.col(id_col), salt),
            6,
        ).alias("key"),
    )
    return keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(n)
