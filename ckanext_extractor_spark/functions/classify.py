"""Multinomial Naive Bayes over hashing-trick buckets — the
train-a-cheap-quality/language-classifier-on-the-corpus-itself stage of
a training-data pipeline (the fastText-ish linear filter of CCNet /
RedPajama / Dolma, expressed as two hash aggregates plus one broadcast
join).

Spark-first shape: the model IS a small DataFrame — (label, bucket,
log_prob) with one ``bucket = -1`` row per label carrying the class
prior and the unseen-bucket default.  It has at most
``n_labels * (dim + 1)`` rows, so scoring broadcasts it; the only
shuffle in ``nb_classify`` is the per-(doc, label) score aggregate.
Nothing row-at-a-time, nothing on the driver.

Determinism: buckets use the pinned portable md5-60-bit hash
(``dedup._h60``) and tokens the portable ``[^a-z0-9]+`` splitter, so a
DuckDB oracle reproduces every count exactly; log-probabilities are
ln() of integer ratios (6dp-stable across engines, the q112/q115
precedent) and the predicted label ties are pinned on
(ROUND(score, 6) DESC, label ASC).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the ONE pinned bucket function: NB scoring is only correct while its
# bucketing stays byte-identical to the tfidf family's (code-review r5)
from ckanext_extractor_spark.functions.textstats import _tokens
from ckanext_extractor_spark.functions.vectorize import _bucket


def _check_dim(dim: int) -> None:
    if isinstance(dim, bool) or not isinstance(dim, int) or dim < 1:
        raise ValueError(f"dim must be an int >= 1, got {dim!r}")


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    dim: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit multinomial NB on the given (already-filtered) frame;
    returns the model frame (label, bucket, ROUND(log_prob, 6)).
    Training is id-agnostic (it reads only label_col/text_col), so
    there is deliberately no id_col parameter.

    Rows with bucket >= 0 hold ln((count + alpha) / (total_label +
    alpha * dim)) for buckets SEEN in that label's training text; the
    bucket = -1 row holds ln(n_label / n_train) + the unseen-bucket
    default is derivable as ln(alpha / (total_label + alpha * dim)) —
    stored in its own ``bucket = -2`` row so scoring never recomputes
    totals.  Null labels / null text train nothing (dropped).

    Plan: explode -> (label, bucket) count (map-side partial combine)
    -> per-label totals joined broadcast -> union with the two
    per-label summary rows.  One shuffle keyed on (label, bucket);
    output <= n_labels * (dim + 2) rows.
    """
    _check_dim(dim)
    if not isinstance(alpha, (int, float)) or isinstance(alpha, bool) or alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha!r}")
    alpha = float(alpha)
    labeled = df.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    toks = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("_term"),
    )
    counts = (
        toks.select("label", _bucket(F.col("_term"), dim).alias("bucket"))
        .groupBy("label", "bucket")
        .agg(F.count("*").cast("double").alias("_cnt"))
    )
    n_docs = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").cast("double").alias("_nl")
    )
    # totals keyed off the LABEL set (n_docs), not the token set: a
    # label whose training docs all tokenize to zero tokens still gets
    # its default/dims rows (_tot = 0 -> default = ln(1/dim), the
    # uniform distribution), so nb_classify's prior⋈default join can
    # never silently drop a label (code-review r5 finding).
    totals = (
        n_docs.select("label")
        .join(counts.groupBy("label").agg(F.sum("_cnt").alias("_t")),
              "label", "left")
        .select("label", F.coalesce("_t", F.lit(0.0)).alias("_tot"))
    )
    denom = F.col("_tot") + F.lit(alpha * dim)
    cond = counts.join(F.broadcast(totals), "label").select(
        "label",
        "bucket",
        F.log((F.col("_cnt") + F.lit(alpha)) / denom).alias("_lp"),
    )
    n_total = labeled.select(F.count("*").cast("double").alias("_n"))
    priors = n_docs.crossJoin(F.broadcast(n_total)).select(
        "label",
        F.lit(-1).cast("int").alias("bucket"),
        F.log(F.col("_nl") / F.col("_n")).alias("_lp"),
    )
    defaults = totals.select(
        "label",
        F.lit(-2).cast("int").alias("bucket"),
        F.log(F.lit(alpha) / denom).alias("_lp"),
    )
    # bucket=-3 records the hashing dim so nb_classify can reject a
    # train/classify dim mismatch instead of silently joining wrong
    # per-bucket log-probs (code-review r5 finding)
    dims = totals.select(
        "label",
        F.lit(-3).cast("int").alias("bucket"),
        F.lit(float(dim)).alias("_lp"),
    )
    return (
        cond.select("label", F.col("bucket").cast("int").alias("bucket"), "_lp")
        .unionByName(priors)
        .unionByName(defaults)
        .unionByName(dims)
        .select("label", "bucket", F.round("_lp", 6).alias("log_prob"))
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
) -> DataFrame:
    """Score every doc against every label in the (broadcast) model;
    returns (id, pred_label, ROUND(score, 6)) — the argmax label per
    doc, ties pinned (score 6dp desc, label asc).

    score(doc, label) = prior + sum over doc buckets of
    tf * (seen log_prob | unseen default).  Zero-token docs still get
    a prediction (prior-only argmax).

    Plan: doc -> (id, bucket, tf) hash aggregate, crossJoin the tiny
    broadcast label list, left-join the broadcast model on (label,
    bucket) with the per-label default as fallback, one (id, label)
    hash aggregate, one per-id window.  The model never exceeds
    n_labels * (dim + 2) rows; docs shuffle once, keyed on id.
    """
    _check_dim(dim)
    dim_rows = model.where(F.col("bucket") == -3) \
        .select("log_prob").limit(1).collect()
    if dim_rows and int(dim_rows[0]["log_prob"]) != dim:
        raise ValueError(
            f"model was trained with dim={int(dim_rows[0]['log_prob'])} "
            f"but nb_classify got dim={dim} — bucket ids would join "
            "the wrong log-probs")
    cond = model.where(F.col("bucket") >= 0)
    priors = model.where(F.col("bucket") == -1).select(
        "label", F.col("log_prob").alias("_prior")
    )
    defaults = model.where(F.col("bucket") == -2).select(
        "label", F.col("log_prob").alias("_default")
    )
    labels = F.broadcast(priors.join(defaults, "label"))
    tf = (
        df.select(
            F.col(id_col),
            F.explode_outer(_tokens(F.col(text_col))).alias("_term"),
        )
        .select(
            id_col,
            F.when(
                F.col("_term").isNotNull(), _bucket(F.col("_term"), dim)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    scored = (
        tf.crossJoin(labels)
        .join(
            F.broadcast(cond).withColumnRenamed("log_prob", "_lp"),
            ["label", "bucket"],
            "left",
        )
        .select(
            id_col,
            "label",
            "_prior",
            F.when(F.col("bucket").isNull(), F.lit(0.0))
            .otherwise(
                F.col("_tf") * F.coalesce(F.col("_lp"), F.col("_default"))
            )
            .alias("_contrib"),
        )
        .groupBy(id_col, "label")
        .agg(
            F.round(F.first("_prior") + F.sum("_contrib"), 6).alias("score")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("score").desc(), F.col("label").asc()
        )
    )
    return (
        scored.withColumn("_rn", rn)
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "score")
    )


def nb_evaluate(
    predictions: DataFrame,
    truth: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Confusion counts (true_label, pred_label, n) — one join, one
    aggregate; accuracy is SUM(n WHERE true = pred) / SUM(n)."""
    return (
        truth.select(F.col(id_col), F.col(label_col).alias("true_label"))
        .join(predictions.select(id_col, "pred_label"), id_col)
        .groupBy("true_label", "pred_label")
        .agg(F.count("*").alias("n"))
    )
