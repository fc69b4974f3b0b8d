"""Text featurization for training-data pipelines: hashing-trick
TF-IDF (the scalable fixed-width bag-of-words every dedup / clustering
/ classifier stage downstream of raw text wants).

Spark-first shape: tokens come from the same portable lowercase
``[^a-z0-9]+`` splitter the textstats family uses; the term -> bucket
map is a stateless hash (no vocabulary to fit, broadcast, or keep in
sync across a 1000-executor cluster — the whole point of the hashing
trick, Weinberger et al. 2009). Buckets use the md5-60-bit hash the
dedup family established (portable to the DuckDB oracle, unlike
xxhash64). Everything is Catalyst: one explode + two hash aggregates,
no UDFs, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import _h60
from ckanext_extractor_spark.functions.textstats import _tokens


def _bucket(term: Column, dim: int) -> Column:
    # md5-60-bit % dim (dedup._h60, the one pinned portable hash): the
    # 60-bit value is non-negative, so the modulo is too (Spark and
    # DuckDB agree on % for non-negatives).
    return _h60(term) % F.lit(dim)


def hashed_tfidf(
    df: DataFrame,
    dim: int = 1024,
    l2_normalize: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse hashed TF-IDF rows (id, bucket, ROUND(weight, 6)).

    weight = tf * idf with smooth idf = ln((N + 1) / (df + 1)) + 1
    (the sklearn TfidfVectorizer formula), where N counts ALL input
    docs (zero-token docs contribute to N but emit no rows) and df is
    the number of distinct docs hitting the BUCKET (post-collision —
    the hashing-trick statistic, cheaper and what a fit-free pipeline
    can actually know). With ``l2_normalize`` each doc's weight vector
    is scaled to unit length so downstream cosine is a plain dot.

    Plan: explode -> (doc, bucket) tf hash aggregate (map-side partial)
    -> bucket df aggregate joined back broadcast -> N folded in as a
    1-row broadcast cross join -> optional per-doc norm window. Two
    shuffles total at any corpus size; output volume is bounded by
    min(tokens, n_docs * dim)."""
    if isinstance(dim, bool) or not isinstance(dim, int) or dim < 1:
        raise ValueError(f"dim must be an int >= 1, got {dim!r}")
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_term")
    )
    tf = (
        toks.select(id_col, _bucket(F.col("_term"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    bucket_df = tf.groupBy("bucket").agg(F.count("*").alias("_df"))
    n = df.select(F.count("*").cast("double").alias("_n"))
    idf = F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0
    weighted = (
        tf.join(F.broadcast(bucket_df), "bucket")
        .crossJoin(F.broadcast(n))
        .select(id_col, "bucket", (F.col("_tf") * idf).alias("_w"))
    )
    if l2_normalize:
        from pyspark.sql import Window

        norm = F.sqrt(
            F.sum(F.col("_w") * F.col("_w")).over(
                Window.partitionBy(id_col)
            )
        )
        weighted = weighted.select(
            id_col, "bucket", (F.col("_w") / norm).alias("_w")
        )
    return weighted.select(
        F.col(id_col),
        F.col("bucket"),
        F.round("_w", 6).alias("weight"),
    )


def tfidf_neighbors_topk(
    df: DataFrame,
    k: int = 10,
    dim: int = 1024,
    max_bucket_df: int | None = None,
    min_cosine: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF cosine top-k neighbors per document
    (id, neighbor_id, ROUND(cosine, 6)) via an inverted-index
    self-join — the Bayardo/Ma/Srikant WWW'07 all-pairs shape, not an
    N^2 scan.

    Plan: ``hashed_tfidf`` rows (already L2-normalized, 6dp-rounded —
    the rounding happens BEFORE the pairing so both engines multiply
    identical weights) -> optional df-prune of buckets hit by more
    than ``max_bucket_df`` docs (the posting-length prefix filter:
    high-df buckets carry the least cosine mass and all of the
    quadratic join cost; at 100 TB this cap is what bounds the
    bucket-join fan-out, exactly like the LSH ``max_bucket_size``
    guard) -> bucket equi-join on id<id, per-pair SUM(w*w) hash
    aggregate -> both directions unioned -> per-doc row_number window
    <= k. Two shuffles beyond featurization; no vector ever
    materializes on the driver.

    ``min_cosine`` drops weak pairs before the window (score floor);
    ties pinned (cosine 6dp desc, neighbor id asc).
    """
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise ValueError(f"k must be an int >= 1, got {k!r}")
    if max_bucket_df is not None and (
        isinstance(max_bucket_df, bool)
        or not isinstance(max_bucket_df, int)
        or max_bucket_df < 2
    ):
        raise ValueError(
            f"max_bucket_df must be an int >= 2 or None, got {max_bucket_df!r}"
        )
    from pyspark.sql import Window

    w = hashed_tfidf(
        df, dim=dim, l2_normalize=True, text_col=text_col, id_col=id_col
    )
    if max_bucket_df is not None:
        # groupBy + semi-join, not a windowed count: the count agg
        # partial-aggregates map-side and never sorts, where the
        # window shape forces a full sort+shuffle of every tf-idf row
        # (the fingerprint_candidates prune shape; code-review r5).
        ok = (
            w.groupBy("bucket").agg(F.count("*").alias("_bdf"))
            .where(F.col("_bdf") <= max_bucket_df)
            .select("bucket")
        )
        w = w.join(ok, "bucket", "left_semi")
    a = w.select(
        F.col(id_col).alias("_ida"),
        F.col("bucket"),
        F.col("weight").alias("_wa"),
    )
    b = w.select(
        F.col(id_col).alias("_idb"),
        F.col("bucket"),
        F.col("weight").alias("_wb"),
    )
    pairs = (
        a.join(b, "bucket")
        .where(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.round(F.sum(F.col("_wa") * F.col("_wb")), 6).alias("cosine"))
        .where(F.col("cosine") >= float(min_cosine))
    )
    directed = pairs.select(
        F.col("_ida").alias(id_col),
        F.col("_idb").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        pairs.select(
            F.col("_idb").alias(id_col),
            F.col("_ida").alias("neighbor_id"),
            "cosine",
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
    )
    return (
        directed.withColumn("_rn", rn)
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
