"""Term co-occurrence / PMI corpus analytics.

The corpus-exploration surface next to the index: which term pairs
co-occur in documents far more than chance (pointwise mutual
information, Church & Hanks 1990). Used for collocation mining,
query-expansion candidates (a data-driven complement to the curated
synonyms the query layer already supports), and corpus QA (a skewed
PMI head is how boilerplate and template contamination show up).

Spark-first plan with the quadratic bounded up front:

* distinct (doc, term) pairs — one hash aggregate;
* a document-frequency BAND (min_df <= df <= max_df) applied BEFORE
  the self-join: max_df is the fan-out guard (stopwords and template
  tokens appear in ~every doc, and an unguarded self-join on doc_id
  would be O(doc_len^2) dominated by exactly those terms) — the same
  prefix-filter discipline as ``vectorize.tfidf_neighbors_topk`` and
  ``fingerprint.fingerprint_candidates``;
* optional ``max_terms_per_doc`` cap (deterministic: first K terms in
  lexicographic order) bounds any residual per-doc quadratic;
* pair counts: self-equi-join on doc_id with term_a < term_b -> one
  hash aggregate on (term_a, term_b);
* PMI = ln(N * c_ab / (c_a * c_b)) with N = total docs (folded in as
  a lazy 1-row broadcast — no eager count, the input plan executes
  once), c_x = banded df. With a max_df ceiling the banded dictionary
  is bounded and broadcast back; without one it can be the whole
  vocabulary, so the join strategy is left to AQE.

All Catalyst, no UDFs; two corpus-sized shuffles (the distinct and
the pair count).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.textstats import _tokens


def pmi_pairs(
    df: DataFrame,
    min_df: int = 2,
    max_df: Optional[int] = None,
    max_terms_per_doc: Optional[int] = None,
    min_pair_count: int = 2,
    topk: Optional[int] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-level PMI for co-occurring term pairs.

    Returns (term_a, term_b, pair_count, df_a, df_b, pmi) with
    term_a < term_b, pmi = ROUND(ln(N * c_ab / (df_a * df_b)), 6),
    N = total input docs; ordered by (pmi DESC, term_a, term_b),
    optionally LIMIT topk.

    ``max_df`` is not just hygiene — it is the scale guard: the
    self-join's per-doc fan-out is quadratic in the number of BANDED
    terms per doc, so excluding near-ubiquitous terms caps the hot
    keys. ``max_terms_per_doc`` (first K terms lexicographically,
    deterministic) bounds the residual worst case for pathological
    documents."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df!r}")
    if max_df is not None and max_df < min_df:
        raise ValueError(f"max_df {max_df!r} < min_df {min_df!r}")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count!r}"
        )
    n = df.select(F.count("*").cast("double").alias("_n"))
    t = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    dfs = t.groupBy("term").agg(F.count("*").alias("_df"))
    band = dfs.where(F.col("_df") >= min_df)
    if max_df is not None:
        band = band.where(F.col("_df") <= max_df)
        # with a df ceiling the banded dictionary is bounded (each kept
        # term needs >= min_df docs and <= max_df keeps it rare) ->
        # broadcast it into the posting stream instead of shuffling the
        # postings again. Without a ceiling the band can be the whole
        # vocabulary, so let AQE pick the join strategy instead of
        # forcing an unbounded driver collect.
        band = F.broadcast(band)
    tb = t.join(band, "term")
    if max_terms_per_doc is not None:
        if max_terms_per_doc < 2:
            raise ValueError(
                f"max_terms_per_doc must be >= 2, got {max_terms_per_doc!r}"
            )
        w = Window.partitionBy("_doc").orderBy(F.col("term").asc())
        tb = (
            tb.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_terms_per_doc)
            .drop("_rn")
        )
    a = tb.select(
        F.col("_doc"),
        F.col("term").alias("term_a"),
        F.col("_df").alias("df_a"),
    )
    b = tb.select(
        F.col("_doc"),
        F.col("term").alias("term_b"),
        F.col("_df").alias("df_b"),
    )
    pairs = (
        a.join(b, "_doc")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.count("*").alias("pair_count"),
            F.first("df_a").alias("df_a"),
            F.first("df_b").alias("df_b"),
        )
        .where(F.col("pair_count") >= min_pair_count)
    )
    out = pairs.crossJoin(F.broadcast(n)).select(
        "term_a",
        "term_b",
        F.col("pair_count").cast("long").alias("pair_count"),
        F.col("df_a").cast("long").alias("df_a"),
        F.col("df_b").cast("long").alias("df_b"),
        F.round(
            F.log(
                F.col("_n")
                * F.col("pair_count")
                / (F.col("df_a") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    ).orderBy(F.col("pmi").desc(), "term_a", "term_b")
    if topk is not None:
        out = out.limit(topk)
    return out
