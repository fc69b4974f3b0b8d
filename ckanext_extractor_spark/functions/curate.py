"""End-to-end corpus curation: the composed hygiene pass every
web-scale training-data pipeline runs before tokenization — rule-based
quality filter (Gopher-style bands, Rae et al. 2021) -> exact dedup
(keep the smallest id per content hash) -> per-source quota cap
(C4/RefinedWeb host cap) -> deterministic train/test split — all as
ONE Catalyst plan over one scan.

The value of composing here rather than running four jobs: each stage
prunes before the next shuffles, so the dedup exchange only carries
quality survivors and the quota exchange only carries dedup keepers.
At 100 TB the quality filter typically drops 50-80% of raw crawl
scan-side (projection + filter, zero shuffle), which halves every
downstream exchange for free.

Shape for scale (2 exchanges total after one scan):
* quality features are pure projections (token array, int/int ratio
  divisions — engine-exact doubles, so the thresholds are
  oracle-checkable bit-for-bit);
* dedup keys on md5(text) computed in the same projection — the text
  column is DROPPED before the exchange, so strings never cross it
  (the boilerplate-removal discipline);
* the quota stage reuses :func:`sampling.group_quota` (one exchange,
  spilling window) and the split reuses :func:`sampling.hash_split`
  (projection).

Reference analog: the extract->filter->store flow the reference runs
per resource (ckanext/extractor/tasks.py:37 extract_resource — fetch,
format gate, metadata clean, store); this operator is that hygiene
pass re-expressed corpus-wide for training-data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.sampling import (
    group_quota,
    hash_split,
)
from ckanext_extractor_spark.functions.textstats import _tokens


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    min_tokens: int = 20,
    max_tokens: int = 10_000,
    min_alpha_ratio: float = 0.5,
    min_distinct_ratio: float = 0.3,
    quota_per_group: "int | None" = None,
    test_frac: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Quality-filter, dedup, quota-cap and split a document corpus in
    one plan. Returns (id, group, n_tokens, alpha_ratio, distinct_ratio,
    split) for the surviving rows — ratios rounded to 6dp for display;
    the FILTERS compare the unrounded engine-exact doubles.

    Stage order matters and is pinned: the quota ranks within each
    group over the docs that survived quality + dedup (capping raw
    rows first would let duplicates consume a host's budget), and the
    split labels only final survivors (so train/test proportions hold
    post-curation).
    """
    if max_tokens < min_tokens:
        raise ValueError(
            f"max_tokens {max_tokens} < min_tokens {min_tokens}")
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        .cast("double")
        / F.greatest(F.length(text_col), F.lit(1))
    )
    distinct = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))
    feat = df.select(
        F.col(id_col),
        F.col(group_col),
        F.md5(F.col(text_col)).alias("_chash"),
        n.alias("n_tokens"),
        alpha.alias("_alpha"),
        distinct.alias("_distinct"),
    )
    kept = feat.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("_alpha") >= min_alpha_ratio)
        & (F.col("_distinct") >= min_distinct_ratio)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_chash").orderBy(F.col(id_col).asc())
    deduped = (
        kept.withColumn("_dr", F.row_number().over(w))
        .where(F.col("_dr") == 1)
        .drop("_dr", "_chash")
    )
    if quota_per_group is not None:
        # Domain-separated salt: group_quota and hash_split both rank
        # on md5(id||salt), so sharing one salt would make the quota
        # survivors exactly the lowest-hash rows — the very rows the
        # split labels 'test' (a capped group could contribute ZERO
        # training docs). The ':quota' suffix decorrelates the draws.
        deduped = group_quota(
            deduped, group_col, quota_per_group, salt=salt + ":quota",
            id_col=id_col
        )
    out = hash_split(deduped, test_frac=test_frac, salt=salt,
                     id_col=id_col)
    return out.select(
        F.col(id_col),
        F.col(group_col),
        F.col("n_tokens"),
        F.round("_alpha", 6).alias("alpha_ratio"),
        F.round("_distinct", 6).alias("distinct_ratio"),
        F.col("split"),
    )
