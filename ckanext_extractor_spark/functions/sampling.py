"""Deterministic sampling / splitting for training-data pipelines:
hash-based train/test assignment and per-group (stratified) keep rates
for data mixing.

Why hash-based instead of ``df.sample``: RNG sampling is neither
reproducible across engines nor stable under repartitioning, and a
training pipeline must assign the SAME doc to the SAME split on every
run and every system that reads the corpus. An md5 prefix of
``id || salt`` is engine-independent (Spark md5 == DuckDB md5 ==
Python hashlib), order-independent, and join-free — one narrow
projection, no shuffle, scales to any corpus size. Granularity is
1/65536 (the first 4 hex chars compared lexicographically against a
threshold); change ``salt`` to draw an independent split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_prefix(id_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 4
    )


def _threshold_hex(frac: float) -> str:
    if isinstance(frac, bool) or not isinstance(frac, (int, float)) \
            or not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac!r}")
    n = int(round(frac * 65536))
    # frac=1.0 must beat every 4-hex prefix; 'g' sorts above 'ffff'
    # while format(65536)='10000' would sort BELOW it lexicographically
    return "g" if n >= 65536 else format(n, "04x")


def hash_split(
    df: DataFrame,
    test_frac: float = 0.1,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a ``split`` column: 'test' for ~``test_frac`` of rows,
    'train' otherwise — deterministic per (id, salt)."""
    thr = _threshold_hex(test_frac)
    h = _hash_prefix(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(h < F.lit(thr), F.lit("test")).otherwise(F.lit("train")),
    )


def hash_sample(
    df: DataFrame,
    frac: float,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~``frac`` of rows, deterministically per (id, salt)."""
    thr = _threshold_hex(frac)
    return df.where(_hash_prefix(F.col(id_col), salt) < F.lit(thr))


def group_quota(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n_per_group`` rows per group value — the
    host/domain cap every web-corpus pipeline applies so one mirror or
    crawler trap cannot dominate the training mix (C4 and RefinedWeb
    both cap per-host document counts).

    Which rows survive is deterministic and engine-independent: rows
    rank within their group by (md5(id || salt), id) — a uniform
    hash-shuffle inside the group, so the kept subset is an unbiased
    sample of the group, stable across runs, engines, and partition
    layouts (same contract as :func:`hash_sample`; change ``salt`` to
    redraw).

    CORRELATION HAZARD: this ranks on the same md5(id||salt) that
    :func:`hash_sample` / :func:`hash_split` threshold on. Composing
    them with the SAME salt makes the quota survivors exactly the
    lowest-hash rows — i.e. the rows a subsequent split labels
    'test'. Use distinct salts per stage (curate_corpus appends
    ':quota').

    Shape for scale: ONE exchange (hash-partition by group) feeding a
    streaming row_number window; Spark's window sorter spills, so a
    mega-group (hot host) costs a disk sort, never memory. Rows in
    groups at or under quota pass through unchanged; output order is
    not defined (filter semantics).
    """
    if isinstance(n_per_group, bool) or not isinstance(n_per_group, int) \
            or n_per_group < 1:
        raise ValueError(
            f"n_per_group must be a positive int, got {n_per_group!r}"
        )
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def stratified_hash_sample(
    df: DataFrame,
    field: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data mixing: keep each group at its own rate
    (``fractions[value]``; values not listed keep ``default_frac``) —
    the up/down-sampling step that balances domains in a training mix.
    One CASE chain over the group column, no shuffle."""
    if not isinstance(fractions, dict) or not fractions:
        raise ValueError(
            f"fractions must be a non-empty dict, got {fractions!r}"
        )
    default_thr = _threshold_hex(default_frac)
    thr: Column = F.lit(default_thr)
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(field) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.where(_hash_prefix(F.col(id_col), salt) < thr)


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    total: int = 10_000,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based data mixing: sample ~``total`` rows with group
    quotas proportional to ``count_g ** alpha`` — the alpha-sampling
    rule every multilingual/multi-source LLM pretraining mix uses
    (mBERT/XLM-R exponential smoothing: alpha < 1 upweights the tail so
    low-resource groups are not drowned by the head; alpha = 1 is
    natural proportions, alpha = 0 is uniform).

    Quota per group: ``floor(total * w_g / sum(w))`` with
    ``w_g = count_g ** alpha``, capped at the group's actual count —
    no redistribution of unmet quota (deterministic; the realized total
    can undershoot, which callers compensate by raising ``total``).
    WITHIN each group the kept rows rank by (md5(id || salt || ':mix'),
    id) — the :func:`group_quota` unbiased in-group shuffle, with a
    dedicated salt domain so composing with hash_split/hash_sample on
    the same salt cannot correlate (the curate lesson).

    Plan shape: one count aggregate (#groups rows) + a 1-row total fold
    (both lazy broadcasts back onto the stream), then the single
    group-keyed exchange into a spilling row_number window — identical
    scaling behavior to group_quota; nothing materializes on the
    driver."""
    if isinstance(alpha, bool) or not isinstance(alpha, (int, float)) \
            or alpha < 0.0:
        raise ValueError(f"alpha must be a number >= 0, got {alpha!r}")
    if isinstance(total, bool) or not isinstance(total, int) or total < 1:
        raise ValueError(f"total must be a positive int, got {total!r}")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("_cg"))
    weights = counts.select(
        group_col,
        F.pow(F.col("_cg").cast("double"), float(alpha)).alias("_wg"),
    )
    wsum = weights.agg(F.sum("_wg").alias("_ws"))
    targets = weights.crossJoin(F.broadcast(wsum)).select(
        group_col,
        F.floor(
            F.lit(float(total)) * F.col("_wg") / F.col("_ws")
        ).cast("long").alias("_target"),
    )
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(salt + ":mix"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(targets, group_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_target"))
        .drop("_rn", "_target")
    )
