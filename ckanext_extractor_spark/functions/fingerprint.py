"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD'03 — the MOSS algorithm) as pure Catalyst expressions.

The reference's fingerprinting surface is the Solr-side signature
field it could configure on the same schema family
(travis/solr/schema.xml); this module implements the canonical
local-fingerprint algorithm those signature processors approximate —
the sketch a training-data pipeline uses for partial-overlap / clone
detection where MinHash (whole-document Jaccard) is too coarse.

Algorithm: hash every k-token shingle (k-gram), slide a window of w
consecutive gram hashes over the document, and keep the MINIMUM hash
in each window (rightmost on ties — "robust winnowing"). Guarantee:
any token run of length >= w + k - 1 shared by two documents yields at
least one shared (hash, position-independent) fingerprint, and the
selected set is ~2/(w+1) of the grams — a tunable density/recall knob.

Scale shape: :func:`winnow_fingerprints` is ONE whole-stage-codegen
projection — tokens, gram hashes, window minima, and dedup all happen
inside higher-order array functions on the per-document row, so there
is NO shuffle at all until a consumer aggregates; the emitted rows are
(id, pos, 60-bit fp) — strings never leave the projection.
:func:`fingerprint_candidates` is the standard candidate equi-join on
the fingerprint key with the degenerate-bucket guard every LSH-family
operator in this repo uses (``max_df`` drops boilerplate fingerprints
BEFORE the self-join, bounding the O(bucket**2) blowup a hot license
header would otherwise cause at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import _tokens

# positions are packed below the hash in the oracle's HUGEINT ordering
# trick; 2^20 grams (~1M tokens/doc) is the documented per-doc bound
MAX_POS = 1 << 20


def _gram_hash(toks: Column, i: Column, k: int) -> Column:
    """Portable 60-bit hash of the k-gram starting at 0-based ``i``
    (same value in DuckDB: ('0x'||substr(md5(g),1,15))::BIGINT)."""
    g = F.array_join(F.slice(toks, i + 1, F.lit(k)), " ")
    return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robust-winnowing fingerprints: distinct (id, pos, fp) rows.

    ``k``: shingle size in tokens; ``w``: window size in grams. A doc
    shorter than k tokens emits nothing; a doc with 1 <= n_grams < w
    emits the single minimum over all its grams (one degenerate
    window), so short docs still carry a fingerprint. Ties select the
    RIGHTMOST minimal gram (Schleimer's robust rule; with 60-bit
    hashes ties are ~nonexistent, pinned anyway).
    """
    for name, v, lo in (("k", k, 1), ("w", w, 1)):
        if isinstance(v, bool) or not isinstance(v, int) or v < lo:
            raise ValueError(f"{name} must be an int >= {lo}, got {v!r}")
    toks = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= k)
    n_grams = F.size("_t") - F.lit(k) + F.lit(1)
    grams = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.struct(
            i.alias("pos"), _gram_hash(F.col("_t"), i, k).alias("h")
        ),
    )
    # window starts: 0..n_grams-w, or the single start 0 for short docs
    starts = F.when(
        n_grams >= w, F.sequence(F.lit(0), n_grams - F.lit(w))
    ).otherwise(F.sequence(F.lit(0), F.lit(0)))
    wlen = F.least(F.lit(w), n_grams)
    init = F.struct(
        F.lit(-1).alias("pos"), F.lit(1 << 62).cast("long").alias("h")
    )
    fps = F.array_distinct(
        F.transform(
            starts,
            lambda j: F.aggregate(
                F.slice(F.col("_grams"), j + 1, wlen),
                init,
                # <= keeps the LATER gram on ties -> rightmost min
                lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
            ),
        )
    )
    # no .distinct(): array_distinct above already dedups within the
    # doc, and a doc emits each (pos, h) once — the operator stays a
    # single shuffle-free projection
    return (
        toks.withColumn("_grams", grams)
        .select(F.col(id_col), F.explode(fps).alias("_fp"))
        .select(
            F.col(id_col),
            F.col("_fp.pos").cast("long").alias("pos"),
            F.col("_fp.h").alias("fp"),
        )
    )


def fingerprint_candidates(
    fps: DataFrame,
    min_shared: int = 2,
    max_df: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate overlap pairs from winnowing fingerprints: documents
    sharing >= ``min_shared`` distinct fingerprint hashes, as
    (id_a < id_b, n_shared) rows.

    ``max_df`` drops fingerprints present in more than that many docs
    BEFORE the self-join (boilerplate/license-header guard — the same
    degenerate-bucket bound as minhash_lsh_pairs); dropped hashes
    can only lower n_shared, never admit a false pair.
    """
    if isinstance(min_shared, bool) or not isinstance(min_shared, int) \
            or min_shared < 1:
        raise ValueError(
            f"min_shared must be an int >= 1, got {min_shared!r}"
        )
    if isinstance(max_df, bool) or not isinstance(max_df, int) or max_df < 2:
        raise ValueError(f"max_df must be an int >= 2, got {max_df!r}")
    keyed = fps.select(F.col(id_col).alias("_id"), "fp").distinct()
    hot = (
        keyed.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("fp")
    )
    kept = keyed.join(hot, "fp")
    a = kept.select(F.col("_id").alias("id_a"), "fp")
    b = kept.select(F.col("_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
