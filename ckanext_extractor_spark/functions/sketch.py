"""Count-min sketch over the token stream (Cormode & Muthukrishnan
2005) — the fixed-memory frequency summary a 100 TB corpus pipeline
uses where an exact dictionary would be another full shuffle: cheap
approximate term counts for monitoring, hot-key (skew) detection, and
join-time salting decisions.

Spark-first + engine-portable:

* ``depth`` independent hash rows share the md5-60-bit family the
  dedup/LSH operators pinned (``h60("cms{d}#" || term) % width``), so
  the SAME sketch — every cell — is reproducible in DuckDB, Python, or
  any engine; no RNG, no seed state.
* building is ONE hash aggregate keyed on (row, cell): depth × width
  cells max, regardless of corpus size — map-side partial combine does
  the heavy lifting, the exchange carries at most depth·width rows.
* point queries take min over the depth cells — overestimates only,
  with the classic guarantee: err <= e/width · total_count with
  probability 1 - (1/e)^depth.

The sketch is a plain DataFrame (row, cell, count): persist it as
parquet, union-merge sketches from different shards/days (counts add —
the sketch is a linear transform), or broadcast it for stream-side
lookups.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import _h60
from ckanext_extractor_spark.functions.textstats import _tokens


def _cms_cell(term: Column, row: int, width: int) -> Column:
    return _h60(F.concat(F.lit(f"cms{row}#"), term)) % F.lit(width)


def _check_shape(width: int, depth: int, names=("width", "depth")) -> None:
    for name, v in zip(names, (width, depth)):
        if isinstance(v, bool) or not isinstance(v, int) or v < 1:
            raise ValueError(f"{name} must be a positive int, got {v!r}")


def cms_build(
    df: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: (row, cell, count) with one output row per
    NON-EMPTY cell (absent cell = 0). One explode + one hash aggregate;
    output bounded by depth * width rows whatever the corpus size."""
    _check_shape(width, depth)
    # ONE source scan: a union of per-row selects would re-scan and
    # re-tokenize the corpus `depth` times (Catalyst does not dedupe
    # union children) — instead each token explodes a depth-long
    # struct array (r5 review: single-scan fix)
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("_t"))
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("row"),
            _cms_cell(F.col("_t"), d, width).alias("cell"),
        )
        for d in range(depth)
    ])
    return (
        toks.select(F.explode(cells).alias("_rc"))
        .select("_rc.row", "_rc.cell")
        .groupBy("row", "cell")
        .agg(F.count("*").alias("count"))
    )


def cms_query(
    sketch: DataFrame,
    terms: Sequence[str],
    width: int,
    depth: int,
) -> DataFrame:
    """Point-estimate each term: (term, est) with est = min over the
    depth rows of that term's cell count (0 when any cell is empty —
    the count-min rule; estimates only ever OVERcount). ``width`` and
    ``depth`` must match the build. The probe set is a literal spine
    cross-joined against nothing — the sketch side is depth*width rows
    at most, so the lookup join broadcasts it."""
    _check_shape(width, depth)
    ts = list(dict.fromkeys(terms))
    if not ts or any(not isinstance(t, str) or not t for t in ts):
        raise ValueError(f"terms must be non-empty strings, got {terms!r}")
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(t,) for t in ts], "term string"
    ).crossJoin(
        spark.range(depth).select(F.col("id").cast("int").alias("row"))
    )
    # per-row cell as a chained CASE (depth is a small constant, so
    # the expression stays compact)
    cell = F.lit(None).cast("long")
    for d in range(depth):
        cell = F.when(
            F.col("row") == d, _cms_cell(F.col("term"), d, width)
        ).otherwise(cell)
    probe = probe.withColumn("cell", cell)
    joined = probe.join(
        F.broadcast(sketch), ["row", "cell"], "left"
    ).select(
        "term", F.coalesce("count", F.lit(0)).alias("_cnt")
    )
    return (
        joined.groupBy("term")
        .agg(F.min("_cnt").cast("long").alias("est"))
        .orderBy("term")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union-merge sketches built with the SAME (width, depth): counts
    add cell-wise (the sketch is linear), so per-shard / per-day
    sketches combine without touching the corpora again."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    allr = sketches[0]
    for s in sketches[1:]:
        allr = allr.unionByName(s)
    return allr.groupBy("row", "cell").agg(
        F.sum("count").alias("count")
    )


# ---------------------------------------------------------------------------
# HyperLogLog — fixed-memory DISTINCT counts (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

def hll_registers(
    df: DataFrame,
    p: int = 9,
    text_col: str = "text",
) -> DataFrame:
    """HLL register table (register, max_rho) over the token stream —
    one explode + one hash aggregate, bounded at m = 2^p rows whatever
    the corpus size (only NON-ZERO registers emitted).

    Register index = h60(term) % m; rho = leading-zero rank of the
    remaining (60 - p) bits + 1, computed with integer/string ops only
    (``length(bin(w))``, identical in Spark and DuckDB) so the whole
    register table is engine-reproducible — no floats until the
    estimator. Duplicate tokens hash identically, so max() sees
    distinct values by construction (no pre-distinct shuffle needed)."""
    if isinstance(p, bool) or not isinstance(p, int) or not 4 <= p <= 18:
        raise ValueError(f"p must be an int in [4, 18], got {p!r}")
    m = 1 << p
    h = _h60(F.col("_t"))
    # exact integer shift — `h / m` would be DOUBLE division and lose
    # the low bits of a 60-bit hash (doubles are exact only to 2^53)
    w = F.shiftright(h, p)  # the remaining 60 - p bits
    rho = F.when(
        w > 0,
        F.lit(60 - p) - (F.length(F.bin(w)) - 1)
    ).otherwise(F.lit(60 - p + 1))
    return (
        df.select(F.explode(_tokens(F.col(text_col))).alias("_t"))
        .select((h % F.lit(m)).alias("register"), rho.alias("_rho"))
        .groupBy("register")
        .agg(F.max("_rho").cast("int").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 9,
) -> DataFrame:
    """Distinct-count estimate from an :func:`hll_registers` table:
    one row (m, n_empty, estimate) with the standard estimator
    alpha_m * m^2 / sum(2^-M_j) and the small-range linear-counting
    correction (E <= 2.5m and empty registers present ->
    m * ln(m / n_empty)). Estimate rounded to 4 decimals. Register
    tables are mergeable with a max-aggregate (HLL is a lattice):
    ``a.unionByName(b).groupBy("register").agg(max("max_rho"))``."""
    if isinstance(p, bool) or not isinstance(p, int) or not 4 <= p <= 18:
        raise ValueError(f"p must be an int in [4, 18], got {p!r}")
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m >= 64:
        alpha = 0.709
    elif m >= 32:
        alpha = 0.697
    else:
        alpha = 0.673
    agg = registers.agg(
        F.count("*").cast("long").alias("_nz"),
        # coalesce: an EMPTY corpus aggregates sum -> NULL, which would
        # poison the estimator; 0.0 routes to linear counting -> 0.0
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("_s"),
    )
    n_empty = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (F.col("_s") + n_empty.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        n_empty.cast("long").alias("n_empty"),
        F.round(est, 4).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — fixed-memory set membership (Bloom 1970)
# ---------------------------------------------------------------------------

def bloom_build(
    df: DataFrame,
    m_bits: int = 8192,
    k_hashes: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Set-bit table (bit) for the corpus's DISTINCT tokens: k md5-row
    hashes per token (``h60("bf{i}#" || term) % m_bits`` — the same
    portable family as the CMS rows), one explode + one distinct
    aggregate, bounded at m_bits rows. False positives only, never
    false negatives; bloom filters OR-merge (union + distinct)."""
    _check_shape(m_bits, k_hashes, names=("m_bits", "k_hashes"))
    # single scan, like cms_build: per-token array of k bit positions
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("_t"))
    bits = F.array(*[
        (_h60(F.concat(F.lit(f"bf{i}#"), F.col("_t")))
         % F.lit(m_bits))
        for i in range(k_hashes)
    ])
    return (
        toks.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_query(
    bloom: DataFrame,
    terms: Sequence[str],
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """(term, maybe_present): true iff ALL k of the term's bits are
    set (possibly-present — false positives possible at the standard
    (1 - e^-kn/m)^k rate; false = definitely absent). The bloom side
    is at most m_bits rows -> broadcast lookup join."""
    _check_shape(m_bits, k_hashes, names=("m_bits", "k_hashes"))
    ts = list(dict.fromkeys(terms))
    if not ts or any(not isinstance(t, str) or not t for t in ts):
        raise ValueError(f"terms must be non-empty strings, got {terms!r}")
    spark = bloom.sparkSession
    probe = spark.createDataFrame(
        [(t, i) for t in ts for i in range(k_hashes)],
        "term string, hidx int",
    )
    bit = F.lit(None).cast("long")
    for i in range(k_hashes):
        bit = F.when(
            F.col("hidx") == i,
            _h60(F.concat(F.lit(f"bf{i}#"), F.col("term")))
            % F.lit(m_bits),
        ).otherwise(bit)
    probe = probe.withColumn("bit", bit)
    joined = probe.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return (
        joined.groupBy("term")
        .agg(
            (F.sum(F.coalesce("_set", F.lit(0)))
             == F.countDistinct("hidx")).alias("maybe_present")
        )
        .orderBy("term")
    )
