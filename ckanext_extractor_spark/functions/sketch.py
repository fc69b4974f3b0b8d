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


def _check_shape(width: int, depth: int) -> None:
    if isinstance(width, bool) or not isinstance(width, int) or width < 1:
        raise ValueError(f"width must be a positive int, got {width!r}")
    if isinstance(depth, bool) or not isinstance(depth, int) or depth < 1:
        raise ValueError(f"depth must be a positive int, got {depth!r}")


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
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("_t"))
    rows = [
        toks.select(
            F.lit(d).alias("row"),
            _cms_cell(F.col("_t"), d, width).alias("cell"),
        )
        for d in range(depth)
    ]
    allr = rows[0]
    for r in rows[1:]:
        allr = allr.unionByName(r)
    return allr.groupBy("row", "cell").agg(
        F.count("*").alias("count")
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
