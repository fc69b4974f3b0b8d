"""Similarity search over embedding columns (array<float>).

* cosine_topk — exact brute-force cosine top-k: JVM-side higher-order
  functions (zip_with + aggregate), one TakeOrderedAndProject. The
  correctness baseline.
* lsh_bucket_topk — the scale path: random-hyperplane LSH bucketing; the
  query only scans its own bucket(s). Hyperplanes are derived
  deterministically from a seed so bucket assignment is reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _to_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector.

    The query vector is folded into the plan as a literal array (a
    broadcast-sized constant); the scan is a single pass with a
    per-partition top-k merge (orderBy+limit -> TakeOrderedAndProject)."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _to_double(F.col(vec_col))
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def add_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per row.

    bucket = sum over planes of (sign(v . h_p) << p). Pure Catalyst
    expressions; at scale, write the table partitioned/bucketed by
    `lsh_bucket` so queries prune to one bucket."""
    planes = hyperplanes(dim, n_planes, seed)
    v = _to_double(F.col(vec_col))
    return embeddings.withColumn("lsh_bucket", _bucket_expr(v, planes))


def _bucket_expr(v: Column, planes: np.ndarray) -> Column:
    bucket = F.lit(0).cast("long")
    for p in range(len(planes)):
        h = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = F.when(_dot(v, h) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    max_bucket_size: int | None = 2_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale.

    Candidate generation = self-equi-join on random-hyperplane buckets
    from ``n_tables`` independent hash families (near-identical vectors
    collide in at least one table with high probability — multi-band
    recall a single table can't reach); verification = exact cosine on the
    distinct candidate id pairs only. Returns (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    Scale controls:
      * only (id, table, bucket) rows are exploded n_tables-fold — the
        vectors themselves are joined back once per verified pair;
      * buckets above ``max_bucket_size`` are dropped before the
        self-join (with 2^n_planes buckets per table, a skewed family
        would otherwise make the join O(sum bucket^2) ~ all-pairs);
      * recall/cost knobs: n_planes (bucket granularity) x n_tables
        (independent chances)."""
    v = _to_double(F.col(vec_col))
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                _bucket_expr(v, hyperplanes(dim, n_planes, seed + t)).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    ids = (
        embeddings.select(F.col(id_col), F.explode(entries).alias("e"))
        .select(id_col, "e.table_id", "e.bucket")
    )
    if max_bucket_size is not None:
        ok = (
            ids.groupBy("table_id", "bucket")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .select("table_id", "bucket")
        )
        ids = ids.join(ok, ["table_id", "bucket"], "left_semi")
    a = ids.alias("a")
    c = ids.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ea = embeddings.select(
        F.col(id_col).alias("id_a"), _to_double(F.col(vec_col)).alias("_va")
    )
    eb = embeddings.select(
        F.col(id_col).alias("id_b"), _to_double(F.col(vec_col)).alias("_vb")
    )
    va, vb = F.col("_va"), F.col("_vb")
    cos = _dot(va, vb) / (F.sqrt(_dot(va, va)) * F.sqrt(_dot(vb, vb)))
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def lsh_bucket_topk(
    embeddings_with_buckets: DataFrame,
    query_vec: list[float],
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    k: int = 10,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only buckets within `probe_hamming` bit
    flips of the query's bucket (multi-probe LSH), then exact cosine on
    the candidates. Recall/cost knob = (n_planes, probe_hamming)."""
    planes = hyperplanes(dim, n_planes, seed)
    qsig = 0
    for p in range(n_planes):
        if float(np.dot(planes[p], query_vec)) > 0:
            qsig |= 1 << p
    probe = {qsig}
    if probe_hamming >= 1:
        for p in range(n_planes):
            probe.add(qsig ^ (1 << p))
    if probe_hamming >= 2:
        for p in range(n_planes):
            for q2 in range(p + 1, n_planes):
                probe.add(qsig ^ (1 << p) ^ (1 << q2))
    cand = embeddings_with_buckets.where(
        F.col("lsh_bucket").isin([int(b) for b in probe])
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
