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
import pandas as pd
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


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
    assignments: "DataFrame | None" = None,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embeddings, then mark every
    within-cluster near-duplicate above a cosine threshold, keeping the
    smallest id of each duplicate group (a row is a duplicate iff SOME
    smaller-id row in its cluster reaches ``threshold``). Returns
    (id, cluster_id, is_dup) for every input row.

    Clustering is a deterministic one-step assignment to ``n_clusters``
    coarse centroids: pass ``centroids=`` (a :func:`kmeans_centroids`
    sampled-Lloyd sketch — the 100 TB shape, still deterministic and
    oracle-checkable) for real cluster granularity, or omit it for the
    pinned smallest-id seed vectors (the bring-up/oracle-baseline
    shape). Either way the expensive parts — the N x K assignment scan
    and the per-cluster pair verify — keep exactly this plan.

    Scale shape: seeds stay a broadcast TakeOrdered head (K rows); the
    assignment is one window over N x K rows shuffled by id; the pair
    step self-joins on cluster_id, so cost is sum(cluster^2) — bounded
    by ``max_cluster_size`` (drop oversized clusters from the pair scan,
    never from the output) exactly like embedding_neardup_pairs'
    bucket cap. Ties in the assignment resolve by (cosine rounded to
    6dp desc, seed id asc) so independent engines agree."""
    if not isinstance(threshold, (int, float)) or isinstance(threshold, bool) \
            or not (-1.0 <= float(threshold) <= 1.0):
        raise ValueError(f"threshold must be in [-1, 1], got {threshold!r}")

    norm = embeddings.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    # the assignment feeds both pair-scan sides AND the output frame —
    # materialize it once (2 longs/row) or the N x K assignment scan
    # re-runs three times (caught by an executedPlan audit: 3 Window
    # passes). localCheckpoint, not persist: the checkpointed RDD is
    # reference-tied to the returned DataFrame, so the ContextCleaner
    # reclaims it when callers drop the result — repeated calls in one
    # session no longer accumulate cache entries (ADVICE r4 #2).
    # Pipelines that reuse the assignment across calls pass a
    # precomputed ``assignments`` (ivf_assign output they manage).
    if assignments is None:
        assign = ivf_assign(
            embeddings, n_clusters, id_col, vec_col, centroids=centroids
        ).localCheckpoint(eager=True)
    else:
        assign = assignments.select(F.col(id_col), "cluster_id")
    members = assign.join(norm, id_col)
    if max_cluster_size is not None:
        ok = (
            assign.groupBy("cluster_id")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") <= max_cluster_size)
            .select("cluster_id")
        )
        members = members.join(ok, "cluster_id", "left_semi")
    a = members.select(
        F.col("cluster_id"), F.col(id_col).alias("_ida"), F.col("_v").alias("_va")
    )
    b = members.select(
        F.col("cluster_id"), F.col(id_col).alias("_idb"), F.col("_v").alias("_vb")
    )
    va, vb = F.col("_va"), F.col("_vb")
    cos_pair = _dot(va, vb) / (F.sqrt(_dot(va, va)) * F.sqrt(_dot(vb, vb)))
    dups = (
        a.join(b, "cluster_id")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cos_pair >= F.lit(float(threshold)))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return assign.join(
        dups.withColumn("_d", F.lit(True)), id_col, "left"
    ).select(
        F.col(id_col),
        "cluster_id",
        F.coalesce("_d", F.lit(False)).alias("is_dup"),
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_clusters: int = 8,
    rounds: int = 1,
    sample_frac: "float | None" = None,
    salt: str = "",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[float]]":
    """Sampled Lloyd-refined coarse-quantizer centroids for IVF /
    SemDeDup (VERDICT r4 #3) — replaces the pinned-seed bring-up shape
    with real cluster granularity while staying deterministic and
    oracle-checkable end to end:

    * sample: deterministic md5 hash-sample (:func:`sampling.hash_sample`
      semantics — engine-independent, reproducible under
      repartitioning); ``sample_frac=None`` uses every row (small-scale
      bring-up; at 100 TB pass the frac that yields ~100x n_clusters
      sample rows).
    * seeds: the ``n_clusters`` smallest-id SAMPLE vectors (the r4
      pinned-seed rule, now over the sketch).
    * each round: assign sample rows to the current centroids by max
      cosine (ties pinned: cosine rounded to 6dp desc, cluster asc —
      the ivf_assign rule), then centroid_c = the elementwise MEAN of
      its assigned vectors; a cluster that captured nothing keeps its
      previous centroid (pinned). Cosine ignores magnitude, so the
      unnormalized mean is exactly spherical k-means' direction update.

    Scale shape: the sample assignment is the same sample x K cosine
    scan as :func:`ivf_assign`; the centroid update is one
    posexplode + (cluster, dim) hash aggregate over SAMPLE rows only;
    each round collects K centroids (K x dim doubles — a sketch, not
    data) to the driver and folds them into the next round's plan as
    literals, so rounds never grow the lineage. Returns centroids as
    plain lists, indexed 0..K-1 by seed order — feed them to
    :func:`ivf_assign` / :func:`ivf_topk` / :func:`semantic_dedup`
    via ``centroids=``."""
    if isinstance(n_clusters, bool) or not isinstance(n_clusters, int) \
            or n_clusters < 1:
        raise ValueError(f"n_clusters must be an int >= 1, got {n_clusters!r}")
    if isinstance(rounds, bool) or not isinstance(rounds, int) or rounds < 0:
        raise ValueError(f"rounds must be an int >= 0, got {rounds!r}")
    sample = embeddings
    if sample_frac is not None:
        from ckanext_extractor_spark.functions.sampling import hash_sample

        sample = hash_sample(embeddings, float(sample_frac), salt=salt,
                             id_col=id_col)
    norm = sample.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    if rounds >= 1:
        # rounds re-scan the sample; pin it. With rounds=0 the frame is
        # read exactly once (the seed collect), so materializing the
        # whole table first is waste — pq_codebooks(rounds=0) would pay
        # it m times (code-review r5 finding)
        norm = norm.localCheckpoint(eager=True)
    seed_rows = norm.orderBy(id_col).limit(n_clusters).collect()
    if not seed_rows:
        raise ValueError("kmeans_centroids: empty (sampled) input")
    cents: "list[list[float]]" = [list(r["_v"]) for r in seed_rows]
    for _ in range(int(rounds)):
        assign = _assign_to_centroids(norm, cents, id_col)
        means = (
            assign.join(norm, id_col)
            .select("cluster_id", F.posexplode(F.col("_v"))
                    .alias("_pos", "_val"))
            .groupBy("cluster_id", "_pos")
            .agg(F.avg("_val").alias("_m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("_pos"), F.col("_m")))).alias("_pm"))
            .select("cluster_id",
                    F.transform(F.col("_pm"), lambda s: s["_m"])
                    .alias("_c"))
            .collect()
        )
        nxt = list(cents)  # empty clusters keep their previous centroid
        for r in means:
            nxt[int(r["cluster_id"])] = list(r["_c"])
        cents = nxt
    return cents


def rank_centroids(
    centroids: "list[list[float]]",
    query_vec: "list[float]",
    nprobe: int,
    keys: "list | None" = None,
) -> list:
    """Driver-side probe ranking over a K-row centroid sketch — the
    shared kernel of :func:`ivf_topk` and ``projection.ivfpq_topk``
    (ties pinned: cosine 6dp desc, key asc). A zero-norm QUERY is
    rejected loudly (it ranks nothing); a zero-norm CENTROID scores
    -inf so it never wins a probe — parity with the in-plan SQL path,
    where the null cosine sorts last (code-review r5 finding: the
    previous inline ranking raised ZeroDivisionError on either)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))
    if qn == 0.0:
        raise ValueError("query_vec must have non-zero norm")
    if keys is None:
        keys = list(range(len(centroids)))
    ranked = []
    for key, c in zip(keys, centroids):
        cv = np.asarray(c, dtype=np.float64)
        cn = float(np.linalg.norm(cv))
        cos = float("-inf") if cn == 0.0 \
            else round(float(np.dot(cv, qv)) / (cn * qn), 6)
        ranked.append((-cos, key))
    ranked.sort()
    return [k for _, k in ranked[:nprobe]]


def _assign_to_centroids(
    norm: DataFrame, centroids: "list[list[float]]", id_col: str
) -> DataFrame:
    """(id, cluster_id) by max cosine against literal centroids —
    the shared assignment plan of :func:`ivf_assign` (pinned ties:
    cosine 6dp desc, cluster asc).

    ZERO-shuffle, Arrow-vectorized shape: the K centroids broadcast
    inside a pandas_udf closure and every Arrow batch scores with ONE
    BLAS matmul (batch x dim @ dim x K) + row argmax — no row
    amplification, no exchange; assignment cost at ingest is a pure
    scan. Earlier shapes, both measured at 300k x K=64: crossJoin of
    n*K rows through a per-id sort window (67 s — pays a 19M-row
    exchange+sort), then a per-row Catalyst argmax over literal
    centroid arrays (49 s — shuffle-free but ``aggregate``-fold dot
    products evaluate interpreted per row). The matmul batch kernel
    is the input-contract shape (vectorized pandas/Arrow UDFs, no
    per-row Python).

    Pinned semantics preserved exactly: cosine rounded to 6dp,
    ``argmax`` takes the FIRST max so ties go to the smallest
    cluster; a zero-norm vector or centroid scores -2.0 (below any
    real cosine) so a degenerate centroid never captures anything and
    an all-degenerate row pins to cluster 0; a NULL vector behaves as
    zero-norm. (np.round half-to-even vs Catalyst half-up differs
    only for cosines EXACTLY at a 5e-7 boundary — not reachable from
    the finite-precision dot/sqrt pipeline except by construction;
    the DuckDB oracles re-confirm parity every round.)"""
    cmat = np.array(centroids, dtype=np.float64)  # K x dim
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))  # K

    @F.pandas_udf("int")
    def _best(vs: pd.Series) -> pd.Series:
        rows = [
            np.zeros(cmat.shape[1]) if v is None
            else np.asarray(v, dtype=np.float64)
            for v in vs
        ]
        m = np.vstack(rows) if rows else np.zeros((0, cmat.shape[1]))
        vn = np.sqrt((m * m).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (m @ cmat.T) / (vn[:, None] * cnorm[None, :])
        cos = np.round(cos, 6)
        cos[~np.isfinite(cos)] = -2.0
        return pd.Series(cos.argmax(axis=1).astype("int32"))

    return norm.select(
        F.col(id_col), _best(F.col("_v")).alias("cluster_id")
    )


def ivf_assign(
    embeddings: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF coarse-quantizer assignment: (id, cluster_id) by max cosine
    against either explicit ``centroids`` (the scale path — a
    :func:`kmeans_centroids` sketch; cluster_id = centroid index) or
    the ``n_clusters`` pinned seed centroids (the smallest-id vectors;
    cluster_id = the seed's id — kept for oracle/back-compat). Ties
    resolve by (cosine 6dp desc, seed/centroid asc). At scale this
    table is computed once at ingest and the embedding store is
    written partitioned by cluster_id so probes prune to nprobe
    partitions."""
    if isinstance(n_clusters, bool) or not isinstance(n_clusters, int) \
            or n_clusters < 1:
        raise ValueError(f"n_clusters must be an int >= 1, got {n_clusters!r}")

    from pyspark.sql import Window

    norm = embeddings.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    if centroids is not None:
        return _assign_to_centroids(norm, centroids, id_col)
    seeds = F.broadcast(
        norm.orderBy(id_col).limit(n_clusters).select(
            F.col(id_col).alias("_sid"), F.col("_v").alias("_sv")
        )
    )
    sv, v = F.col("_sv"), F.col("_v")
    cos_seed = F.try_divide(
        _dot(v, sv), F.sqrt(_dot(v, v)) * F.sqrt(_dot(sv, sv))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("_c"), 6).desc_nulls_last(), F.col("_sid").asc()
    )
    return (
        norm.crossJoin(seeds)
        .select(id_col, "_sid", cos_seed.alias("_c"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_sid").alias("cluster_id"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF approximate top-k (the inverted-file ANN shape, Jégou et
    al. 2011): rank the coarse centroids by cosine to the query, scan
    only the ``nprobe`` nearest clusters, exact cosine within.
    Centroids are either explicit (``centroids=`` — a
    :func:`kmeans_centroids` sketch; the probe ranking then happens
    driver-side over K rows, no Spark job) or the pinned smallest-id
    seed vectors.

    Pass a precomputed ``assignments`` frame (from :func:`ivf_assign`
    with the SAME centroids, persisted/partitioned at ingest) to skip
    re-assigning the corpus per query — then the probe is a
    partition-pruned semi-join + one TakeOrdered over
    ~nprobe/n_clusters of the data. Without it, the assignment is
    computed inline (correct but corpus-scan-per-query — test/bring-up
    mode). Recall/cost knob = (n_clusters, nprobe)."""
    if centroids is not None:
        n_clusters = len(centroids)
    if isinstance(nprobe, bool) or not isinstance(nprobe, int) \
            or not (1 <= nprobe <= n_clusters):
        raise ValueError(
            f"nprobe must be an int in [1, n_clusters], got {nprobe!r}"
        )
    if assignments is None:
        assignments = ivf_assign(embeddings, n_clusters, id_col, vec_col,
                                 centroids=centroids)
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    if centroids is not None:
        # same pinned tie rule as the frame path: cos 6dp desc, id asc
        probe_ids = rank_centroids(centroids, query_vec, nprobe)
        cand_ids = assignments.where(
            F.col("cluster_id").isin(probe_ids)
        ).select(id_col)
        cand = embeddings.join(cand_ids, id_col, "left_semi")
        return cosine_topk(cand, query_vec, k, id_col, vec_col)
    norm = embeddings.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    seeds = (
        norm.orderBy(id_col).limit(n_clusters).select(
            F.col(id_col).alias("_sid"), F.col("_v").alias("_sv")
        )
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sv = F.col("_sv")
    q_cos = _dot(sv, q) / (F.sqrt(_dot(sv, sv)) * F.lit(qn))
    probe = (
        seeds.select(F.col("_sid"), q_cos.alias("_qc"))
        .orderBy(F.round(F.col("_qc"), 6).desc(), F.col("_sid").asc())
        .limit(nprobe)
        .select(F.col("_sid").alias("cluster_id"))
    )
    cand_ids = assignments.join(
        F.broadcast(probe), "cluster_id", "left_semi"
    ).select(id_col)
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
