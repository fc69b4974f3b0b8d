"""Embedding sketches for 100 TB-scale vector pipelines: deterministic
signed random projection (Achlioptas 2003 / Charikar SimHash over
embeddings) and product quantization (Jégou et al. 2011) with ADC
search.

Why these two: at web scale the embedding table itself is the cost —
a 100 TB corpus's float32 vectors don't fit hot storage, and every
ANN/dedup stage downstream wants something smaller to scan. SRP gives
a distance-preserving *narrow* float sketch and a 1-bit-per-plane
binary signature; PQ gives an 8-bit-per-subspace code whose
asymmetric-distance (ADC) scan approximates inner products while
reading m bytes per vector instead of 4*dim.

Spark-first shapes, no UDFs anywhere:

* SRP signs come from the pinned portable md5-60-bit hash of
  ``seed:i:j`` — no RNG state to broadcast, reproducible across
  engines (the DuckDB oracle regenerates the same matrix), and the
  sign "matrix" is an in-plan spine (range x range cross join,
  dim*out_dim rows, broadcast), never a driver-side array.
* SRP projection = posexplode(vec) ⋈ broadcast spine -> (id, j) hash
  aggregate (map-side partial combine); one shuffle keyed (id, j).
* PQ codebooks reuse :func:`similarity.kmeans_centroids` per
  subspace (the sampled deterministic Lloyd sketch); encode is
  subvector-explode ⋈ broadcast codebook -> ``min_by`` hash-aggregate
  argmin (no window shuffle); ADC search joins the m*K-row broadcast
  lookup table and TakeOrdereds the per-id sums — the scan reads only
  the code column.

Reference scope note: the reference engine (stadt-karlsruhe/
ckanext-extractor) delegates retrieval to Solr and has no vector
path; these operators extend the training-data-pipeline family the
build brief names (similarity search / embedding near-dup) to the
compressed-domain representations a real 100 TB deployment scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.dedup import _h60
from ckanext_extractor_spark.functions.similarity import (
    _to_double,
    kmeans_centroids,
)


def _check_pos_int(name: str, v: int) -> None:
    if isinstance(v, bool) or not isinstance(v, int) or v < 1:
        raise ValueError(f"{name} must be an int >= 1, got {v!r}")


def _sign(seed: str, i: Column, j: Column) -> Column:
    """±1 from the pinned portable hash of 'seed:i:j' (parity bit)."""
    h = _h60(F.concat_ws(":", F.lit(seed), i.cast("string"),
                         j.cast("string")))
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _sign_spine(spark, in_dim: int, out_dim: int, seed: str) -> DataFrame:
    """(i, j, sign) spine, in_dim*out_dim rows — generated in-plan from
    two ranges (no driver-side matrix), broadcast to the join."""
    return (
        spark.range(in_dim).select(F.col("id").alias("_i"))
        .crossJoin(spark.range(out_dim).select(F.col("id").alias("_j")))
        .select("_i", "_j",
                _sign(seed, F.col("_i"), F.col("_j")).alias("_s"))
    )


def srp_project(
    embeddings: DataFrame,
    out_dim: int = 16,
    seed: str = "srp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed random projection: (id, j, ROUND(value, 6)) with
    value_j = sum_i x_i * sign(md5(seed:i:j)) — the Achlioptas
    sparse-free ±1 variant of Johnson-Lindenstrauss (E[<y_a, y_b>] =
    <x_a, x_b>), emitted EXPLODED so downstream regrouping is free
    and the oracle comparison is row-wise.

    Plan: posexplode(vec) -> join the broadcast in-plan sign spine on
    i -> one (id, j) hash aggregate with map-side partial combine.
    One shuffle, keyed (id, j); nothing on the driver."""
    _check_pos_int("out_dim", out_dim)
    spine = F.broadcast(
        _sign_spine(embeddings.sparkSession, _infer_dim(embeddings, vec_col),
                    out_dim, seed)
    )
    x = embeddings.select(
        F.col(id_col),
        F.posexplode(_to_double(F.col(vec_col))).alias("_i", "_x"),
    )
    return (
        x.join(spine, "_i")
        .groupBy(id_col, F.col("_j").alias("j"))
        .agg(F.round(F.sum(F.col("_x") * F.col("_s")), 6).alias("value"))
    )


def srp_bits(
    embeddings: DataFrame,
    n_bits: int = 16,
    seed: str = "srp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Charikar-SimHash binary signature over embeddings: (id, bits)
    with bit_j = [projection_j >= 0], packed little-endian into one
    BIGINT (n_bits <= 60 so the value is portable to the oracle's
    signed 64-bit arithmetic). Hamming distance between signatures
    estimates angular distance; the packed long groups/joins like any
    key — the cheapest embedding near-dup blocking key there is."""
    _check_pos_int("n_bits", n_bits)
    if n_bits > 60:
        raise ValueError(f"n_bits must be <= 60, got {n_bits}")
    proj = srp_project(embeddings, out_dim=n_bits, seed=seed,
                       id_col=id_col, vec_col=vec_col)
    bit = F.when(F.col("value") >= 0, F.lit(1)).otherwise(F.lit(0))
    # shiftleft with a COLUMN shift amount only exists in SQL form;
    # long arithmetic (not pow->double) keeps bit 59 exact.
    weight = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
    return (
        proj.groupBy(id_col)
        .agg(F.sum(bit.cast("long") * weight).alias("bits"))
    )


def _infer_dim(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(F.col(vec_col)).alias("_d")).first()
    if row is None or row["_d"] is None or row["_d"] < 1:
        raise ValueError("cannot infer embedding dim from an empty frame")
    return int(row["_d"])


# ----------------------------------------------------------------- PQ


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    rounds: int = 0,
    sample_frac: "float | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[list[float]]]":
    """Per-subspace codebooks (m x n_codes x dim/m): the vector is cut
    into ``m`` equal contiguous subvectors and each subspace gets its
    own :func:`similarity.kmeans_centroids` sketch (deterministic
    hash-sample -> smallest-id seeds -> ``rounds`` Lloyd rounds).
    ``rounds=0`` = the pinned smallest-id-seed codebooks (the
    oracle-checkable bring-up shape, q111/q114 precedent); production
    passes rounds>=1 + sample_frac. dim must divide evenly by m."""
    _check_pos_int("m", m)
    _check_pos_int("n_codes", n_codes)
    dim = _infer_dim(embeddings, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = embeddings.select(
            F.col(id_col),
            F.slice(_to_double(F.col(vec_col)), s * sub + 1, sub)
            .alias("_sub"),
        )
        books.append(kmeans_centroids(
            sliced, n_clusters=n_codes, rounds=rounds,
            sample_frac=sample_frac, id_col=id_col, vec_col="_sub",
        ))
    return books


def _codebook_df(spark, codebooks) -> DataFrame:
    rows = [
        (s, c, [float(x) for x in cent])
        for s, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    return spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: (id, subspace, code) — each subvector snapped to its
    subspace's nearest centroid by squared L2 (ties pinned: distance
    6dp asc, code asc). m BIGINT-free ints per vector replace 4*dim
    bytes; at ingest this table is what the ADC scan reads.

    Plan: one in-plan subvector explode (m structs per row) ⋈ the
    broadcast (m*n_codes)-row codebook -> ``min_by`` hash-aggregate
    argmin per (id, subspace) — a map-side-combinable aggregate, NOT a
    row_number window, so the shuffle carries one row per (id,
    subspace) not per candidate code."""
    m = len(codebooks)
    if m < 1:
        raise ValueError("codebooks must be non-empty")
    sub = len(codebooks[0][0])
    subs = F.explode(F.array(*[
        F.struct(
            F.lit(s).alias("subspace"),
            F.slice(_to_double(F.col(vec_col)), s * sub + 1, sub)
            .alias("_sub"),
        )
        for s in range(m)
    ])).alias("_e")
    x = embeddings.select(F.col(id_col), subs).select(
        id_col, F.col("_e.subspace").alias("subspace"),
        F.col("_e._sub").alias("_sub"),
    )
    cb = F.broadcast(_codebook_df(embeddings.sparkSession, codebooks))
    d2 = F.aggregate(
        F.zip_with(F.col("_sub"), F.col("centroid"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v,
    )
    return (
        x.join(cb, "subspace")
        .select(id_col, "subspace", "code",
                F.round(d2, 6).alias("_d"))
        .groupBy(id_col, "subspace")
        .agg(F.min_by(
            F.col("code"),
            F.struct(F.col("_d").alias("d"), F.col("code").alias("c")),
        ).alias("code"))
    )


def pq_encode_packed(
    embeddings: DataFrame,
    codebooks: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes in the production storage layout: ONE row per vector,
    (id, codes array<int> of length m) — what the 100 TB code table
    actually looks like on disk (m bytes-ish per vector, scan-friendly,
    no per-subspace row blowup). One extra (id) hash aggregate over
    :func:`pq_encode`'s EAV rows at ingest buys the query path a
    completely shuffle-free ADC scan (:func:`pq_adc_topk_packed`)."""
    eav = pq_encode(embeddings, codebooks, id_col, vec_col)
    return (
        eav.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(
            F.struct(F.col("subspace"), F.col("code")))).alias("_sc"))
        .select(
            id_col,
            F.transform(F.col("_sc"), lambda s: s["code"])
            .alias("codes"),
        )
    )


def pq_adc_topk_packed(
    codes: DataFrame,
    codebooks: "list[list[list[float]]]",
    query_vec: "list[float]",
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Shuffle-free ADC top-k over PACKED codes: the m x n_codes
    lookup table enters the plan as literal arrays and the score is
    sum_s table[s][codes[s]] — a pure whole-stage-codegen projection
    over the code column followed by one TakeOrdered. No join, no
    aggregate, no exchange: the cheapest possible per-query plan over
    a compressed 100 TB corpus. Same scores as :func:`pq_adc_topk`
    (pinned by test)."""
    _check_pos_int("k", k)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if len(query_vec) != m * sub:
        raise ValueError(
            f"query dim {len(query_vec)} != codebook dim {m * sub}")
    q = np.asarray(query_vec, dtype=np.float64)
    score = None
    for s, book in enumerate(codebooks):
        qs = q[s * sub:(s + 1) * sub]
        tab = F.array(*[
            F.lit(float(round(float(np.dot(qs, np.asarray(
                cent, dtype=np.float64))), 6)))
            for cent in book
        ])
        part = F.element_at(tab, F.col("codes")[s] + 1)
        score = part if score is None else score + part
    return (
        codes.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: "list[list[list[float]]]",
    query_vec: "list[float]",
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: score(id) =
    sum_s <q_s, centroid[s][code_s]> — the ADC inner-product
    approximation (dot decomposes exactly over contiguous subspaces,
    so quantization is the only error). Returns (id, ROUND(score, 6))
    top-k, ties pinned (score 6dp desc, id asc).

    Plan: the m*n_codes lookup table is computed driver-side in numpy
    (a sketch, not data), broadcast, joined on (subspace, code), one
    per-id hash aggregate, one TakeOrdered. The corpus scan reads only
    the code column — this is the whole point of PQ at 100 TB."""
    _check_pos_int("k", k)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if len(query_vec) != m * sub:
        raise ValueError(
            f"query dim {len(query_vec)} != codebook dim {m * sub}")
    q = np.asarray(query_vec, dtype=np.float64)
    rows = []
    for s, book in enumerate(codebooks):
        qs = q[s * sub:(s + 1) * sub]
        for c, cent in enumerate(book):
            rows.append((s, c,
                         float(round(float(np.dot(qs, np.asarray(
                             cent, dtype=np.float64))), 6))))
    spark = codes.sparkSession
    table = F.broadcast(spark.createDataFrame(
        rows, "subspace int, code int, part double"))
    return (
        codes.join(table, ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    codes: DataFrame,
    codebooks: "list[list[list[float]]]",
    query_vec: "list[float]",
    k: int = 10,
    nprobe: int = 2,
    assignments: DataFrame | None = None,
    centroids: "list[list[float]] | None" = None,
    embeddings: DataFrame | None = None,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse probe + compressed-domain ADC scoring — the
    composition every billion-vector deployment actually runs (FAISS
    IVFxx,PQyy): the IVF assignment prunes the scan to ~nprobe/
    n_clusters of the corpus, then ADC scores the survivors from their
    PQ codes alone. Both the assignment table and the code table are
    computed once at ingest; the per-query work is a driver-side
    centroid ranking (a K-row sketch), one semi-join, one broadcast
    table join, one TakeOrdered.

    Centroid source mirrors :func:`similarity.ivf_topk`: explicit
    ``centroids`` (kmeans sketch; cluster_id = index) or the pinned
    smallest-id seed vectors from ``embeddings`` (cluster_id = the
    seed's id). ``nprobe = n_clusters`` degrades gracefully to
    :func:`pq_adc_topk` over everything (pinned by test)."""
    from ckanext_extractor_spark.functions.similarity import (
        ivf_assign,
        rank_centroids,
    )

    if centroids is not None:
        n_clusters = len(centroids)
    if isinstance(nprobe, bool) or not isinstance(nprobe, int) \
            or not (1 <= nprobe <= n_clusters):
        raise ValueError(
            f"nprobe must be an int in [1, n_clusters], got {nprobe!r}")
    if centroids is not None:
        probe_ids = rank_centroids(centroids, query_vec, nprobe)
        if assignments is None:
            if embeddings is None:
                raise ValueError(
                    "ivfpq_topk needs assignments or embeddings")
            assignments = ivf_assign(embeddings, n_clusters, id_col,
                                     vec_col, centroids=centroids)
    else:
        if embeddings is None:
            raise ValueError(
                "pinned-seed ivfpq_topk needs embeddings for the seeds")
        seed_rows = (
            embeddings.select(
                F.col(id_col), _to_double(F.col(vec_col)).alias("_v"))
            .orderBy(id_col).limit(n_clusters).collect()
        )
        probe_ids = rank_centroids(
            [list(r["_v"]) for r in seed_rows], query_vec, nprobe,
            keys=[r[id_col] for r in seed_rows],
        )
        if assignments is None:
            assignments = ivf_assign(embeddings, n_clusters, id_col,
                                     vec_col)
    cand_ids = assignments.where(
        F.col("cluster_id").isin(probe_ids)).select(id_col)
    cand = codes.join(cand_ids, id_col, "left_semi")
    return pq_adc_topk(cand, codebooks, query_vec, k, id_col)


def srp_neardup_pairs(
    embeddings: DataFrame,
    n_bits: int = 24,
    n_bands: int = 3,
    max_hamming: int = 6,
    seed: str = "srp",
    max_bucket_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup candidate pairs from SRP sign bits alone —
    banded Charikar signatures: two vectors collide if ANY of the
    ``n_bands`` contiguous (n_bits/n_bands)-bit slices of their
    signature match exactly, then survive if total hamming distance
    <= ``max_hamming`` (hamming ~ angular distance; bits never leave
    integer space, so there is no float comparison anywhere).
    Output: (id_a, id_b, hamming), id_a < id_b, deduped across bands.

    Scale shape (the LSH/minhash discipline): candidates come from a
    band-key equi-join; buckets larger than ``max_bucket_size`` are
    dropped BEFORE the join (degenerate-bucket guard — a band key
    shared by a million vectors contributes O(bucket²) join rows and
    ~zero precision); verification reads only the two packed longs.
    At 100 TB the float vectors are never touched."""
    _check_pos_int("n_bands", n_bands)
    _check_pos_int("max_bucket_size", max_bucket_size)
    if isinstance(max_hamming, bool) or not isinstance(max_hamming, int) \
            or max_hamming < 0:
        raise ValueError(
            f"max_hamming must be an int >= 0, got {max_hamming!r}")
    if n_bits % n_bands != 0:
        raise ValueError(f"n_bits {n_bits} not divisible by "
                         f"n_bands {n_bands}")
    w = n_bits // n_bands
    bits = srp_bits(embeddings, n_bits=n_bits, seed=seed,
                    id_col=id_col, vec_col=vec_col)
    band = F.explode(F.array(*[F.lit(b) for b in range(n_bands)])) \
        .alias("_b")
    keyed = bits.select(id_col, "bits", band).withColumn(
        "_key",
        F.expr(f"(bits >> (_b * {w})) & {(1 << w) - 1}"),
    )
    # groupBy + semi-join, not a windowed count: partial-aggregates
    # map-side and never sorts the keyed rows (the
    # fingerprint_candidates prune shape; code-review r5)
    ok = (
        keyed.groupBy("_b", "_key").agg(F.count("*").alias("_bsz"))
        .where(F.col("_bsz") <= max_bucket_size)
        .select("_b", "_key")
    )
    keyed = keyed.join(ok, ["_b", "_key"], "left_semi")
    a = keyed.select(F.col(id_col).alias("_ida"),
                     F.col("bits").alias("_bita"), "_b", "_key")
    b = keyed.select(F.col(id_col).alias("_idb"),
                     F.col("bits").alias("_bitb"), "_b", "_key")
    cand = (
        a.join(b, ["_b", "_key"])
        .where(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb", "_bita", "_bitb")
        .distinct()
    )
    ham = F.bit_count(
        F.col("_bita").bitwiseXOR(F.col("_bitb"))).cast("int")
    return (
        cand.select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
