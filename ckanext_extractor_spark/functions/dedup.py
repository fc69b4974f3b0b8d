"""Deduplication operators for large-scale training-data pipelines.

All JVM-side Catalyst expressions (no Python in the hot path): the
tokenizer here is the simple SQL-expressible one (lower + split on
non-alphanumeric) so every operator has a DuckDB-checkable oracle; the
code-aware analyzer variant is a drop-in (swap the tokens column).

Scale notes:
  * exact dedup: one hash-aggregate shuffle on the content hash.
  * minhash: per-doc signatures via explode + groupBy(doc) min() —
    partial aggregation makes the shuffle carry one row per (doc, hash_i).
  * LSH: candidate pairs come from an equi-join on band keys — never an
    all-pairs product; band tuning (rows/band) trades recall vs join
    fan-out.
  * simhash: tf-weighted bit votes as n_bits SUM aggregates over the
    (doc, term) rows — NO bit explosion: the shuffle carries n_bits
    map-side-combined partial sums per doc, never (doc, term) x n_bits
    intermediate rows (the r1 64x amplification of the largest
    intermediate).
  * degenerate-bucket guard: LSH band buckets above `max_bucket_size`
    (boilerplate-heavy corpora) are dropped before the self-join — one
    mega-bucket would otherwise make the join quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda x: x != ""
    )


def _h60(col: Column) -> Column:
    """Portable 60-bit hash (same value in DuckDB: ('0x'||substr(md5(x),1,15))::bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, text_col: str = "content",
                     id_col: str = "doc_id",
                     include_members: bool = False) -> DataFrame:
    """Hash-groupBy exact dedup: one row per content group with keeper id
    (min doc_id) and group size. Filter group_size > 1 for dups.

    ``include_members`` adds a member_ids list — OFF by default because
    collect_list is unbounded for a pathological mega-group; at scale get
    membership by semi-joining the corpus back on content_hash instead."""
    aggs = [
        F.count("*").alias("group_size"),
        F.min(id_col).alias("keeper_doc_id"),
    ]
    if include_members:
        aggs.append(F.sort_array(F.collect_list(id_col)).alias("member_ids"))
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(*aggs)
    )


def minhash_signatures(df: DataFrame, text_col: str = "content",
                       id_col: str = "doc_id", n_hashes: int = 8) -> DataFrame:
    """Per-doc minhash signature over the distinct-token (1-shingle) set.

    n_hashes independent hash functions h_i(t) = h60('s{i}#' + t); the
    signature column is an array<long> of per-function minima."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("term")
    )
    aggs = [
        F.min(_h60(F.concat(F.lit(f"s{i}#"), F.col("term")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = tok.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"mh{i}" for i in range(n_hashes)]).alias("minhash")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "content",
                      id_col: str = "doc_id", n_hashes: int = 8,
                      rows_per_band: int = 2,
                      max_bucket_size: int | None = 10_000) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band.

    Bands are contiguous slices of the signature; candidates come from a
    self-equi-join on (band_idx, band_key) — the scalable alternative to
    an all-pairs similarity join. Band buckets larger than
    ``max_bucket_size`` are dropped before the join (a single degenerate
    band key — e.g. shared boilerplate — would otherwise contribute
    O(bucket^2) join rows); docs in a dropped bucket can still pair via
    their other bands."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes)
    n_bands = n_hashes // rows_per_band
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "#",
                            *[
                                F.element_at("minhash", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_key")
    if max_bucket_size is not None:
        ok = (
            bands.groupBy("band_idx", "band_key")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .select("band_idx", "band_key")
        )
        bands = bands.join(ok, ["band_idx", "band_key"], "left_semi")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band_idx") == F.col(f"b.band_idx"))
            & (F.col(f"a.band_key") == F.col(f"b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_candidate_pairs(df: DataFrame, text_col: str = "content",
                            id_col: str = "doc_id",
                            threshold: float = 0.5,
                            candidates: DataFrame | None = None) -> DataFrame:
    """Exact token-set Jaccard for (candidate) pairs.

    Without `candidates`, verifies ALL pairs sharing >= 1 token via a
    token-inverted self-join (correct but quadratic in the worst case —
    pass LSH candidates for scale)."""
    tok = df.select(
        F.col(id_col).alias("jid"),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("term"),
    )
    card = tok.groupBy("jid").agg(F.count("*").alias("n"))
    if candidates is None:
        a = tok.alias("a")
        b = tok.alias("b")
        inter = (
            a.join(b, (F.col("a.term") == F.col("b.term"))
                   & (F.col("a.jid") < F.col("b.jid")))
            .groupBy(F.col("a.jid").alias("doc_a"), F.col("b.jid").alias("doc_b"))
            .agg(F.count("*").alias("i"))
        )
    else:
        pairs = candidates.select("doc_a", "doc_b")
        ta = tok.select(F.col("jid").alias("doc_a"), "term")
        tb = tok.select(F.col("jid").alias("doc_b"), "term")
        inter = (
            pairs.join(ta, "doc_a")
            .join(tb, ["doc_b", "term"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("i"))
        )
    ca = card.withColumnRenamed("jid", "doc_a").withColumnRenamed("n", "na")
    cb = card.withColumnRenamed("jid", "doc_b").withColumnRenamed("n", "nb")
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "content",
              id_col: str = "doc_id", n_bits: int = 64) -> DataFrame:
    """tf-weighted simhash fingerprint (n_bits <= 60 uses the portable
    hash; bit b's vote is +tf if hash bit set else -tf).

    Bit-sliced aggregation: each bit's vote is its own SUM over the
    (doc, term) rows, so Catalyst runs ONE partial+final hash aggregate
    with n_bits accumulator slots per doc — no per-bit row explosion and a
    single shuffle whose rows are (doc, n_bits partial sums)."""
    tf = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _h60(F.col("term")))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"_w{b}")
        for b in range(n_bits)
    ]
    per_doc = tf.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        sim = sim + F.when(
            F.col(f"_w{b}") > 0,
            F.expr(f"shiftleft(cast(1 as bigint), {b})"),
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 50,
                         checkpoint: bool = True) -> DataFrame:
    """Distributed connected components over an undirected edge list —
    the clustering step of a near-dup pipeline (pairs -> components ->
    one representative per component).

    Alternating large-star / small-star (the MapReduce CC algorithm of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): each round is two groupBy(min) aggregates + joins, and the
    edge set converges to stars (every node -> its component minimum) in
    O(log n) rounds even for path graphs — unlike plain min-label
    propagation, whose round count is the graph DIAMETER (a 1M-doc
    boilerplate chain would need 1M rounds). No collect_set: per-node
    neighborhood minima are hash aggregates, so a celebrity node (one doc
    near-dup to millions) never materializes its neighbor list on one
    task.

    Returns (node, cluster_id) for every node appearing in an edge,
    cluster_id = the smallest node id in its component. Nodes with no
    edges don't appear (callers union singletons back if needed).
    ``checkpoint`` truncates the iterative plan's lineage each round via
    localCheckpoint — without it the plan doubles per round and Catalyst
    analysis time explodes by round ~8.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def _chk(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if checkpoint else df

    def _canon_sig(df: DataFrame) -> tuple[int, int]:
        # xor-fold (order-independent, overflow-free; edges are distinct)
        row = df.select(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(greatest(u, v), least(u, v)))"),
                F.lit(0),
            ).alias("s"),
        ).collect()[0]
        return int(row["n"]), int(row["s"])

    e = _chk(e)
    prev = _canon_sig(e)
    for _ in range(max_iter):
        # large-star: every node u connects its strictly-larger
        # neighbors to min(N(u) + {u})
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        e = (
            bidir.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: direct edges large->small; every node u connects
        # its (smaller) neighbors and itself to min(N(u))
        directed = (
            e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )
        mins = directed.groupBy("u").agg(F.min("v").alias("m"))
        joined = directed.join(mins, "u")
        e = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        e = _chk(e)
        sig = _canon_sig(e)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged edge set is a star forest: u -> component min
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
        .union(
            e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id"))
        )
        .distinct()
    )


def neardup_clusters(df: DataFrame, text_col: str = "content",
                     id_col: str = "doc_id", threshold: float = 0.5,
                     n_hashes: int = 8, rows_per_band: int = 2,
                     candidates: DataFrame | None = None,
                     include_singletons: bool = False) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidate pairs ->
    exact-Jaccard verify at ``threshold`` -> connected components.
    Returns (doc_id, cluster_id); with ``include_singletons`` every
    corpus doc appears (un-paired docs cluster to themselves).

    Pass ``candidates`` to skip LSH (e.g. the all-pairs verify on a
    sample, or pre-computed pairs from another blocking scheme)."""
    if candidates is None:
        candidates = minhash_lsh_pairs(
            df, text_col, id_col, n_hashes, rows_per_band
        )
    verified = jaccard_candidate_pairs(
        df, text_col, id_col, threshold, candidates=candidates
    )
    comp = connected_components(verified, "doc_a", "doc_b").select(
        F.col("node").alias(id_col), "cluster_id"
    )
    if include_singletons:
        comp = (
            df.select(id_col)
            .join(comp, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("cluster_id", F.col(id_col).cast("long")).alias(
                    "cluster_id"
                ),
            )
        )
    return comp


def dedup_representatives(df: DataFrame, clusters: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """Keep one representative per near-dup cluster: the smallest doc id
    of each component survives; docs absent from ``clusters`` (no
    near-dup pair) survive untouched. One broadcast-or-shuffle left join
    against the (doc, cluster) frame — the corpus is never collected."""
    keep = clusters.where(
        F.col(id_col) == F.col("cluster_id")
    ).select(id_col)
    unpaired = df.select(id_col).join(
        clusters.select(id_col), id_col, "left_anti"
    )
    return df.join(keep.union(unpaired), id_col, "left_semi")
