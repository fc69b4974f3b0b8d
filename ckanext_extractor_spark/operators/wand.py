"""Query fast path: block-max WAND top-k over encoded segments
(SURVEY.md Q2-Q4 fast path; Ding & Suel-style BMW, re-expressed with
numpy gallops).

Two execution strategies, both rank-identical to the slow path
(operators/query.py), tie-break score desc then doc_id asc:

* ``wand_topk`` — driver-side: the query's term segments (pruned to their
  term_buckets at read) are collected and decoded; document-at-a-time WAND
  with (a) full-list upper bounds for pivoting, (b) per-block block-max
  refinement to skip non-competitive pivots, (c) vectorized
  np.searchsorted cursor gallops. Low-latency path for interactive k≪N.

* ``exact_topk`` — vectorized brute merge (concatenate -> unique ->
  bincount -> argpartition). No pruning, but every op is numpy; the
  baseline the WAND path is benchmarked against, and the kernel the
  distributed per-bucket scorer reuses.

At cluster scale the same kernels run inside mapInPandas per term_bucket
(segments are bucket-partitioned parquet), followed by a global top-k
merge — see query_segments_distributed.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1
from ckanext_extractor_spark.operators.codec import (
    BLOCK_SIZE,
    decode_posting_blocks,
    decode_posting_list,
)


class DeadDocs:
    """Tombstone lookup: doc_id -> kill_seq (the seq of the build/delete
    that invalidated the doc's older postings). A posting row from a
    generation with seq g is dead iff kill_seq > g. Vectorized lookup via
    sorted arrays + searchsorted — no per-posting python.

    Reference analog: Lucene per-segment liveDocs; the reference itself
    delegates deletes to Solr (plugin.py:117-123), here owned natively so a
    1-doc delete touches zero segment files (SURVEY.md Q6 tombstone plan).
    """

    __slots__ = ("doc_ids", "kill_seqs")

    def __init__(self, pairs: "dict[int, int] | None" = None):
        items = sorted((pairs or {}).items())
        self.doc_ids = np.fromiter(
            (d for d, _ in items), dtype=np.int64, count=len(items)
        )
        self.kill_seqs = np.fromiter(
            (s for _, s in items), dtype=np.int64, count=len(items)
        )

    def __len__(self) -> int:
        return len(self.doc_ids)

    def live_mask(self, ids: np.ndarray, gen_seq: int) -> np.ndarray:
        """Boolean mask of `ids` (sorted or not) still live at gen_seq."""
        if len(self.doc_ids) == 0:
            return np.ones(len(ids), dtype=bool)
        idx = np.searchsorted(self.doc_ids, ids)
        idx = np.minimum(idx, len(self.doc_ids) - 1)
        found = self.doc_ids[idx] == ids
        killed = found & (self.kill_seqs[idx] > gen_seq)
        return ~killed


def _row_gen_seq(row) -> int:
    """Generation seq of a segment row; 0 for rows without one (single-
    generation / standalone use)."""
    try:
        v = row["gen_seq"]
        return int(v) if v is not None else 0
    except (KeyError, ValueError, IndexError, TypeError):
        return 0


@dataclass
class TermPostings:
    term: str
    idf: float
    doc_ids: np.ndarray  # sorted asc
    tfs: np.ndarray
    doc_lens: np.ndarray
    block_last_doc: np.ndarray
    block_max_tfn: np.ndarray

    @property
    def upper_bound(self) -> float:
        if len(self.block_max_tfn) == 0:
            return 0.0
        return self.idf * (BM25_K1 + 1.0) * float(self.block_max_tfn.max())


def load_term_postings(
    spark,
    segments: "str | DataFrame",
    terms: list[str],
    n_docs: int,
    avgdl: float,
    n_buckets: int = 64,
    dead: "DeadDocs | None" = None,
) -> list[TermPostings]:
    """Read the query terms' segment rows, decode, and merge salt shards
    per term. idf from the decoded df (= n live postings).

    ``segments`` is a parquet path (cold: bucket-pruned directory read) or
    an already-cached segments DataFrame (warm: in-memory term filter —
    the 'warm dictionary' serving mode of BASELINE.md's query protocol)."""
    from ckanext_extractor_spark.operators.segments import read_segments

    if isinstance(segments, str):
        seg_df = read_segments(spark, segments, terms, n_buckets)
    else:
        seg_df = segments.where(F.col("term").isin(terms))
    rows = seg_df.collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    return [
        term_postings_from_rows(term, shard_rows, n_docs, avgdl, dead=dead)
        for term, shard_rows in by_term.items()
    ]


def term_postings_from_rows(
    term: str,
    shard_rows: list,
    n_docs: int,
    avgdl: float,
    dead: "DeadDocs | None" = None,
) -> TermPostings:
    """Decode one term's segment rows (salt shards and/or generation
    shards) into a merged TermPostings, dropping tombstoned postings.
    Pure driver-side numpy."""
    ids, tfs, dls = [], [], []
    for r in shard_rows:
        i, t, d = decode_posting_list(bytes(r["blob"]))
        if dead is not None and len(dead):
            keep = dead.live_mask(i, _row_gen_seq(r))
            i, t, d = i[keep], t[keep], d[keep]
        ids.append(i)
        tfs.append(t)
        dls.append(d)
    doc_ids = np.concatenate(ids)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfv = np.concatenate(tfs)[order]
    dlv = np.concatenate(dls)[order]
    # shard block metadata stays valid as per-shard upper bounds; for the
    # merged list rebuild block-max at BLOCK_SIZE granularity
    k1, b = BM25_K1, BM25_B
    df = len(doc_ids)
    idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    tfn = tfv / (tfv + k1 * (1.0 - b + b * dlv / avgdl))
    nb = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    bl = np.empty(nb, dtype=np.int64)
    bm = np.empty(nb, dtype=np.float64)
    for bi in range(nb):
        sl = slice(bi * BLOCK_SIZE, (bi + 1) * BLOCK_SIZE)
        bl[bi] = doc_ids[sl][-1]
        bm[bi] = tfn[sl].max()
    return TermPostings(term, idf, doc_ids, tfv, dlv, bl, bm)


class LazyTermPostings:
    """Segment-row-backed postings that decode ON DEMAND, per block.

    Holds only the rows' metadata (n_postings, block_last_doc,
    block_max_tfn, block_offs) plus the raw blobs; ``materialize()``
    fully decodes (for essential MaxScore lists), ``probe_scores()``
    decodes only the blocks that can contain the given candidate docs
    (for non-essential lists — the common-term case where most of a huge
    list is skipped; VERDICT r2 next #3; Lucene analog: impact-sorted
    skip data lets scorers seek without scanning the postings file).

    Valid ONLY when the index has no tombstones: df (hence idf) comes
    from the rows' n_postings metadata, which counts dead postings too —
    callers route tombstoned indexes to the eager decode path instead.
    """

    __slots__ = ("term", "n", "idf", "avgdl", "_shards", "_max_tfn",
                 "_n_docs")

    def __init__(self, term: str, shard_rows: list, n_docs: int,
                 avgdl: float):
        self.term = term
        self.avgdl = avgdl
        shards = []
        n = 0
        max_tfn = 0.0
        for r in shard_rows:
            np_r = int(r["n_postings"])
            if not np_r:
                continue
            bm = np.asarray(r["block_max_tfn"], dtype=np.float64)
            shards.append(
                (
                    bytes(r["blob"]),
                    np_r,
                    np.asarray(r["block_last_doc"], dtype=np.int64),
                    np.asarray(r["block_offs"], dtype=np.int64),
                )
            )
            n += np_r
            if bm.size:
                max_tfn = max(max_tfn, float(bm.max()))
        self._shards = shards
        self.n = n
        self._n_docs = n_docs
        self.idf = float(np.log(1.0 + (n_docs - n + 0.5) / (n + 0.5)))
        self._max_tfn = max_tfn

    def __len__(self) -> int:
        return self.n

    @property
    def doc_ids(self):  # len()-compat with TermPostings call sites
        raise AttributeError("LazyTermPostings: materialize() first")

    @property
    def upper_bound(self) -> float:
        return self.idf * (BM25_K1 + 1.0) * self._max_tfn

    def materialize(self) -> TermPostings:
        """Full decode + shard merge — delegates to
        term_postings_from_rows (the lazy path is tombstone-free by
        construction) so the merge/argsort/block-max-rebuild logic
        exists exactly once and cannot drift between the lazy and
        eager paths (code-review r5 finding)."""
        rows = [{"blob": blob} for blob, _, _, _ in self._shards]
        return term_postings_from_rows(
            self.term, rows, self._n_docs, self.avgdl, dead=None)

    def probe_scores(self, cand: np.ndarray, k1: float = BM25_K1,
                     b: float = BM25_B) -> np.ndarray:
        """BM25 contributions of this term at the sorted candidate docs
        (0.0 where absent), decoding only blocks whose doc range
        intersects ``cand``. Each doc lives in exactly one salt shard, so
        per-shard contributions sum without overlap."""
        total = np.zeros(cand.size, dtype=np.float64)
        for blob, n_post, bl, bo in self._shards:
            sel = np.unique(np.searchsorted(bl, cand))
            sel = sel[sel < bl.size]
            if sel.size == 0:
                continue
            ids, tfs, dls = decode_posting_blocks(blob, n_post, sel, bo, bl)
            idx = np.searchsorted(ids, cand)
            idxc = np.minimum(idx, ids.size - 1)
            hit = ids[idxc] == cand
            if hit.any():
                tf = tfs[idxc[hit]].astype(np.float64)
                dl = dls[idxc[hit]].astype(np.float64)
                total[hit] += (
                    self.idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                )
        return total


def maxscore_topk_lazy(
    lazy_lists: "list[LazyTermPostings]",
    k: int,
    avgdl: float,
    conjunctive: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """MaxScore over lazily-decoded lists: essential lists materialize,
    non-essential lists decode ONLY the blocks their candidates touch.
    Rank-identical to maxscore_topk/exact_topk (pinned by tests); the win
    is skew — a rare term + huge common lists stops paying the common
    lists' full decode (the dominant cost once blobs are large).

    Conjunctive queries materialize everything and route to exact_topk
    (the progressive intersection already touches only candidates after
    the smallest list is decoded — a block-skipping AND is possible but
    the smallest-list decode dominates either way)."""
    lists = [tp for tp in lazy_lists if len(tp)]
    if not lists:
        return []
    if conjunctive:
        if len(lists) < len(lazy_lists):
            return []
        return exact_topk([tp.materialize() for tp in lists], k, avgdl,
                          True, k1, b)
    order = sorted(lists, key=lambda tp: -tp.upper_bound)
    ubs = np.array([tp.upper_bound for tp in order])
    first = order[0].materialize()
    s0 = _scores(first, np.arange(len(first.doc_ids)), avgdl, k1, b)
    if s0.size >= k:
        theta = float(np.partition(s0, s0.size - k)[s0.size - k])
    else:
        theta = -np.inf
    suffix = np.cumsum(ubs[::-1])[::-1]
    n_essential = len(order)
    for e in range(1, len(order) + 1):
        tail = float(suffix[e]) if e < len(order) else 0.0
        if tail < theta:
            n_essential = e
            break
    essential = [first] + [tp.materialize() for tp in order[1:n_essential]]
    cand = essential[0].doc_ids
    for tp in essential[1:]:
        cand = np.union1d(cand, tp.doc_ids)
    total = np.zeros(cand.size, dtype=np.float64)
    for tp in essential:
        idx = np.searchsorted(tp.doc_ids, cand)
        idxc = np.minimum(idx, len(tp.doc_ids) - 1)
        hit = tp.doc_ids[idxc] == cand
        if hit.any():
            total[hit] += _scores(tp, idxc[hit], avgdl, k1, b)
    for tp in order[n_essential:]:
        total += tp.probe_scores(cand, k1, b)
    return _topk_select(cand, total, k)


def _scores(tp: TermPostings, idx: np.ndarray, avgdl: float,
            k1: float, b: float) -> np.ndarray:
    tf = tp.tfs[idx].astype(np.float64)
    dl = tp.doc_lens[idx].astype(np.float64)
    return tp.idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def exclude_docs(tp: TermPostings, ex_ids: "np.ndarray") -> TermPostings:
    """``tp`` minus postings of ``ex_ids`` (sorted asc) — Lucene MUST_NOT
    as a pre-score filter. idf and the block-max arrays are KEPT:
    exclusion is a filter, so surviving docs score exactly as in the
    unfiltered query (Lucene parity — a prohibited clause never changes
    scoring), and block maxima remain valid (possibly loose) upper
    bounds after row removal — WAND/MaxScore pruning only needs an
    over-estimate."""
    n = len(tp.doc_ids)
    if ex_ids.size == 0 or n == 0:
        return tp
    idx = np.searchsorted(ex_ids, tp.doc_ids)
    hit = np.zeros(n, dtype=bool)
    inb = idx < ex_ids.size
    hit[inb] = ex_ids[idx[inb]] == tp.doc_ids[inb]
    if not hit.any():
        return tp
    keep = ~hit
    return TermPostings(
        tp.term, tp.idf, tp.doc_ids[keep], tp.tfs[keep],
        tp.doc_lens[keep], tp.block_last_doc, tp.block_max_tfn,
    )


def boost_postings(tp: TermPostings, boost: float) -> TermPostings:
    """``tp`` with every score contribution multiplied by ``boost``.
    BM25 is linear in idf, so scaling idf scales the term's whole score
    exactly — the same mechanism the boolean-query evaluator uses for
    ``term^boost`` and the blended fuzzy rewrite uses for Lucene's
    distance boost (FuzzyTermsEnum: 1 - edit/min(|term|, |query|)).
    block_max_tfn is tf-normalized (idf-free), so the block-max upper
    bound ``idf * (k1+1) * max_tfn`` stays exact under the scaled idf —
    WAND/MaxScore pruning remains sound without touching the blocks."""
    return TermPostings(
        tp.term, tp.idf * boost, tp.doc_ids, tp.tfs,
        tp.doc_lens, tp.block_last_doc, tp.block_max_tfn,
    )


def restrict_docs(tp: TermPostings, allowed: "np.ndarray") -> TermPostings:
    """``tp`` restricted to postings of ``allowed`` (sorted asc) — the
    filter-query (Solr fq / Lucene FILTER clause) pre-score restriction.
    Like :func:`exclude_docs`, idf and block-max arrays are KEPT: a
    filter clause never changes surviving docs' scores (idf stays the
    full-corpus value), and block maxima remain valid loose upper bounds
    after row removal, so WAND/MaxScore pruning stays sound."""
    n = len(tp.doc_ids)
    if n == 0:
        return tp
    if allowed.size == 0:
        e = np.empty(0, dtype=tp.doc_ids.dtype)
        return TermPostings(
            tp.term, tp.idf, e, e.astype(tp.tfs.dtype),
            e.astype(tp.doc_lens.dtype), tp.block_last_doc,
            tp.block_max_tfn,
        )
    idx = np.searchsorted(allowed, tp.doc_ids)
    keep = np.zeros(n, dtype=bool)
    inb = idx < allowed.size
    keep[inb] = allowed[idx[inb]] == tp.doc_ids[inb]
    if keep.all():
        return tp
    return TermPostings(
        tp.term, tp.idf, tp.doc_ids[keep], tp.tfs[keep],
        tp.doc_lens[keep], tp.block_last_doc, tp.block_max_tfn,
    )


def exact_topk(
    term_lists: list[TermPostings],
    k: int,
    avgdl: float,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    min_match: int | None = None,
    after: "tuple[float, int] | None" = None,
) -> list[tuple[int, float]]:
    """Vectorized brute-force merge; exact, the distributed kernel.

    ``min_match`` (Solr mm / Lucene minimumNumberShouldMatch): in the
    disjunctive path, keep only docs matching at least that many DISTINCT
    query terms. ``min_match=len(term_lists)`` degenerates to conjunctive;
    ignored when ``conjunctive=True`` (already the strictest form).

    ``after=(score, doc_id)`` — Lucene searchAfter: only docs strictly
    after the cursor in (score desc, doc_id asc) order are eligible for
    the k-selection (exact-float comparison; scores here are
    numpy-deterministic, so a page-1 score round-trips exactly)."""
    if not term_lists:
        return []
    if conjunctive:
        # progressive sorted intersection, smallest list first.
        # searchsorted, not np.isin: doc_ids are sorted-unique by the
        # codec contract, and isin pays a concat + O((n+m) log(n+m))
        # sort per step where a binary probe of the larger list is
        # O(n log m). The probe positions double as each list's gather
        # indices for scoring, so no list is probed twice
        # (optimization r6, guide §1.2).
        n = len(term_lists)
        perm = sorted(range(n), key=lambda i: len(term_lists[i].doc_ids))
        lists = [term_lists[i] for i in perm]
        cand = lists[0].doc_ids
        sel = [np.arange(cand.size, dtype=np.int64)]
        for tp in lists[1:]:
            idx = np.searchsorted(tp.doc_ids, cand)
            hit = np.zeros(cand.size, dtype=bool)
            inb = idx < tp.doc_ids.size
            hit[inb] = tp.doc_ids[idx[inb]] == cand[inb]
            cand = cand[hit]
            if cand.size == 0:
                return []
            sel = [s[hit] for s in sel]
            sel.append(idx[hit])
        # float summation stays in term_lists order — bit-identical
        # scores to the pre-r6 kernel (addition is not associative)
        pos_of = [0] * n
        for j, i in enumerate(perm):
            pos_of[i] = j
        total = np.zeros(cand.size, dtype=np.float64)
        for i, tp in enumerate(term_lists):
            total += _scores(tp, sel[pos_of[i]], avgdl, k1, b)
        docs = cand
    else:
        all_ids = np.concatenate([tp.doc_ids for tp in term_lists])
        all_scores = np.concatenate(
            [_scores(tp, np.arange(len(tp.doc_ids)), avgdl, k1, b)
             for tp in term_lists]
        )
        docs, inv = np.unique(all_ids, return_inverse=True)
        total = np.bincount(inv, weights=all_scores)
        if min_match is not None and min_match > 1:
            # postings are per-(term, doc) unique, so the occurrence count
            # of a doc across lists IS its distinct-matched-term count
            nm = np.bincount(inv)
            keep = nm >= min_match
            docs, total = docs[keep], total[keep]
    if after is not None:
        s0, d0 = float(after[0]), int(after[1])
        keep = (total < s0) | ((total == s0) & (docs > d0))
        docs, total = docs[keep], total[keep]
    return _topk_select(docs, total, k)


def _topk_select(
    docs: np.ndarray, total: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Top-k by (-score, doc_id). Candidates = every doc scoring >= the
    k-th score (argpartition alone could keep the wrong member of a
    boundary tie — doc_id must break ties, not partition order)."""
    if docs.size == 0:
        return []
    kk = min(k, docs.size)
    kth_score = np.partition(total, docs.size - kk)[docs.size - kk]
    cand = total >= kth_score
    cand_scores = total[cand]
    cand_docs = docs[cand]
    order = np.lexsort((cand_docs, -cand_scores))[:kk]
    return [(int(cand_docs[i]), float(cand_scores[i])) for i in order]


def maxscore_topk(
    term_lists: list[TermPostings],
    k: int,
    avgdl: float,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Batch MaxScore (Turtle & Flood-style essential lists), fully
    vectorized — the scale-path alternative to the document-at-a-time
    python loop in ``wand_topk``.

    Disjunctive semantics, rank-identical to ``exact_topk``:

    1. order lists by upper bound desc; score the top-UB list alone —
       its k-th partial score is a LOWER bound ``theta`` of the final
       k-th score (partial sums only grow);
    2. the maximal suffix of lists whose upper bounds sum to < theta is
       non-essential: a doc appearing ONLY there totals < theta, i.e.
       strictly below the final k-th score — safely excluded even under
       the doc_id tiebreak;
    3. candidates = union of the essential lists' doc_ids; gather each
       list's contribution for the candidates via searchsorted (log-time
       skips into the non-essential lists — no decode-order scan).

    Skewed queries (a rare high-idf term + common low-idf terms) reduce to
    candidates ≈ the rare list, turning the common lists' O(df) scoring
    into O(|cand| log df) gathers. Conjunctive queries route to
    ``exact_topk`` — its progressive smallest-first intersection already
    touches only candidate postings.
    """
    lists = [tp for tp in term_lists if len(tp.doc_ids)]
    if not lists:
        return []
    if conjunctive:
        if len(lists) < len(term_lists):
            return []  # AND with a zero-df term matches nothing
        return exact_topk(lists, k, avgdl, True, k1, b)
    order = sorted(lists, key=lambda tp: -tp.upper_bound)
    ubs = np.array([tp.upper_bound for tp in order])
    s0 = _scores(order[0], np.arange(len(order[0].doc_ids)), avgdl, k1, b)
    if s0.size >= k:
        theta = float(np.partition(s0, s0.size - k)[s0.size - k])
    else:
        theta = -np.inf
    # suffix_sum(e) = sum of upper bounds of lists e..end (0 past the end);
    # essential count = smallest e >= 1 whose tail is safely prunable
    suffix = np.cumsum(ubs[::-1])[::-1]
    n_essential = len(order)
    for e in range(1, len(order) + 1):
        tail = float(suffix[e]) if e < len(order) else 0.0
        if tail < theta:
            n_essential = e
            break
    cand = order[0].doc_ids
    for tp in order[1:n_essential]:
        cand = np.union1d(cand, tp.doc_ids)
    total = np.zeros(cand.size, dtype=np.float64)
    for tp in order:
        idx = np.searchsorted(tp.doc_ids, cand)
        idxc = np.minimum(idx, len(tp.doc_ids) - 1)
        hit = tp.doc_ids[idxc] == cand
        if hit.any():
            total[hit] += _scores(tp, idxc[hit], avgdl, k1, b)
    return _topk_select(cand, total, k)


def wand_topk(
    term_lists: list[TermPostings],
    k: int,
    avgdl: float,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Block-max WAND entry point — vectorized kernels (optimization r6).

    BMW's machinery (pivot selection, block-max bounds, cursor
    galloping) exists to avoid *touching* postings that cannot reach the
    top-k. Here every list is already a decoded, memory-resident numpy
    array, so per-doc python-loop bookkeeping costs far more than the
    scoring it avoids — measured on the bench's 2-term AND at sf1.0, the
    doc-at-a-time loop took 0.73 s where the vectorized intersection
    kernel computes the identical ranking in ~4 ms (guide §1.2: fix the
    per-task algorithm before tuning its constants). Routing:

      * conjunctive: ``exact_topk`` — progressive smallest-first sorted
        intersection; it touches exactly the candidate docs BMW's
        aligned-pivot walk would evaluate, then scores them in one
        vectorized pass;
      * disjunctive: ``maxscore_topk`` — the vectorized essential-list
        skipper (same upper-bound pruning idea as WAND, batch form).

    All kernels are rank-identical (score desc, doc_id asc) — pinned by
    the parity fuzz in tests/test_segments_wand.py and the
    ``wand_topk_daat`` ≡ ``wand_topk`` identity fuzz added this round.
    The literal document-at-a-time BMW loop is preserved below as
    :func:`wand_topk_daat` (reference implementation; also the shape a
    future disk-resident/streaming-decode serving mode would need).
    """
    lists = [tp for tp in term_lists if len(tp.doc_ids)]
    if not lists:
        return []
    if conjunctive:
        if len(lists) < len(term_lists):
            return []  # AND with a zero-df term matches nothing
        return exact_topk(lists, k, avgdl, True, k1, b)
    return maxscore_topk(lists, k, avgdl, False, k1, b)


def wand_topk_daat(
    term_lists: list[TermPostings],
    k: int,
    avgdl: float,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Document-at-a-time block-max WAND (the literal BMW algorithm).

    Heap holds (score, -doc_id) so the threshold tie-break matches
    (score desc, doc_id asc): a new doc replaces an equal-score incumbent
    only if its doc_id is smaller.
    """
    lists = [tp for tp in term_lists if len(tp.doc_ids)]
    if not lists:
        return []
    if conjunctive and len(lists) < len(term_lists):
        return []  # AND with a zero-df term matches nothing
    n_req = len(lists) if conjunctive else 1
    cursors = {tp.term: 0 for tp in lists}
    ubs = {tp.term: tp.upper_bound for tp in lists}
    heap: list[tuple[float, int]] = []  # (score, -doc_id), min-heap of top-k

    def theta() -> tuple[float, int]:
        if len(heap) < k:
            return (-np.inf, 0)
        return heap[0]

    live = list(lists)
    while True:
        live = [tp for tp in live if cursors[tp.term] < len(tp.doc_ids)]
        if len(live) < n_req:
            break
        order = sorted(live, key=lambda tp: tp.doc_ids[cursors[tp.term]])
        th, _ = theta()
        # pivot selection on full-list upper bounds
        acc = 0.0
        pivot_i = None
        # Pruning uses STRICT < against the threshold score: a candidate
        # whose bound equals th can still win on the doc_id tiebreak, so
        # equality must be evaluated, not skipped.
        if conjunctive:
            # every term required -> pivot is the max of current cursor docs
            pivot_i = len(order) - 1
            acc = sum(ubs[tp.term] for tp in order)
            if acc < th and len(heap) >= k:
                break
        else:
            for i, tp in enumerate(order):
                acc += ubs[tp.term]
                if acc >= th:
                    pivot_i = i
                    break
            if pivot_i is None:
                break  # no doc can beat or tie the threshold
        pivot_doc = int(order[pivot_i].doc_ids[cursors[order[pivot_i].term]])
        # extend the pivot prefix over post-pivot lists whose current doc
        # ties pivot_doc: they contribute to pivot_doc's score, so the
        # block-max bound (and the aligned-prefix test) must include them
        while (
            pivot_i + 1 < len(order)
            and int(order[pivot_i + 1].doc_ids[cursors[order[pivot_i + 1].term]])
            == pivot_doc
        ):
            pivot_i += 1

        # block-max refinement: tighter bound at pivot's blocks
        bacc = 0.0
        for tp in order[: pivot_i + 1]:
            ci = cursors[tp.term]
            bi = int(np.searchsorted(tp.block_last_doc, pivot_doc))
            if bi < len(tp.block_max_tfn):
                bacc += tp.idf * (k1 + 1.0) * float(tp.block_max_tfn[bi])
        if bacc < th and len(heap) >= k:
            # skip past the earliest block boundary among the pivot terms
            nxt = pivot_doc + 1
            bounds = []
            for tp in order[: pivot_i + 1]:
                bi = int(np.searchsorted(tp.block_last_doc, pivot_doc))
                if bi < len(tp.block_last_doc):
                    bounds.append(int(tp.block_last_doc[bi]))
            if bounds:
                nxt = max(nxt, min(bounds) + 1)
            # never skip past the first post-pivot list's current doc —
            # it could be the true next competitive pivot
            if pivot_i + 1 < len(order):
                nxt_list = order[pivot_i + 1]
                nxt = min(
                    nxt, int(nxt_list.doc_ids[cursors[nxt_list.term]])
                )
                nxt = max(nxt, pivot_doc + 1)
            for tp in order[: pivot_i + 1]:
                c = cursors[tp.term]
                cursors[tp.term] = c + int(
                    np.searchsorted(tp.doc_ids[c:], nxt, side="left")
                )
            continue

        if int(order[0].doc_ids[cursors[order[0].term]]) == pivot_doc:
            # fully aligned prefix -> evaluate pivot_doc exactly
            score = 0.0
            n_present = 0
            for tp in lists:
                c = cursors[tp.term]
                if c < len(tp.doc_ids) and int(tp.doc_ids[c]) == pivot_doc:
                    score += float(_scores(tp, np.array([c]), avgdl, k1, b)[0])
                    n_present += 1
            if (not conjunctive or n_present == n_req):
                entry = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
            for tp in lists:
                c = cursors[tp.term]
                if c < len(tp.doc_ids) and int(tp.doc_ids[c]) == pivot_doc:
                    cursors[tp.term] = c + 1
        else:
            # gallop the earlier cursors up to the pivot
            for tp in order[:pivot_i]:
                c = cursors[tp.term]
                cursors[tp.term] = c + int(
                    np.searchsorted(tp.doc_ids[c:], pivot_doc, side="left")
                )
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


def scored_terms_distributed(
    segments: DataFrame,
    terms_idf: dict[str, float],
    avgdl: float,
    dead_pairs: dict | None = None,
    dead_df: "DataFrame | None" = None,
) -> DataFrame:
    """Per-(doc, term) BM25 contributions, fully cluster-side — the
    term-carrying sibling of :func:`query_segments_distributed`'s decode
    kernel (same vectorized per-bucket scorer, same tombstone routing),
    aggregated to one row per (doc_id, term). The distributed boolean-
    expression evaluator builds its per-leaf flag/score columns from
    this ONE scan: the whole AST then compiles to a single Catalyst
    expression over the per-doc pivot, so an arbitrarily nested query
    costs one segments scan + one shuffle regardless of clause count."""
    import pandas as pd

    k1, b = BM25_K1, BM25_B
    use_join = dead_df is not None
    dead_local = {} if use_join else dict(dead_pairs or {})

    def score_part(batches):
        dead = DeadDocs(dead_local) if dead_local else None
        for pdf in batches:
            frames = []
            has_gen = "gen_seq" in pdf.columns
            for _, row in pdf.iterrows():
                idf = terms_idf.get(row["term"])
                if idf is None:
                    continue
                ids, tfs, dls = decode_posting_list(bytes(row["blob"]))
                gseq = int(row["gen_seq"]) if has_gen else 0
                if dead is not None:
                    keep = dead.live_mask(ids, gseq)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                s = (
                    idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / avgdl))
                )
                frame = {
                    "doc_id": ids,
                    "term": np.full(len(ids), row["term"], dtype=object),
                    "term_score": s,
                    "gen_seq": np.full(len(ids), gseq, dtype=np.int64),
                }
                frames.append(pd.DataFrame(frame))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    out_schema = "doc_id long, term string, term_score double, gen_seq long"
    scored = segments.mapInPandas(score_part, out_schema)
    if use_join:
        scored = scored.join(dead_df, "doc_id", "left").where(
            F.col("_kill_seq").isNull()
            | (F.col("_kill_seq") <= F.col("gen_seq"))
        )
    # one live generation per (doc, term) after tombstone filtering is
    # the invariant; if a stray duplicate live generation survives (the
    # violation the phrase kernel's slot dedup also defends against),
    # the NEWEST generation wins instead of double-counting a sum —
    # max(struct) still partial-aggregates map-side
    return scored.groupBy("doc_id", "term").agg(
        F.max(F.struct("gen_seq", "term_score"))
        .getField("term_score").alias("term_score")
    )


def query_segments_distributed(
    spark,
    segments: DataFrame,
    terms_idf: dict[str, float],
    avgdl: float,
    k: "int | None",
    conjunctive: bool = True,
    n_query_terms: int | None = None,
    dead_pairs: dict | None = None,
    dead_df: "DataFrame | None" = None,
    min_match: int | None = None,
    include_df: "DataFrame | None" = None,
    exclude_df: "DataFrame | None" = None,
    after: "tuple[float, int] | None" = None,
) -> DataFrame:
    """Cluster-scale path: decode+score inside each term_bucket partition
    (mapInPandas, vectorized), aggregate per doc, global TakeOrdered.

    ``after=(score, doc_id)`` is Lucene's searchAfter / Solr cursorMark:
    only docs STRICTLY after the cursor in (score desc, doc_id asc)
    order survive, so page N+1 costs exactly one k-sized TakeOrdered —
    never the start+k materialization of offset paging. The comparison
    uses the exact float score the previous page returned (Lucene's
    FieldDoc carries the exact score too); a doc whose re-aggregated
    score differs in the last ulp across jobs could straddle the cursor,
    which is the same noise floor Lucene accepts for searchAfter on
    recomputed scores.

    Used when posting lists are too large to collect; the per-bucket
    kernel is the same vectorized scorer as exact_topk.

    Tombstones, by backlog size (ExtractorEngine._dead_for_distributed):
    ``dead_pairs`` (doc_id -> kill_seq) ships in the task closure — right
    for the compaction-bounded steady state; ``dead_df`` (columns doc_id,
    _kill_seq — max kill seq per doc) filters via a DataFrame join AFTER
    scoring instead, so a bulk-delete backlog of 10^8 docs never
    serializes into every task (VERDICT r2 weak #2; Lucene analog:
    liveDocs are per-segment state, never process-global). Pass at most
    one of the two; idf values in ``terms_idf`` must be live-df-based
    either way.
    """
    import pandas as pd

    k1, b = BM25_K1, BM25_B
    nq = n_query_terms or len(terms_idf)
    use_join = dead_df is not None
    dead_local = {} if use_join else dict(dead_pairs or {})
    # small int ordinal per query term: lets the multi-generation path
    # dedup per (doc, term) without widening the slimmed exchange with
    # the term STRING (the r4 hash-exchange win stays intact)
    tid_map = {t: i for i, t in enumerate(terms_idf)}

    def score_part(batches):
        dead = DeadDocs(dead_local) if dead_local else None
        for pdf in batches:
            frames = []
            has_gen = "gen_seq" in pdf.columns
            for _, row in pdf.iterrows():
                idf = terms_idf.get(row["term"])
                if idf is None:
                    continue
                ids, tfs, dls = decode_posting_list(bytes(row["blob"]))
                gseq = int(row["gen_seq"]) if has_gen else 0
                if dead is not None:
                    keep = dead.live_mask(ids, gseq)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                s = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                frame = {"doc_id": ids, "term_score": s}
                if use_join:
                    frame["gen_seq"] = np.full(len(ids), gseq, dtype=np.int64)
                    frame["_tid"] = np.full(
                        len(ids), tid_map[row["term"]], dtype=np.int64)
                frames.append(pd.DataFrame(frame))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    out_schema = "doc_id long, term_score double" + (
        ", gen_seq long, _tid long" if use_join else ""
    )
    scored = segments.mapInPandas(score_part, out_schema)
    if use_join:
        # one live generation per (doc, term) after tombstone filtering
        # is the invariant; a stray duplicate live generation would
        # double-count score AND inflate n_matched past nq (evicting
        # true conjunctive matches), so mirror scored_terms_distributed:
        # the NEWEST generation wins (code-review r5 finding)
        scored = (
            scored.join(dead_df, "doc_id", "left")
            .where(
                F.col("_kill_seq").isNull()
                | (F.col("_kill_seq") <= F.col("gen_seq"))
            )
            .groupBy("doc_id", "_tid")
            .agg(
                F.max(F.struct("gen_seq", "term_score"))
                .getField("term_score").alias("term_score")
            )
        )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count("*").cast("int").alias("n_matched"),
    )
    if conjunctive:
        per_doc = per_doc.where(F.col("n_matched") == nq)
    elif min_match is not None and min_match > 1:
        per_doc = per_doc.where(F.col("n_matched") >= min_match)
    # full query-surface parity for the cluster-scale path (VERDICT r3
    # #2): fq (Lucene FILTER) is a left-semi join, exclude (MUST_NOT) a
    # left-anti join — both on the aggregated per-doc rows (doc-level
    # predicates; smaller left side than the per-term scored rows), both
    # score-neutral for surviving docs, and neither set ever touches the
    # driver. AQE broadcasts the small side.
    if exclude_df is not None:
        per_doc = per_doc.join(
            exclude_df.select("doc_id"), "doc_id", "left_anti"
        )
    if include_df is not None:
        per_doc = per_doc.join(
            include_df.select("doc_id"), "doc_id", "left_semi"
        )
    if after is not None:
        s0, d0 = float(after[0]), int(after[1])
        per_doc = per_doc.where(
            (F.col("score") < s0)
            | ((F.col("score") == s0) & (F.col("doc_id") > d0))
        )
    if k is None:
        # all-matches form (facet counting): no rank materialization
        return per_doc
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
