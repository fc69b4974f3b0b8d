"""Positions-aware phrase retrieval (SURVEY.md §7 stretch item; the reason
the index stores positions at all — reference analog: Lucene phrase
queries enabled by the `text` fieldtype's position tracking,
schema.xml:51, positionIncrementGap).

Semantics: a doc matches the phrase if the query's analyzed terms occur
at strictly consecutive positions (pos, pos+1, ..). Stopword removal
leaves position gaps at index time, so phrases spanning removed stopwords
do NOT match — pinned by tests, consistent with how the analyzer defines
positions.

Known divergence from Lucene (pinned, ADVICE r1): catenated tokens take
their OWN positions (camelCase -> camel@0, case@1, camelcase@2) instead of
Lucene WDF's posInc=0, so a phrase spanning a split identifier ('sort
data' against 'mergeSort data') does NOT match — the catenated token
shifts subsequent positions by one per catenation. The whole-identifier
query ('mergesort data'... as separate tokens) still conjunctive-matches;
only strict adjacency across the split is affected.

Execution: conjunctive BM25 candidate retrieval first (cheap, bounded),
then positions of the candidate docs are decoded from the already-loaded
term blobs and verified vectorized (numpy set intersection on offset
positions). Scores are the same BM25 the AND-query gives (phrase match is
a filter, not a different scoring model — pinned)."""

from __future__ import annotations

import numpy as np

from ckanext_extractor_spark.analysis.tokenizer import (
    QUERY_CONFIG,
    analyze_query,
    query_config_for,
)
from ckanext_extractor_spark.operators.codec import decode_posting_list


def _positions_by_doc(row, dead) -> dict[int, np.ndarray]:
    from ckanext_extractor_spark.operators.wand import _row_gen_seq

    ids, tfs, dls, pos = decode_posting_list(
        bytes(row["blob"]), with_positions=True
    )
    if dead is not None and len(dead):
        keep = dead.live_mask(ids, _row_gen_seq(row))
        return {int(d): p for d, p, k in zip(ids, pos, keep) if k}
    return {int(d): p for d, p in zip(ids, pos)}


def phrase_filter_docs(
    candidate_docs: list[int],
    term_shard_rows: dict[str, list],
    ordered_terms: list[str],
    dead=None,
) -> list[int]:
    """Keep candidate docs where `ordered_terms` occur consecutively.

    term_shard_rows: term -> list of segment rows (blobs include
    positions). Decodes only the query's terms (already fetched for
    scoring); per-doc verification is numpy intersection of
    position-offset sets. ``dead`` (a wand.DeadDocs) drops tombstoned
    postings so a stale generation can't shadow an updated doc's
    positions."""
    per_term_pos: list[dict[int, np.ndarray]] = []
    for t in ordered_terms:
        merged: dict[int, np.ndarray] = {}
        for row in term_shard_rows.get(t, []):
            merged.update(_positions_by_doc(row, dead))
        per_term_pos.append(merged)
    out = []
    for d in candidate_docs:
        base = per_term_pos[0].get(d)
        if base is None:
            continue
        ok = base
        for off, pmap in enumerate(per_term_pos[1:], start=1):
            nxt = pmap.get(d)
            if nxt is None:
                ok = np.array([], dtype=np.int64)
                break
            ok = np.intersect1d(ok, nxt - off, assume_unique=True)
            if ok.size == 0:
                break
        if ok.size:
            out.append(d)
    return out


def phrase_search(engine, query: str, k: int = 10) -> list[tuple[int, float]]:
    """Top-k docs containing the analyzed query as a consecutive phrase,
    ranked by the conjunctive BM25 score (ties doc_id asc).

    Uses the engine's warm/cold segment access; requires the index to
    have been built with positions (engine.with_positions)."""
    if not engine.with_positions:
        raise ValueError("index was built without positions; phrase search "
                         "needs with_positions=True")
    terms = analyze_query(query, config=query_config_for(engine.analyzer))
    if not terms:
        return []
    uniq = list(dict.fromkeys(terms))
    st = engine.corpus_stats()
    # over-fetch candidates: phrase filtering can only shrink the set
    overfetch = max(k * 10, 100)
    from ckanext_extractor_spark.operators.wand import exact_topk

    tls = engine._term_postings(uniq, st)
    if len(tls) < len(uniq):
        return []
    scored = exact_topk(tls, overfetch, st["avgdl"], conjunctive=True)
    if not scored:
        return []
    rows_by_term = {t: engine._segment_rows(t) for t in uniq}
    dead = engine._dead_docs()
    keep = set(
        phrase_filter_docs([d for d, _ in scored], rows_by_term, terms, dead)
    )
    out = [(d, s) for d, s in scored if d in keep][:k]
    if len(out) < k and len(scored) == overfetch:
        # rare: phrase matches beyond the over-fetch window -> full pass
        scored = exact_topk(tls, 10**9, st["avgdl"], conjunctive=True)
        keep = set(
            phrase_filter_docs([d for d, _ in scored], rows_by_term, terms, dead)
        )
        out = [(d, s) for d, s in scored if d in keep][:k]
    return out
