"""Delta + varbyte posting-list codec with block-max metadata (SURVEY.md B2).

Reference analog: the Lucene segment format ckanext-extractor relies on via
Solr (postings live inside Lucene after `search.rebuild`, tasks.py:110).
Here the codec is a vectorized numpy kernel used inside `applyInPandas`
per term bucket — no per-row Python.

Layout of one encoded posting list (all little-endian):
    varbyte( n_postings )
    varbyte( doc_id_gap_0 ... doc_id_gap_{n-1} )   # delta vs previous
    varbyte( tf_0 ... tf_{n-1} )
    varbyte( doc_len_0 ... doc_len_{n-1} )         # per-posting norms, like
                                                   # Lucene's (freq, norm)
                                                   # impact pairs — lists are
                                                   # self-contained for BM25
    varbyte( n_positions_total )
    varbyte( position-gaps, per doc, positions delta-encoded within doc )

Block-max metadata is kept OUTSIDE the blob as arrays
(`block_last_doc`, `block_max_tfn`) every BLOCK_SIZE postings, where
tfn = tf / (tf + k1*(1-b+b*dl/avgdl)) is the doc-length-normalized tf
part of BM25 — max over the block gives the WAND upper bound when
multiplied by idf*(k1+1) at query time.

Determinism: encoding is a pure function of the (doc_id-sorted) posting
list, so segment bytes are independent of partitioning/shuffle order —
pinned by checksum tests.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128-style varbyte encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: number of 7-bit groups, at least 1
    lengths = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    # write each value's bytes: low 7 bits first, continuation bit on all
    # but the last byte of each value
    ends = np.cumsum(lengths)
    starts = ends - lengths
    max_len = int(lengths.max())
    shifted = v.copy()
    for b in range(max_len):
        mask = lengths > b
        idx = starts[mask] + b
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = lengths[mask] == b + 1
        byte = byte | np.where(is_last, 0, 0x80).astype(np.uint8)
        out[idx] = byte
        shifted[mask] = shifted[mask] >> np.uint64(7)
    return out.tobytes()


def varbyte_decode(buf: bytes, offset: int = 0, count: int | None = None):
    """Decode `count` varbyte values (or all) from buf[offset:].
    Returns (values: np.ndarray[uint64], next_offset)."""
    raw = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    if raw.size == 0:
        return np.array([], dtype=np.uint64), offset
    is_last = (raw & 0x80) == 0
    n_avail = int(is_last.sum())
    n = n_avail if count is None else count
    if n == 0:
        return np.array([], dtype=np.uint64), offset
    # positions of value terminators; the n-th terminator bounds our read
    last_idx = np.flatnonzero(is_last)[:n]
    end = int(last_idx[-1]) + 1
    seg = raw[:end]
    seg_last = is_last[:end]
    # value id per byte = number of terminators strictly before the byte
    vid = np.zeros(end, dtype=np.int64)
    vid[1:] = np.cumsum(seg_last[:-1])
    # byte significance within its value
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = last_idx[:-1] + 1
    sig = np.arange(end, dtype=np.int64) - starts[vid]
    vals = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(
        vals, vid, (seg.astype(np.uint64) & np.uint64(0x7F)) << (7 * sig).astype(np.uint64)
    )
    return vals, offset + end


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: list[np.ndarray] | None,
    doc_lens: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
):
    """Encode ONE term's postings (already sorted by doc_id ascending).

    doc_ids may be negative int64 (xxhash64) — they are mapped through a
    zigzag-free trick: reinterpret as uint64 after subtracting int64 min,
    preserving order. Returns dict with blob + block-max arrays.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    doc_lens = np.asarray(doc_lens, dtype=np.int64)[order]
    if positions is not None:
        positions = [np.asarray(positions[i], dtype=np.int64) for i in order]

    u = doc_ids.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)  # order-preserving
    gaps = np.empty_like(u)
    gaps[0] = u[0]
    gaps[1:] = u[1:] - u[:-1]

    parts = [varbyte_encode(np.array([len(u)], dtype=np.uint64)),
             varbyte_encode(gaps),
             varbyte_encode(tfs.astype(np.uint64)),
             varbyte_encode(doc_lens.astype(np.uint64))]
    if positions is not None and len(positions):
        flat = []
        for p in positions:
            d = np.empty_like(p)
            if p.size:
                d[0] = p[0]
                d[1:] = np.diff(p)
            flat.append(d)
        flat_all = np.concatenate(flat) if flat else np.array([], dtype=np.int64)
        parts.append(varbyte_encode(np.array([flat_all.size], dtype=np.uint64)))
        parts.append(varbyte_encode(flat_all.astype(np.uint64)))
    else:
        parts.append(varbyte_encode(np.array([0], dtype=np.uint64)))
    blob = b"".join(parts)

    # block-max metadata
    tfn = tfs / (tfs + k1 * (1.0 - b + b * doc_lens / float(avgdl)))
    n_blocks = (len(u) + block_size - 1) // block_size
    block_last_doc = np.empty(n_blocks, dtype=np.int64)
    block_max_tfn = np.empty(n_blocks, dtype=np.float64)
    for bi in range(n_blocks):
        sl = slice(bi * block_size, (bi + 1) * block_size)
        block_last_doc[bi] = doc_ids[sl][-1]
        block_max_tfn[bi] = tfn[sl].max()
    return {
        "blob": blob,
        "n_postings": len(u),
        "block_last_doc": block_last_doc,
        "block_max_tfn": block_max_tfn,
    }


def decode_posting_list(blob: bytes, with_positions: bool = False):
    """Inverse of encode_posting_list.
    Returns (doc_ids, tfs, doc_lens[, positions])."""
    nvals, off = varbyte_decode(blob, 0, 1)
    n = int(nvals[0])
    gaps, off = varbyte_decode(blob, off, n)
    u = np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)
    doc_ids = (u - np.uint64(1 << 63)).view(np.int64)
    tfs, off = varbyte_decode(blob, off, n)
    tfs = tfs.astype(np.int64)
    doc_lens, off = varbyte_decode(blob, off, n)
    doc_lens = doc_lens.astype(np.int64)
    if not with_positions:
        return doc_ids, tfs, doc_lens
    npos, off = varbyte_decode(blob, off, 1)
    npos = int(npos[0])
    flat, off = varbyte_decode(blob, off, npos)
    flat = flat.astype(np.int64)
    positions = []
    cursor = 0
    for tf in tfs:
        seg = flat[cursor : cursor + tf]
        positions.append(np.cumsum(seg))
        cursor += tf
    return doc_ids, tfs, doc_lens, positions
