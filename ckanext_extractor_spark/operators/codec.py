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
    return varbyte_encode_with_lengths(values)[0]


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """varbyte encode + per-value byte lengths (for callers that slice the
    buffer into sub-ranges, e.g. per-group position blobs)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.array([], dtype=np.int64)
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
    return out.tobytes(), lengths


def varbyte_decode(buf: bytes, offset: int = 0, count: int | None = None):
    """Decode `count` varbyte values (or all) from buf[offset:].
    Returns (values: np.ndarray[uint64], next_offset)."""
    raw = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    if raw.size == 0:
        return np.array([], dtype=np.uint64), offset
    is_last = (raw & 0x80) == 0
    n_avail = int(is_last.sum())
    # clamp: a short read returns what's there (callers that need an
    # exact count check the returned size)
    n = n_avail if count is None else min(count, n_avail)
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
    positions_blobs: list[bytes] | None = None,
):
    """Encode ONE term's postings (sorted internally by doc_id ascending).

    doc_ids may be negative int64 (xxhash64) — they are mapped through an
    order-preserving reinterpretation to uint64. Returns dict with blob +
    block-max arrays.

    Positions come in either as raw arrays (``positions``: re-encoded
    here) or, on the hot path, as PRE-ENCODED per-posting varbyte gap
    blobs (``positions_blobs``, produced by the tokenize kernel) — those
    are pure byte concatenation in doc order, so position data never
    re-materializes as integers between tokenizer and segment file.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    doc_lens = np.asarray(doc_lens, dtype=np.int64)[order]

    u = doc_ids.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)  # order-preserving
    gaps = np.empty_like(u)
    gaps[0] = u[0]
    gaps[1:] = u[1:] - u[:-1]

    buf_n, _ = varbyte_encode_with_lengths(np.array([len(u)], dtype=np.uint64))
    buf_gaps, len_gaps = varbyte_encode_with_lengths(gaps)
    buf_tfs, len_tfs = varbyte_encode_with_lengths(tfs.astype(np.uint64))
    buf_dls, len_dls = varbyte_encode_with_lengths(doc_lens.astype(np.uint64))
    parts = [buf_n, buf_gaps, buf_tfs, buf_dls]
    if positions_blobs is not None:
        n_pos = int(tfs.sum())
        parts.append(varbyte_encode(np.array([n_pos], dtype=np.uint64)))
        parts.extend(positions_blobs[i] for i in order)
    elif positions is not None and len(positions):
        positions = [np.asarray(positions[i], dtype=np.int64) for i in order]
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
    # per-block byte offsets into the blob's gap/tf/dl streams so query
    # kernels can decode ONLY the blocks WAND/MaxScore actually visit
    # (decode_posting_blocks); flattened triplets [gap, tf, dl] per block
    cg = np.concatenate(([0], np.cumsum(len_gaps)))
    ct = np.concatenate(([0], np.cumsum(len_tfs)))
    cd = np.concatenate(([0], np.cumsum(len_dls)))
    starts = np.arange(n_blocks, dtype=np.int64) * block_size
    h = len(buf_n)
    block_offs = np.empty(3 * n_blocks, dtype=np.int64)
    block_offs[0::3] = h + cg[starts]
    block_offs[1::3] = h + cg[-1] + ct[starts]
    block_offs[2::3] = h + cg[-1] + ct[-1] + cd[starts]
    return {
        "blob": blob,
        "n_postings": len(u),
        "block_last_doc": block_last_doc,
        "block_max_tfn": block_max_tfn,
        "block_offs": block_offs,
    }


def encode_posting_lists_grouped(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    pos_blobs: np.ndarray | None,
    g_starts: np.ndarray,
    g_ends: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
    pos_data: "bytes | memoryview | None" = None,
    pos_offsets: np.ndarray | None = None,
):
    """Encode MANY terms' posting lists in one vectorized pass.

    Inputs are row arrays sorted by (term, doc_id); term i owns rows
    [g_starts[i], g_ends[i]) and groups are contiguous+covering. Each
    varbyte stream (doc-gaps, tfs, doc_lens, counts) is encoded ONCE for
    the whole task and sliced per term by byte-length prefix sums — the
    per-term python work is byte concatenation only. Produces blobs
    byte-identical to encode_posting_list (pinned by tests).

    Why: per-term encode_posting_list costs ~0.8 ms/term in numpy
    fixed overhead (5 tiny varbyte calls); a segment task owns 10^4..10^5
    terms, so per-term overhead dominated the entire segment stage.

    Position payloads come in one of two forms:
      * ``pos_blobs``: object array of per-row bytes (pandas path);
      * ``pos_data`` + ``pos_offsets``: ONE contiguous byte buffer and
        absolute per-row byte offsets (len n_rows+1) — the Arrow-native
        zero-copy path (mapInArrow hands the BinaryArray's data buffer
        straight through; no per-row python objects exist at all).
    """
    n_terms = len(g_starts)
    has_pos = pos_blobs is not None or pos_data is not None
    ns = (g_ends - g_starts).astype(np.uint64)
    u = doc_ids.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)
    gaps = np.empty_like(u)
    gaps[1:] = u[1:] - u[:-1]
    gaps[g_starts] = u[g_starts]

    buf_ns, len_ns = varbyte_encode_with_lengths(ns)
    buf_gaps, len_gaps = varbyte_encode_with_lengths(gaps)
    buf_tfs, len_tfs = varbyte_encode_with_lengths(tfs.astype(np.uint64))
    buf_dls, len_dls = varbyte_encode_with_lengths(doc_lens.astype(np.uint64))
    if has_pos:
        npos = np.add.reduceat(tfs, g_starts)
    else:
        npos = np.zeros(n_terms, dtype=np.int64)
    buf_npos, len_npos = varbyte_encode_with_lengths(npos.astype(np.uint64))

    def row_ranges(lengths):
        cum = np.concatenate(([0], np.cumsum(lengths)))
        return cum[g_starts], cum[g_ends]

    gs_b, ge_b = row_ranges(len_gaps)
    ts_b, te_b = row_ranges(len_tfs)
    ds_b, de_b = row_ranges(len_dls)
    cum_ns = np.concatenate(([0], np.cumsum(len_ns)))
    cum_np = np.concatenate(([0], np.cumsum(len_npos)))
    if pos_data is not None:
        # Arrow zero-copy path: slice the shared buffer by row offsets
        pos_buf = pos_data if isinstance(pos_data, memoryview) else memoryview(pos_data)
        ps_b = pos_offsets[g_starts]
        pe_b = pos_offsets[g_ends]
    elif pos_blobs is not None:
        # ONE join of all per-row position blobs, sliced per term by byte
        # prefix sums — the alternative (a bytes() call per posting row in
        # the per-term loop) was the single hottest line of the whole
        # build at 33M rows (measured ~60% of the encode stage).
        pos_lens = np.fromiter(
            (len(p) for p in pos_blobs), dtype=np.int64, count=len(pos_blobs)
        )
        pos_buf = b"".join(pos_blobs)
        ps_b, pe_b = row_ranges(pos_lens)

    # block-max metadata, vectorized across all terms
    tfn = tfs / (tfs + k1 * (1.0 - b + b * doc_lens / float(avgdl)))
    nb = (ns.astype(np.int64) + block_size - 1) // block_size
    term_of_block = np.repeat(np.arange(n_terms), nb)
    nb_cum = np.concatenate(([0], np.cumsum(nb)))
    within = np.arange(nb_cum[-1]) - nb_cum[term_of_block]
    blk_start = g_starts[term_of_block] + within * block_size
    blk_end = np.minimum(blk_start + block_size, g_ends[term_of_block])
    blk_last_doc = doc_ids[blk_end - 1]
    blk_max = np.maximum.reduceat(tfn, blk_start) if len(blk_start) else np.array([])

    # per-block byte offsets into each term's blob (flattened [gap, tf,
    # dl] triplets) — lazy block decode at query time. All prefix sums
    # are over the task-wide length arrays; per-term work is slicing.
    cum_gaps = np.concatenate(([0], np.cumsum(len_gaps)))
    cum_tfs = np.concatenate(([0], np.cumsum(len_tfs)))
    cum_dls = np.concatenate(([0], np.cumsum(len_dls)))
    hdr = (cum_ns[1:] - cum_ns[:-1])[term_of_block]
    gap_len = (cum_gaps[g_ends] - cum_gaps[g_starts])[term_of_block]
    tf_len = (cum_tfs[g_ends] - cum_tfs[g_starts])[term_of_block]
    goff = hdr + cum_gaps[blk_start] - cum_gaps[g_starts[term_of_block]]
    toff = hdr + gap_len + cum_tfs[blk_start] - cum_tfs[g_starts[term_of_block]]
    doff = (
        hdr + gap_len + tf_len
        + cum_dls[blk_start] - cum_dls[g_starts[term_of_block]]
    )
    blk_offs_flat = np.empty(3 * len(blk_start), dtype=np.int64)
    blk_offs_flat[0::3] = goff
    blk_offs_flat[1::3] = toff
    blk_offs_flat[2::3] = doff

    blobs, last_docs, max_tfns, block_offs = [], [], [], []
    for i in range(n_terms):
        parts = [
            buf_ns[cum_ns[i] : cum_ns[i + 1]],
            buf_gaps[gs_b[i] : ge_b[i]],
            buf_tfs[ts_b[i] : te_b[i]],
            buf_dls[ds_b[i] : de_b[i]],
            buf_npos[cum_np[i] : cum_np[i + 1]],
        ]
        if has_pos:
            parts.append(pos_buf[ps_b[i] : pe_b[i]])
        blobs.append(b"".join(parts))
        last_docs.append(blk_last_doc[nb_cum[i] : nb_cum[i + 1]].tolist())
        max_tfns.append(blk_max[nb_cum[i] : nb_cum[i + 1]].tolist())
        block_offs.append(
            blk_offs_flat[3 * nb_cum[i] : 3 * nb_cum[i + 1]].tolist()
        )
    return blobs, ns.astype(np.int64), last_docs, max_tfns, block_offs


def decode_posting_blocks(
    blob: bytes,
    n_postings: int,
    sel_blocks: np.ndarray,
    block_offs,
    block_last_doc,
    block_size: int = BLOCK_SIZE,
):
    """Decode ONLY the selected blocks of a posting list (sorted ascending
    block indices) using the per-block byte offsets emitted at encode
    time. Returns (doc_ids, tfs, doc_lens) of those blocks concatenated —
    byte-for-byte the same values a full decode yields for those ranges
    (pinned by round-trip tests).

    The delta chain restarts from block_last_doc[bi-1]: the first gap of
    block bi is relative to the previous block's last doc, which the
    block-max metadata already carries — no extra state in the blob.

    Consecutive selected blocks collapse into one varbyte_decode call
    (runs), so a dense selection costs the same as a full decode."""
    block_offs = np.asarray(block_offs, dtype=np.int64)
    block_last_doc = np.asarray(block_last_doc, dtype=np.int64)
    sel = np.asarray(sel_blocks, dtype=np.int64)
    if sel.size == 0:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy()
    HALF = np.uint64(1 << 63)
    ids_parts, tf_parts, dl_parts = [], [], []
    # split the selection into runs of consecutive blocks
    run_bounds = np.flatnonzero(np.diff(sel) != 1) + 1
    run_starts = np.concatenate(([0], run_bounds))
    run_ends = np.concatenate((run_bounds, [sel.size]))
    for rs, re in zip(run_starts, run_ends):
        b0 = int(sel[rs])
        b1 = int(sel[re - 1])
        cnt = min((b1 + 1) * block_size, n_postings) - b0 * block_size
        gaps, _ = varbyte_decode(blob, int(block_offs[3 * b0]), cnt)
        u = np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)
        if b0 > 0:
            prev_u = (
                block_last_doc[b0 - 1 : b0].view(np.uint64) + HALF
            )[0]
            u = u + prev_u
        ids_parts.append((u - HALF).view(np.int64))
        tfs, _ = varbyte_decode(blob, int(block_offs[3 * b0 + 1]), cnt)
        tf_parts.append(tfs.astype(np.int64))
        dls, _ = varbyte_decode(blob, int(block_offs[3 * b0 + 2]), cnt)
        dl_parts.append(dls.astype(np.int64))
    return (
        np.concatenate(ids_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )


def decode_posting_list_selective(blob: bytes, wanted_ids: np.ndarray):
    """Positions decode restricted to ``wanted_ids`` (the block-max-
    style phrase prune, VERDICT r4 #8): doc ids / tfs / doc_lens decode
    vectorized as usual, the flat position-gap stream decodes in ONE
    vectorized varbyte pass, but per-doc position arrays — the python-
    loop-per-posting part of the full decode — materialize ONLY for the
    candidate docs. On a hot term (millions of postings) verified
    against a top-k candidate set (~100 docs), this turns the
    O(n_postings) python loop + array churn into O(n_candidates).

    Returns (doc_ids, tfs, doc_lens, posmap) where posmap maps
    doc_id -> positions array for ids present in ``wanted_ids`` only
    (byte-identical to the full decode's arrays — pinned by test)."""
    nvals, off = varbyte_decode(blob, 0, 1)
    n = int(nvals[0])
    gaps, off = varbyte_decode(blob, off, n)
    u = np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)
    doc_ids = (u - np.uint64(1 << 63)).view(np.int64)
    tfs, off = varbyte_decode(blob, off, n)
    tfs = tfs.astype(np.int64)
    doc_lens, off = varbyte_decode(blob, off, n)
    doc_lens = doc_lens.astype(np.int64)
    npos, off = varbyte_decode(blob, off, 1)
    flat, off = varbyte_decode(blob, off, int(npos[0]))
    flat = flat.astype(np.int64)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    sel = np.flatnonzero(
        np.isin(doc_ids, np.asarray(wanted_ids, dtype=np.int64))
    )
    posmap = {
        int(doc_ids[i]): np.cumsum(flat[starts[i]:ends[i]]) for i in sel
    }
    return doc_ids, tfs, doc_lens, posmap


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
