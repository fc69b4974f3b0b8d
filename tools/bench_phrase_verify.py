"""Microbenchmark: distributed-phrase verify kernel, per-doc python loop
(round-2 implementation, reproduced inline) vs the vectorized
doc-key/searchsorted kernel shipped in operators/phrase.py (round 3).

Spark-free: both kernels consume the same synthetic pandas frame shaped
exactly like the decode stage's output for a 2-term common-phrase query
((doc_id, slot, tf, dl, positions) rows, ~2 rows/doc). This isolates the
verify stage the way a profiler saw it dominate at 350k docs.

Usage: python tools/bench_phrase_verify.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd


def synth_frame(n_docs: int, seed: int = 7) -> tuple[pd.DataFrame, int, dict]:
    rng = np.random.RandomState(seed)
    n_slots = 2
    rows = []
    for slot in range(n_slots):
        doc = np.arange(n_docs, dtype=np.int64)
        tf = rng.randint(1, 6, n_docs)
        dl = rng.randint(40, 400, n_docs)
        rows.append(pd.DataFrame({
            "doc_id": doc, "slot": np.full(n_docs, slot, dtype=np.int32),
            "tf": tf, "dl": dl,
        }))
    pdf = pd.concat(rows, ignore_index=True)
    # positions: ~10% of docs contain the phrase (slot1 pos = slot0 pos+1)
    pos = []
    phrase_docs = set(rng.choice(n_docs, n_docs // 10, replace=False).tolist())
    for _, r in pdf.iterrows():
        base = rng.randint(0, 300, rng.randint(1, 5)).astype(np.int64)
        base.sort()
        if r["slot"] == 1 and int(r["doc_id"]) in phrase_docs:
            base = np.unique(np.concatenate([base, base[:1] + 0]))  # keep
        pos.append(base)
    # plant the phrase: for phrase docs give slot1 a position slot0+1
    by = {}
    for i, (_, r) in enumerate(pdf.iterrows()):
        by[(int(r["doc_id"]), int(r["slot"]))] = i
    for d in phrase_docs:
        p0 = pos[by[(d, 0)]]
        pos[by[(d, 1)]] = np.unique(np.concatenate([pos[by[(d, 1)]],
                                                    p0[:1] + 1]))
    pdf["positions"] = pd.Series(pos, dtype=object)
    idf = {0: 1.3, 1: 0.7}
    return pdf.sample(frac=1.0, random_state=3).reset_index(drop=True), \
        n_slots, idf


def old_kernel(pdf, n_slots, idf, term_order, avgdl, k1=1.2, b=0.75):
    """Round-2 per-doc python loop, verbatim shape."""
    out_docs, out_scores = [], []
    for doc, g in pdf.groupby("doc_id"):
        rows = {int(s): i for i, s in enumerate(g["slot"].to_numpy())}
        if len(rows) < n_slots:
            continue
        poss = g["positions"].to_numpy()
        ok = np.asarray(poss[rows[term_order[0]]], dtype=np.int64)
        for off in range(1, len(term_order)):
            nxt = np.asarray(poss[rows[term_order[off]]], dtype=np.int64)
            ok = np.intersect1d(ok, nxt - off, assume_unique=False)
            if ok.size == 0:
                break
        if ok.size == 0:
            continue
        tf = g["tf"].to_numpy().astype(np.float64)
        dl = g["dl"].to_numpy().astype(np.float64)
        idfs = np.array([idf[int(s)] for s in g["slot"]])
        score = float(np.sum(idfs * tf * (k1 + 1.0)
                             / (tf + k1 * (1.0 - b + b * dl / avgdl))))
        out_docs.append(int(doc))
        out_scores.append(score)
    return pd.DataFrame({"doc_id": out_docs, "score": out_scores})


def new_kernel(pdf, n_slots, idf, term_order, avgdl, k1=1.2, b=0.75):
    """The shipped vectorized kernel, driven the same way the Spark plan
    drives it (one partition, one accumulated frame)."""
    idf_by_slot = np.array([idf[s] for s in range(n_slots)])
    n = len(pdf)
    doc = pdf["doc_id"].to_numpy()
    slot = pdf["slot"].to_numpy().astype(np.int64)
    order = np.lexsort((slot, doc))
    doc = doc[order]
    slot = slot[order]
    tf = pdf["tf"].to_numpy()[order].astype(np.float64)
    dl = pdf["dl"].to_numpy()[order].astype(np.float64)
    pos_obj = pdf["positions"].to_numpy()[order]
    change = np.flatnonzero(doc[1:] != doc[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    cand = np.flatnonzero(ends - starts == n_slots)
    cand_rows = starts[cand][:, None] + np.arange(n_slots)[None, :]
    valid = (slot[cand_rows] == np.arange(n_slots)[None, :]).all(axis=1)
    cand = cand[valid]
    cand_rows = cand_rows[valid]
    m = cand.size
    plen = np.fromiter((len(p) for p in pos_obj), dtype=np.int64, count=n)

    def slot_keys(s):
        rows = cand_rows[:, s]
        lens = plen[rows]
        flat = np.concatenate(list(pos_obj[rows])).astype(np.int64)
        docord = np.repeat(np.arange(m, dtype=np.int64), lens)
        return (docord << np.int64(32)) | flat

    keys = {s: slot_keys(s) for s in sorted(set(term_order))}
    ok = keys[term_order[0]]
    for off in range(1, len(term_order)):
        tgt = keys[term_order[off]]
        probe = ok + off
        idx = np.searchsorted(tgt, probe)
        inb = idx < tgt.size
        hit = inb.copy()
        hit[inb] = tgt[idx[inb]] == probe[inb]
        ok = ok[hit]
    matched = np.unique(ok >> np.int64(32))
    tf_c = tf[cand_rows]
    dl_c = dl[cand_rows]
    sc = (idf_by_slot[None, :] * tf_c * (k1 + 1.0)
          / (tf_c + k1 * (1.0 - b + b * dl_c / avgdl))).sum(axis=1)
    return pd.DataFrame({"doc_id": doc[starts[cand]][matched],
                         "score": sc[matched]})


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    pdf, n_slots, idf = synth_frame(n_docs)
    term_order = [0, 1]
    avgdl = 120.0

    t0 = time.time()
    a = old_kernel(pdf, n_slots, idf, term_order, avgdl)
    t_old = time.time() - t0
    t0 = time.time()
    b = new_kernel(pdf, n_slots, idf, term_order, avgdl)
    t_new = time.time() - t0

    a2 = a.sort_values("doc_id").reset_index(drop=True)
    b2 = b.sort_values("doc_id").reset_index(drop=True)
    assert (a2["doc_id"].to_numpy() == b2["doc_id"].to_numpy()).all()
    assert np.allclose(a2["score"], b2["score"], rtol=1e-12)
    result = {
        "n_docs": n_docs,
        "candidate_rows": int(len(pdf)),
        "matches": int(len(a)),
        "old_per_doc_loop_sec": round(t_old, 3),
        "new_vectorized_sec": round(t_new, 3),
        "speedup": round(t_old / t_new, 1),
        "identical_results": True,
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
