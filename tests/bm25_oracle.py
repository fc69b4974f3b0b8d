"""Pure pandas/numpy BM25 oracle (SURVEY.md §5.2 item 2).

Shares ONLY the token stream with the engine (analyze_batch — pinned
separately by the tokenizer goldens); everything downstream —
tf/df/doc_len aggregation, idf, scoring, ranking — is re-derived here
with plain pandas groupbys, independently of the engine's
factorize/argsort/reduceat kernel and Spark dataflow. Agreement therefore
validates the engine's aggregation AND scoring, not just its scoring
(the r1 oracle reused postings_for_batch, pinning tf/doc_len against
itself — de-circularized per VERDICT r1 #8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    QUERY_CONFIG,
    analyze_batch,
    analyze_query,
)
from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1


class OracleIndex:
    def __init__(self, prepared_pdf: pd.DataFrame, config=INDEX_CONFIG):
        """prepared_pdf: columns (doc_id, lang, content) — doc_id already
        assigned (engine's prepare_corpus does the hashing)."""
        pdf = prepared_pdf.reset_index(drop=True)
        toks = analyze_batch(pdf["content"], pdf["lang"], config)
        toks = toks.assign(
            doc_id=pdf["doc_id"].to_numpy()[toks["idx"].to_numpy()]
        )
        # independent aggregation: plain pandas groupbys, no engine kernels
        tf = (
            toks.groupby(["doc_id", "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        # doc_len = distinct positions (Lucene discountOverlaps: injected
        # catenated tokens at posInc=0 don't inflate the norm) — derived
        # with pandas nunique, independently of the engine's head-count
        dl = toks.groupby("doc_id")["pos"].nunique()
        self.doc_len = (
            pd.Series(0, index=pdf["doc_id"].to_numpy())
            .add(dl, fill_value=0)
            .astype(int)
        )
        tf["doc_len"] = self.doc_len.reindex(tf["doc_id"]).to_numpy()
        # per-(doc, term) ascending position lists (phrase oracle input)
        self.positions = {
            (int(d), t): g["pos"].to_numpy()
            for (d, t), g in toks.groupby(["doc_id", "term"], sort=False)
        }
        self.postings = tf[["doc_id", "term", "tf", "doc_len"]]
        self.n_docs = len(pdf)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0
        self.df = self.postings.groupby("term")["doc_id"].size()
        self.cf = self.postings.groupby("term")["tf"].sum()

    def bm25_topk(
        self,
        query: str,
        k: int = 10,
        lang: str | None = None,
        conjunctive: bool = True,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> pd.DataFrame:
        terms = list(dict.fromkeys(analyze_query(query, lang, QUERY_CONFIG)))
        if not terms:
            return pd.DataFrame(columns=["doc_id", "score", "n_matched"])
        m = self.postings[self.postings["term"].isin(terms)].copy()
        if m.empty:
            return pd.DataFrame(columns=["doc_id", "score", "n_matched"])
        dfv = self.df.reindex(m["term"]).to_numpy(dtype=float)
        tf = m["tf"].to_numpy(dtype=float)
        dl = m["doc_len"].to_numpy(dtype=float)
        idf = np.log(1.0 + (self.n_docs - dfv + 0.5) / (dfv + 0.5))
        tfp = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
        m["term_score"] = idf * tfp
        per_doc = m.groupby("doc_id").agg(
            score=("term_score", "sum"), n_matched=("term", "size")
        )
        if conjunctive:
            per_doc = per_doc[per_doc["n_matched"] == len(terms)]
        per_doc = per_doc.reset_index().sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        )
        return per_doc.head(k).reset_index(drop=True)
