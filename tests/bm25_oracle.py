"""Pure pandas/numpy BM25 oracle (SURVEY.md §5.2 item 2).

Uses the SAME analysis kernel as the engine (that's the point: the oracle
independently re-derives tf/df/doc_len/scoring/ranking with numpy, while
the engine derives them through Spark dataflow — agreement validates the
dataflow, not the tokenizer twice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    QUERY_CONFIG,
    analyze_query,
    postings_for_batch,
)
from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1


class OracleIndex:
    def __init__(self, prepared_pdf: pd.DataFrame, config=INDEX_CONFIG):
        """prepared_pdf: columns (doc_id, lang, content) — doc_id already
        assigned (engine's prepare_corpus does the hashing)."""
        pdf = prepared_pdf.reset_index(drop=True)
        post = postings_for_batch(pdf["content"], pdf["lang"], config)
        post["doc_id"] = pdf["doc_id"].to_numpy()[post["idx"].to_numpy()]
        self.postings = post[["doc_id", "term", "tf", "positions", "doc_len"]]
        lens = post.groupby("doc_id")["doc_len"].first()
        self.doc_len = (
            pdf.set_index("doc_id").assign(doc_len=lens)["doc_len"].fillna(0).astype(int)
        )
        self.n_docs = len(pdf)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0
        self.df = post.groupby("term")["doc_id"].size()  # (term, doc) unique
        self.cf = post.groupby("term")["tf"].sum()

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
