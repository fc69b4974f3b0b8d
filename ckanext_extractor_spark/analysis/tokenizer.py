"""Code-aware text analysis chain — the engine's single tokenizer kernel.

Re-expresses the Solr `text` fieldtype analyzer the reference installs
(travis/solr/ckan-2.8/schema.xml:51-66):

  T1 WhitespaceTokenizer        -> pandas .str.split()
  T2 WordDelimiterFilter        -> subword regex: split on case change,
     (generateWordParts=1,         alpha<->digit boundary, punctuation;
      generateNumberParts=1,       index mode additionally emits catenated
      catenateWords=1,             alpha / digit runs (camelCase -> camel,
      catenateNumbers=1,           case, camelcase)
      splitOnCaseChange=1)
  T3 LowerCaseFilter            -> .str.lower()
  T5 ASCIIFoldingFilter         -> NFKD fold, strip non-ascii
  T4 stemming                   -> replaced by per-lang stopword removal
                                   (code corpus; north rule "lang-specific
                                   stopping"); optional, part of the frozen
                                   index contract.

Everything is vectorized pandas/numpy over Arrow batches — no per-row
Python UDFs.  The same functions serve index build (mapInPandas), query
analysis (driver-side, catenation off per the query analyzer
schema.xml:59-66), and the numpy test oracle, which is what makes
rank-identity achievable.

Position semantics (pinned by tokenizer goldens, not Lucene-parity):
``pos`` is the index of the token in the emitted stream per document,
assigned BEFORE stopword removal (removal leaves gaps, analogous to
Lucene position increments); catenated tokens follow their parts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ckanext_extractor_spark.analysis.stopwords import CODE_STOPWORDS

# Subword patterns for T2: maximal runs that WordDelimiterFilter would emit.
#   HTTPServer2 -> HTTP, Server, 2 ; camelCase -> camel, Case ;
#   snake_case -> snake, case ; utf8Decode -> utf, 8, Decode
ALPHA_PART_RE = (
    r"[A-ZÀ-Þ]+(?=[A-ZÀ-Þ][a-zß-öø-ɏ])"  # HTTP in HTTPServer
    r"|[A-ZÀ-Þ]?[a-zß-öø-ɏ]+"  # Server, camel, Case
    r"|[A-ZÀ-Þ]+"  # ALLCAPS run
)
DIGIT_RUN_RE = r"[0-9]+"
# One regex that yields the emitted parts in order: alpha subwords + digit runs.
PART_RE = ALPHA_PART_RE + r"|[0-9]+"

_NON_ALPHA_RE = r"[^A-Za-zÀ-ɏ]+"
_NON_DIGIT_RE = r"[^0-9]+"


@dataclass(frozen=True)
class AnalyzerConfig:
    """Frozen analysis contract. Changing any field re-defines the index."""

    mode: str = "index"  # "index" (catenate on) | "query" (catenate off)
    lowercase: bool = True
    ascii_fold: bool = True
    remove_stopwords: bool = True
    stopwords: dict[str, frozenset[str]] = field(
        default_factory=lambda: dict(CODE_STOPWORDS)
    )
    min_token_len: int = 1
    max_token_len: int = 64

    @property
    def catenate(self) -> bool:
        return self.mode == "index"


INDEX_CONFIG = AnalyzerConfig(mode="index")
QUERY_CONFIG = AnalyzerConfig(mode="query")


def _fold_ascii(s: pd.Series) -> pd.Series:
    """NFKD-normalize and drop non-ASCII bytes (Köln -> koln)."""
    return (
        s.str.normalize("NFKD")
        .str.encode("ascii", errors="ignore")
        .str.decode("ascii")
    )


def analyze_batch(
    texts: pd.Series,
    langs: pd.Series | None = None,
    config: AnalyzerConfig = INDEX_CONFIG,
) -> pd.DataFrame:
    """Run the full analysis chain over a batch of documents.

    Returns a DataFrame with columns ``(idx, pos, term)`` where ``idx`` is
    the positional index into ``texts`` (0..len-1) and ``pos`` the token
    position within the document (gaps where stopwords were removed).
    Entirely vectorized pandas string ops — the hot path of index build.
    """
    n = len(texts)
    s = texts.reset_index(drop=True).fillna("")
    if langs is not None:
        langs = langs.reset_index(drop=True).fillna("")

    # T1: whitespace tokenize, remember doc idx + order
    words = s.str.split()
    ex = words.explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame({"idx": np.array([], dtype=np.int64),
                             "pos": np.array([], dtype=np.int64),
                             "term": np.array([], dtype=object)})
    w = pd.DataFrame({"idx": ex.index.to_numpy(dtype=np.int64), "w": ex.to_numpy()})
    w["wpos"] = w.groupby("idx").cumcount()

    # T2: word-delimiter parts, in order
    parts = w["w"].str.findall(PART_RE)
    pf = pd.DataFrame(
        {
            "idx": np.repeat(w["idx"].to_numpy(), parts.str.len().to_numpy()),
            "wpos": np.repeat(w["wpos"].to_numpy(), parts.str.len().to_numpy()),
            "term": np.concatenate([np.array(p, dtype=object) for p in parts])
            if len(parts)
            else np.array([], dtype=object),
        }
    )
    pf["sub"] = pf.groupby(["idx", "wpos"]).cumcount()

    frames = [pf]
    if config.catenate:
        # catenateWords: join the alpha subparts when there are >= 2
        n_alpha = w["w"].str.count(ALPHA_PART_RE)
        cat_alpha = w["w"].str.replace(_NON_ALPHA_RE, "", regex=True)
        mask_a = (n_alpha >= 2) & (cat_alpha.str.len() > 0)
        if mask_a.any():
            frames.append(
                pd.DataFrame(
                    {
                        "idx": w.loc[mask_a, "idx"],
                        "wpos": w.loc[mask_a, "wpos"],
                        "term": cat_alpha[mask_a],
                        "sub": 1_000_000,
                    }
                )
            )
        # catenateNumbers: join digit runs when there are >= 2
        n_num = w["w"].str.count(DIGIT_RUN_RE)
        cat_num = w["w"].str.replace(_NON_DIGIT_RE, "", regex=True)
        mask_n = n_num >= 2
        if mask_n.any():
            frames.append(
                pd.DataFrame(
                    {
                        "idx": w.loc[mask_n, "idx"],
                        "wpos": w.loc[mask_n, "wpos"],
                        "term": cat_num[mask_n],
                        "sub": 1_000_001,
                    }
                )
            )
    out = pd.concat(frames, ignore_index=True) if len(frames) > 1 else pf
    out = out.sort_values(["idx", "wpos", "sub"], kind="stable", ignore_index=True)

    # T3 / T5
    if config.lowercase:
        out["term"] = out["term"].str.lower()
    if config.ascii_fold:
        out["term"] = _fold_ascii(out["term"])
    keep = out["term"].str.len().between(config.min_token_len, config.max_token_len)
    out = out[keep]

    # positions BEFORE stopword removal (removal leaves gaps)
    out = out.reset_index(drop=True)
    out["pos"] = out.groupby("idx").cumcount()

    # T4': per-lang stopword removal
    if config.remove_stopwords and langs is not None and config.stopwords:
        lang_of = langs.str.lower()
        doc_langs = lang_of.iloc[out["idx"].to_numpy()].to_numpy()
        drop = np.zeros(len(out), dtype=bool)
        for lg in pd.unique(doc_langs):
            stops = config.stopwords.get(lg)
            if stops:
                lmask = doc_langs == lg
                drop[lmask] = out.loc[lmask, "term"].isin(stops).to_numpy()
        out = out[~drop]

    res = out[["idx", "pos", "term"]].reset_index(drop=True)
    res["idx"] = res["idx"].astype(np.int64)
    res["pos"] = res["pos"].astype(np.int64)
    # guard: idx must address the input batch
    assert n == 0 or res.empty or res["idx"].max() < n
    return res


def postings_for_batch(
    texts: pd.Series,
    langs: pd.Series | None = None,
    config: AnalyzerConfig = INDEX_CONFIG,
) -> pd.DataFrame:
    """Analyze a batch and pre-aggregate to per-doc postings.

    Returns columns ``(idx, term, tf, positions, doc_len)``; ``positions``
    is a list[int], ``doc_len`` the total emitted-token count of the doc
    (post-stopword).  Doing the (term, doc) aggregation inside the Arrow
    batch is the map-side combine that keeps the Spark shuffle at posting
    granularity instead of token granularity — the difference between
    shuffling ~1 row per (doc, distinct term) and ~1 row per token, which
    at 100 TB is the difference between a feasible and an infeasible job.
    """
    toks = analyze_batch(texts, langs, config)
    if toks.empty:
        return pd.DataFrame(
            {
                "idx": np.array([], dtype=np.int64),
                "term": np.array([], dtype=object),
                "tf": np.array([], dtype=np.int64),
                "positions": np.array([], dtype=object),
                "doc_len": np.array([], dtype=np.int64),
            }
        )
    grp = toks.groupby(["idx", "term"], sort=False)
    agg = grp.agg(tf=("pos", "size"), positions=("pos", list)).reset_index()
    dl = toks.groupby("idx").size().rename("doc_len")
    agg = agg.merge(dl, left_on="idx", right_index=True)
    agg["tf"] = agg["tf"].astype(np.int64)
    agg["doc_len"] = agg["doc_len"].astype(np.int64)
    return agg


def analyze_query(query: str, lang: str | None = None,
                  config: AnalyzerConfig = QUERY_CONFIG) -> list[str]:
    """Analyze a query string with the query-mode chain (catenation off,
    per the reference's query analyzer schema.xml:59-66). Returns the
    term bag in order; duplicates preserved (BM25 sums per unique term,
    the query engine dedups as needed)."""
    langs = pd.Series([lang]) if lang is not None else None
    toks = analyze_batch(pd.Series([query]), langs, config)
    return toks["term"].tolist()
