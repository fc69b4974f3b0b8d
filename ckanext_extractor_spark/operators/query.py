"""BM25 top-k retrieval — slow (oracle) path as pure DataFrame algebra.

Reference analog: CKAN package_search -> Solr standard handler
(travis/solr/solrconfig.xml:490-500), default field `text`, default
operator AND (schema.xml:165-166), Lucene TF-IDF scoring — upgraded to
Okapi BM25 (k1=1.2, b=0.75) per the north rule.

Physical shape (why this survives scale):
  * `term IN (...)` is a pushed-down predicate on the postings table; with
    postings stored partitioned by term_bucket the scan prunes to the
    query's buckets (partition pruning), reading a few MB of a multi-TB
    index.
  * The per-term dictionary rows are a broadcast join (a handful of rows).
  * N and avgdl are a collected singleton — driver-side constants folded
    into the score expression.
  * The only exchange is the groupBy(doc_id) partial+final aggregation of
    per-(term,doc) scores; orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k + driver merge), never a global sort.

The fast path (block-max WAND over encoded segments) lives in
operators/wand.py; this module is the semantics oracle it must match
rank-identically (score desc, doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.analysis.tokenizer import QUERY_CONFIG, analyze_query
from ckanext_extractor_spark.operators.build import BM25_B, BM25_K1


def bm25_score_col(
    tf: Column,
    df: Column,
    doc_len: Column,
    n_docs: float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Okapi BM25 contribution of one (term, doc) posting, closed-form.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfp = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    idf = F.log(1.0 + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
    tfp = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doc_len / float(avgdl)))
    return idf * tfp


def bm25_search(
    postings: DataFrame,
    dictionary: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    k: int = 10,
    lang: str | None = None,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    config=QUERY_CONFIG,
    exclude_terms: "list[str] | None" = None,
    min_match: int | None = None,
    include_df: "DataFrame | None" = None,
) -> DataFrame:
    """Analyze `query` (query-mode chain, catenation off) and return the
    top-k ``(doc_id, score, n_matched)`` ranked score desc, doc_id asc.

    ``conjunctive=True`` = default-AND semantics (schema.xml:166): a doc
    must match every distinct query term. ``config`` must be the query
    analyzer matching the index contract (tokenizer.query_config_for).

    ``exclude_terms``: already-analyzed terms none of which may occur in
    a result doc (Lucene MUST_NOT / Solr ``-term``): a left-anti join on
    the excluded terms' postings, applied AFTER scoring — a prohibited
    clause filters, it never changes surviving docs' scores. The anti
    side is bounded by the excluded terms' df (broadcast when small; AQE
    decides).

    ``min_match`` (Solr mm): with ``conjunctive=False``, keep only docs
    matching at least that many distinct query terms (HAVING count >= m).

    ``include_df``: one-column ``doc_id`` DataFrame of allowed docs
    (Solr fq / Lucene FILTER clause): a left-semi join applied after
    scoring — filters restrict the result set, never the scores (idf
    stays the full-corpus value). At cluster scale the filter set never
    touches the driver; AQE broadcasts it when small.
    """
    terms = list(dict.fromkeys(analyze_query(query, lang, config)))
    spark = postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double, n_matched int")

    matched = postings.where(F.col("term").isin(terms))
    dict_rows = dictionary.where(F.col("term").isin(terms)).select("term", "df")
    scored = matched.join(F.broadcast(dict_rows), "term").select(
        "doc_id",
        bm25_score_col(
            F.col("tf"), F.col("df"), F.col("doc_len"), n_docs, avgdl, k1, b
        ).alias("term_score"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count("*").alias("n_matched").cast("int").alias("n_matched"),
    )
    if conjunctive:
        per_doc = per_doc.where(F.col("n_matched") == len(terms))
    elif min_match is not None and min_match > 1:
        per_doc = per_doc.where(F.col("n_matched") >= min_match)
    if exclude_terms:
        ex = (
            postings.where(F.col("term").isin(list(exclude_terms)))
            .select("doc_id")
            .distinct()
        )
        per_doc = per_doc.join(ex, "doc_id", "left_anti")
    if include_df is not None:
        per_doc = per_doc.join(
            include_df.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    # clamp the TakeOrdered window to the corpus: a huge k (the
    # fetch-everything idiom) otherwise allocates a k-sized heap per
    # partition (the boosted_search r3 OOM class; same clamp as the
    # synonyms path — code-review r5 finding)
    k = min(int(k), max(int(n_docs), 1))
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_search_synonyms(
    postings: DataFrame,
    dictionary: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    synonyms: dict[str, list[str]],
    k: int = 10,
    lang: str | None = None,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    phrase_rows: "DataFrame | None" = None,
    config=None,
) -> DataFrame:
    """Query-time synonym expansion (SURVEY.md T6; reference analog:
    SynonymFilter in the query-only analyzer, schema.xml:61,
    expand=true).

    Each analyzed query term becomes an OR-group {term + its synonyms'
    analyzed tokens}. A doc matches a group if it contains any member;
    conjunctive retrieval requires every group matched. Group score is the
    sum of matched members' BM25 contributions (pinned semantics; Lucene's
    SynonymQuery blends dfs — we keep per-term idf, which the oracle
    mirrors).

    Multi-word synonyms (VERDICT r4 #4): a synonym that analyzes to
    >= 2 tokens is a PHRASE member of its group — Solr's
    SynonymGraphFilter emits the multi-token target as a phrase
    sub-query at the source position, so 'ml' with synonym 'machine
    learning' admits docs containing the ADJACENT phrase, not docs
    holding the words apart. Single tokens of a multi-token synonym
    are NOT members on their own. The caller resolves phrase matches
    against the positions index and passes ``phrase_rows`` —
    (doc_id, gid, term_score) with PhraseWeight BM25 (idf = sum of the
    member tokens' idfs, tf = phrase start count, same dl norms) —
    which unions into the member scores before the group aggregate
    (see ExtractorEngine._synonym_phrase_rows)."""
    # config must match the INDEX analyzer chain (the engine passes
    # query_config_for(self.analyzer)); defaulting to QUERY_CONFIG
    # against a simple-mode or stemmed index would analyze the query
    # with the wrong chain and miss every term (code-review r5)
    if config is None:
        config = QUERY_CONFIG
    base_terms = list(dict.fromkeys(analyze_query(query, lang, config)))
    spark = postings.sparkSession
    if not base_terms:
        return spark.createDataFrame([], "doc_id long, score double, n_matched int")
    pairs: list[tuple[str, int]] = []
    for gid, t in enumerate(base_terms):
        members = [t]
        for syn in synonyms.get(t, []):
            toks = analyze_query(syn, lang, config)
            if len(toks) == 1:
                members.extend(toks)
            elif len(toks) >= 2 and phrase_rows is None:
                # multi-token synonyms arrive as phrase_rows, never as
                # independent single-term members — silently dropping
                # the synonym would shrink the group's match set
                # (code-review r5 finding)
                raise ValueError(
                    f"multi-token synonym {syn!r} needs phrase_rows "
                    "(use ExtractorEngine.search(synonyms=...), which "
                    "resolves phrase members against the positions "
                    "index)"
                )
        for m in dict.fromkeys(members):
            pairs.append((m, gid))
    term_gid = spark.createDataFrame(pairs, "term string, gid int")
    all_terms = [p[0] for p in pairs]
    matched = postings.where(F.col("term").isin(all_terms))
    dict_rows = dictionary.where(F.col("term").isin(all_terms)).select("term", "df")
    scored = (
        matched.join(F.broadcast(dict_rows), "term")
        .join(F.broadcast(term_gid), "term")
        .select(
            "doc_id",
            "gid",
            bm25_score_col(
                F.col("tf"), F.col("df"), F.col("doc_len"), n_docs, avgdl, k1, b
            ).alias("term_score"),
        )
    )
    if phrase_rows is not None:
        scored = scored.unionByName(
            phrase_rows.select("doc_id", "gid", "term_score")
        )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("score"),
        F.countDistinct("gid").cast("int").alias("n_matched"),
    )
    if conjunctive:
        per_doc = per_doc.where(F.col("n_matched") == len(base_terms))
    # clamp the TakeOrdered window to the corpus: a huge k (the
    # fetch-everything idiom) otherwise allocates a k-sized heap
    # (the boosted_search r3 OOM class)
    k = min(int(k), max(int(n_docs), 1))
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
