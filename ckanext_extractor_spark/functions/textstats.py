"""Text analysis for training-data pipelines: token stats, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions over the simple SQL tokenizer (DuckDB-
checkable); swap in the code-aware analyzer's postings for the
identifier-aware variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.analysis.stopwords import ENGLISH_STOPWORDS

# tiny per-language function-word lists for the n-gram-free langid
# heuristic (deterministic, inline-able in SQL oracles)
LANGID_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit"),
    "fr": ("le", "la", "les", "et", "est", "avec"),
    "es": ("el", "la", "los", "y", "es", "con"),
}


def _tokens(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda x: x != ""
    )


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token count, distinct-token count, avg token length."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
    ).withColumn(
        "avg_token_len",
        F.when(
            F.col("n_tokens") > 0,
            F.col("total_token_chars") / F.col("n_tokens"),
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:
    length band, stopword ratio (natural-language-ness), alpha ratio,
    repetition (distinct/total). The composite is a frozen linear blend —
    a placeholder for a learned quality model, with the same plumbing."""
    toks = _tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in sorted(ENGLISH_STOPWORDS)])
    n = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-stop hits
    stop_ratio = F.when(n > 0, n_stop / F.least(n, F.lit(len(ENGLISH_STOPWORDS)))).otherwise(0.0)
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(0.0)
    len_band = F.when((n >= 20) & (n <= 10_000), 1.0).otherwise(
        F.when(n > 0, 0.5).otherwise(0.0)
    )
    score = (
        0.3 * len_band
        + 0.25 * F.least(stop_ratio * 3.0, F.lit(1.0))
        + 0.25 * alpha_ratio
        + 0.2 * distinct_ratio
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess: count hits per language list, argmax
    (ties broken by FIRST language code alphabetically — the struct
    carries a negated rank so array_max's lexicographic order resolves a
    de/en tie to 'de', not reverse-alphabetically). 'und' when nothing
    matches."""
    toks = _tokens(F.col(text_col))
    hits = []
    for rank, lang in enumerate(sorted(LANGID_MARKERS)):
        arr = F.array(*[F.lit(w) for w in LANGID_MARKERS[lang]])
        hits.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).alias(
                    "hits"
                ),
                F.lit(-rank).alias("nrank"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*hits))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_guess"),
        best["hits"].alias("marker_hits"),
    )


def token_count_estimates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Model-token budget estimators per doc: whitespace token count,
    BPE-ish piece count (runs of letters / digits / non-alnum symbols —
    the split every byte-pair vocabulary starts from), and chars-per-
    piece. Pure Catalyst (`regexp_count`), one projection, no shuffle;
    the regex stays in the RE2 ∩ Java subset so the DuckDB oracle runs
    the same pattern. The piece count upper-bounds real BPE tokens
    (merges only shrink it), which is the budget planners want."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    pieces = F.regexp_count(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+")
    ).cast("long")
    n_chars = F.length(text_col)
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        pieces.alias("n_bpe_pieces"),
        F.round(
            F.when(pieces > 0, n_chars / pieces).otherwise(0.0), 6
        ).alias("chars_per_piece"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    table A1): top-token fraction (fraction of tokens that are the
    single most frequent token), top-bigram fraction, and
    duplicate-token fraction (1 - distinct/total). High values mark
    degenerate/boilerplate text that the quality gate should drop
    before training.

    Shape for scale: explode -> hash-aggregate per (doc, gram) with
    map-side partial aggregation, then one per-doc aggregate — linear
    in corpus tokens, never quadratic in doc length (the pure-array
    mode-count alternative is O(distinct x len) per doc). The unigram
    and bigram branches join back on doc_id (co-partitioned after
    their aggregates). Zero-token docs survive with zeroed stats.
    """
    toks = _tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    uni = (
        base.select("doc_id", F.explode("toks").alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct_tokens"),
            F.max("c").alias("top_token_count"),
        )
    )
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        F.slice(F.col("toks"), 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = (
        base.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("top_bigram_count"))
    )
    n = F.coalesce(F.col("n_tokens"), F.lit(0))
    return (
        base.select("doc_id")
        .join(uni, "doc_id", "left")
        .join(bi, "doc_id", "left")
        .select(
            F.col("doc_id"),
            n.alias("n_tokens"),
            F.coalesce("n_distinct_tokens", F.lit(0)).alias(
                "n_distinct_tokens"
            ),
            F.round(
                F.when(n > 0, F.col("top_token_count") / n).otherwise(0.0), 6
            ).alias("top_token_frac"),
            F.round(
                F.when(
                    n > 1,
                    F.coalesce("top_bigram_count", F.lit(0)) / (n - 1),
                ).otherwise(0.0),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.when(
                    n > 0, 1.0 - F.col("n_distinct_tokens") / n
                ).otherwise(0.0),
                6,
            ).alias("dup_token_frac"),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Winnowing-lite fingerprint: min/max portable token hash + distinct
    count — a compact sketch for shard-level dedup triage."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("term"),
    )
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")
    return tok.groupBy(id_col).agg(
        F.min(h).alias("fp_min"),
        F.max(h).alias("fp_max"),
        F.count("*").alias("n_distinct_terms"),
    )


def bigram_perplexity(df: DataFrame, lam: float = 0.7,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Interpolated bigram-LM perplexity — the KenLM-shaped quality
    filter one rung above :func:`unigram_surprisal` (CCNet filters on
    a 5-gram KenLM; the Jelinek-Mercer bigram here is the same scoring
    pipeline with a self-trained table, so swapping in external LM
    probabilities stays a join swap).

    Model: the corpus's own counts give p_uni(w) = cf(w)/T and
    p_bi(w|prev) = cf(prev,w)/hist(prev) where hist(prev) counts prev
    in history position (= sum of bigram counts with that prev, NOT
    the unigram count — doc-final tokens never open a bigram). A doc's
    first token scores -log2 p_uni; every later token scores
    -log2(lam*p_bi + (1-lam)*p_uni) — interpolation means unseen-pair
    smoothing is built in (p_bi term is never 0 for observed pairs and
    the unigram floor covers the rest). Returns (id, n_tokens,
    mean_bits [bits/token over all tokens], ppl = 2^mean); zero-token
    docs pass through pinned to 0.

    Shape for scale: the bigram stream is built INSIDE the per-row
    projection (token array zipped with its own shift — no lag window,
    so no per-doc sort exchange); then two hash aggregates (unigram
    cf, bigram cf — both map-side partial), hist(prev) derived from
    the bigram table (no third pass over tokens), and the count tables
    joined back onto the streams on their natural keys (broadcast
    while the dictionary fits, shuffle-hash beyond). One per-doc
    aggregate closes it. Everything between scan and the count
    aggregates is whole-stage codegen.
    """
    if isinstance(lam, bool) or not isinstance(lam, (int, float)) \
            or not 0.0 <= float(lam) <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam!r}")
    lam = float(lam)
    toks = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_t")
    )
    uni_stream = toks.select(
        F.col(id_col),
        F.posexplode(F.col("_t")).alias("_pos", "_term"),
    )
    bi_stream = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(_t, 2, greatest(size(_t) - 1, 0)), "
                "(w, i) -> struct(_t[i] as prev, w as w))"
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.prev").alias("_prev"),
             F.col("_bg.w").alias("_w"))

    uni = uni_stream.groupBy("_term").agg(
        F.count("*").cast("double").alias("_cf")
    )
    total = uni_stream.select(F.count("*").cast("double").alias("_total"))
    bi = bi_stream.groupBy("_prev", "_w").agg(
        F.count("*").cast("double").alias("_bcf")
    )
    hist = bi.groupBy("_prev").agg(F.sum("_bcf").alias("_hist"))

    p_uni = (F.col("_cf") / F.col("_total"))
    first_bits = (
        uni_stream.where(F.col("_pos") == 0)
        .join(uni, "_term")
        .crossJoin(F.broadcast(total))
        .select(id_col, (-F.log2(p_uni)).alias("_bits"))
    )
    rest_bits = (
        bi_stream.join(bi, ["_prev", "_w"])
        .join(hist, "_prev")
        .join(uni.withColumnRenamed("_term", "_w"), "_w")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (-F.log2(
                F.lit(lam) * (F.col("_bcf") / F.col("_hist"))
                + F.lit(1.0 - lam) * p_uni
            )).alias("_bits"),
        )
    )
    per_doc = first_bits.unionByName(rest_bits).groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg("_bits").alias("_mean"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(F.coalesce("_mean", F.lit(0.0)), 6).alias("mean_bits"),
            F.round(F.pow(F.lit(2.0), F.coalesce("_mean", F.lit(0.0))), 4)
            .alias("ppl"),
        )
    )


def unigram_surprisal(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Perplexity-proxy quality signal: per-doc mean unigram surprisal
    -log2 p(token), with p estimated from the corpus's OWN unigram
    distribution (cf / total tokens). The cheap stand-in for an
    LM-based quality filter (CCNet scores with a real KenLM; the
    plumbing — corpus-level stats joined back onto the token stream —
    is identical, so swapping in external LM probabilities is a
    one-join change). Low surprisal ~ repetitive/common text, high ~
    rare-token noise; both tails get filtered in practice.

    Shape for scale: one token-count hash aggregate (map-side partial)
    for the unigram table, the corpus total folded in as a 1-row
    broadcast, the unigram table joined back onto the token stream on
    the term key (broadcast while the dictionary fits, shuffle-hash
    beyond), one per-doc aggregate. Zero-token docs pass through with
    surprisal pinned to 0.0. Returns
    (id, n_tokens, mean_surprisal [bits/token], ppl = 2^mean)."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_term")
    )
    cf = toks.groupBy("_term").agg(F.count("*").cast("double").alias("_cf"))
    total = toks.select(F.count("*").cast("double").alias("_total"))
    scored = (
        toks.join(cf, "_term")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (-(F.log2(F.col("_cf") / F.col("_total")))).alias("_s"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg("_s").alias("_mean"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(F.coalesce("_mean", F.lit(0.0)), 6)
            .alias("mean_surprisal"),
            F.round(F.pow(F.lit(2.0), F.coalesce("_mean", F.lit(0.0))), 4)
            .alias("ppl"),
        )
    )
