"""Per-field search over extracted metadata (SURVEY.md Q5).

Reference analog: every metadata key becomes its own dynamic Solr field
``ckanext-extractor_{id}_{key}`` (plugin.py:40,140; schema.xml:161) that
``package_search`` can target as a filter query. The body text keeps the
copyField catch-all behavior (the main index); metadata fields get their
own postings table here so queries can target a single key.

Semantics mirror the reference's filter-query use: a doc matches when ALL
analyzed query tokens occur in that doc's value for the field (boolean
AND, unscored — Solr fq does not score either). The analyzer is the
SQL-parity simple chain (lower + [a-z0-9] runs): metadata values are
short strings where identifier catenation adds nothing, and this keeps
the operator fully oracle-checkable.

Scale: field_postings is O(docs x keys x value tokens) — metadata values
are tiny next to content, so the table is a small fraction of the main
postings; the build is one explode + hash aggregate, the query one
pushed-filter scan + aggregate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELD_POSTINGS_SCHEMA = "doc_id long, field string, term string, tf long"

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def analyze_field_query(query: str) -> list[str]:
    """Driver-side simple analysis matching the build-side tokenizer."""
    return _SIMPLE_RE.findall(query.lower())


def build_field_postings(
    prepared: DataFrame,
    id_col: str = "doc_id",
    meta_col: str = "metadata",
) -> DataFrame:
    """(doc_id, field, term, tf) from a map<string,string> metadata column
    (already cleaned/collapsed/filtered by the engine's sidecar stage)."""
    return (
        prepared.select(
            F.col(id_col), F.explode(F.col(meta_col)).alias("field", "value")
        )
        .select(
            id_col,
            "field",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("value")), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("term"),
        )
        .groupBy(id_col, "field", "term")
        .agg(F.count("*").alias("tf"))
    )


def build_field_norms(
    field_postings: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, field, dl) — per-(doc, field) token length, Lucene's
    per-field norm, computed at index time (Lucene stores norms in the
    .nvd/.nvm files at flush; BM25Similarity reads them per query
    instead of re-counting). One partial+final aggregate over the field
    postings; the output is one row per (doc, field) — strictly smaller
    than its input — so persisting it turns every dismax query's
    doc-scale length aggregate into a pushed-filter scan of a tiny
    table."""
    return field_postings.groupBy(id_col, "field").agg(
        F.sum("tf").alias("dl")
    )


def phrase_tf_expr(value_col, phrase_terms: list[str]):
    """Phrase frequency of the analyzed ``phrase_terms`` sequence inside
    a metadata value, as a pure Catalyst expression over the simple
    chain: tokenize the value, then count EVERY start position whose
    n-slice equals the phrase (Lucene ExactPhraseMatcher counts
    overlapping starts too — ['a','a','a'] contains ['a','a'] twice)."""
    n = len(phrase_terms)
    ta = F.filter(
        F.split(F.lower(value_col), r"[^a-z0-9]+"), lambda x: x != ""
    )
    target = F.array(*[F.lit(t) for t in phrase_terms])
    return F.when(
        F.size(ta) >= n,
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(ta) - n + 1),
                lambda i: F.slice(ta, i, n) == target,
            )
        ),
    ).otherwise(F.lit(0))


def sloppy_phrase_tf_expr(value_col, phrase_terms: list[str], slop: int):
    """Sloppy phrase frequency of ``phrase_terms`` inside a metadata
    value, as a pure Catalyst expression — the edismax ``ps`` kernel
    (VERDICT r4 #2). Match criterion is Lucene SloppyPhraseScorer's
    smallest-range test (lucene_slop_match, phrase.py:51): phrase slot
    k matching at token position p has OFFSET-ADJUSTED position p - k,
    and a match exists when one position per slot fits an adjusted
    window of width ``slop``. The countable unit is the ANCHOR: tf =
    |{i : every slot k has an occurrence with p - k in [i, i+slop]}|.

    Pinned properties (tests/test_dismax_ps.py):
    * slop=0 ≡ :func:`phrase_tf_expr` (the window degenerates to the
      exact adjacent-start count);
    * an isolated match of adjusted span s' contributes slop - s' + 1
      anchors — tighter matches weigh more, the same shape as Lucene's
      1/(1+matchLength) slop factor, but integral and therefore
      SQL-expressible for the oracle gate;
    * total-move semantics: 'b a'~2 matches text 'a b' (span 2), which
      the per-gap NEAR/n form never does;
    * repeated phrase terms may satisfy two slots with ONE occurrence
      (no distinct-position constraint — Lucene's repeat handling is
      out of scope here, same pin as slop_mode='lucene').

    Cost per value: O(tokens * n * slop) window probes, all inside
    whole-stage codegen — metadata values are short strings, and the
    one scan of the EAV frame is shared across every phrase clause
    (see dismax_search_fields), so this adds no shuffle."""
    n = len(phrase_terms)
    s = int(slop)
    if s == 0:
        return phrase_tf_expr(value_col, phrase_terms)
    ta = F.filter(
        F.split(F.lower(value_col), r"[^a-z0-9]+"), lambda x: x != ""
    )
    size = F.size(ta)

    def slot_ok(i, k: int, term: str):
        # slot k needs a token == term at position q in [i+k, i+k+slop]
        lo = F.greatest(i + F.lit(k), F.lit(1))
        hi = F.least(i + F.lit(k + s), size)
        return F.when(
            lo <= hi,
            F.exists(
                F.slice(ta, lo, hi - lo + 1),
                lambda x: x == F.lit(term),
            ),
        ).otherwise(F.lit(False))

    def match_at(i):
        cond = slot_ok(i, 0, phrase_terms[0])
        for k, t in enumerate(phrase_terms[1:], start=1):
            cond = cond & slot_ok(i, k, t)
        return cond

    # anchors sweep [2-n-slop, size]: the lowest adjusted position is
    # 1-(n-1), so no match has anchors below 2-n-slop
    return F.when(
        size >= 1,
        F.size(F.filter(F.sequence(F.lit(2 - n - s), size), match_at)),
    ).otherwise(F.lit(0))


def field_clause_frame(
    field_postings: DataFrame,
    clause_tokens: "dict[int, list[str]]",
    qf: "dict[str, float]",
    norms: "DataFrame | None" = None,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, clause, field, s) — per-(doc, user-clause, field) boosted
    BM25 over the metadata sidecar: for each clause (a whitespace-split
    query word, index-keyed), the field's score is boost_f * the sum of
    per-field BM25 of the clause's field-analyzed tokens. This is the
    metadata half of edismax-with-body: the engine unions it with the
    body index's clause frame and takes the DisjunctionMax per
    (doc, clause) across fields.

    Scale shape: same skeleton as :func:`dismax_search_fields` — pushed
    field/term scans, broadcast stats/df and the tiny (term, clause)
    map, one hash aggregate keyed (doc, clause, field)."""
    spark = field_postings.sparkSession
    empty = spark.createDataFrame(
        [], f"{id_col} long, clause int, field string, s double"
    )
    fields = list(qf)
    pairs = [
        (t, int(ci))
        for ci, toks in clause_tokens.items()
        for t in toks
    ]
    if not fields or not pairs:
        return empty
    terms = list(dict.fromkeys(t for t, _ in pairs))
    cmap = spark.createDataFrame(pairs, "term string, clause int")
    fp = field_postings.where(F.col("field").isin(fields))
    if norms is not None:
        dl = norms.where(F.col("field").isin(fields)).select(
            id_col, "field", "dl"
        )
    else:
        dl = fp.groupBy(id_col, "field").agg(F.sum("tf").alias("dl"))
    stats = dl.groupBy("field").agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = (
        fp.where(F.col("term").isin(terms))
        .groupBy("field", "term")
        .agg(F.count("*").alias("df"))
    )
    boost = F.lit(None).cast("double")
    for f_name, f_boost in qf.items():
        boost = F.when(F.col("field") == f_name, F.lit(float(f_boost))) \
            .otherwise(boost)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfp = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        fp.where(F.col("term").isin(terms))
        .join(dl, [id_col, "field"])
        .join(F.broadcast(stats), "field")
        .join(F.broadcast(df_t), ["field", "term"])
        .join(F.broadcast(cmap), "term")
        .groupBy(id_col, "clause", "field")
        .agg(F.sum(boost * idf * tfp).alias("s"))
    )


def field_term_scores(
    field_postings: DataFrame,
    field: str,
    tokens: list[str],
    norms: "DataFrame | None" = None,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score) for one fielded clause ``field:value`` — docs
    whose ``field`` contains ALL analyzed ``tokens`` (search_field's
    conjunctive semantics), scored with per-field BM25 summed over the
    tokens (Lucene TermQuery on a field: per-field df/N/avgdl/dl, the
    same statistics dismax uses). ``norms`` = the engine's persisted
    field_norms table; without it the per-(doc, field) length aggregate
    runs query-time.

    Scale shape: field/term filters push to the parquet scan, stats and
    the per-term df are broadcast, the doc-side is one hash aggregate —
    the same plan skeleton as dismax_search_fields restricted to one
    field."""
    spark = field_postings.sparkSession
    empty = spark.createDataFrame([], f"{id_col} long, score double")
    toks = list(dict.fromkeys(tokens))
    if not toks:
        return empty
    fp_f = field_postings.where(F.col("field") == field)
    if norms is not None:
        dl = norms.where(F.col("field") == field).select(id_col, "dl")
    else:
        dl = fp_f.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    matched = fp_f.where(F.col("term").isin(toks))
    df_t = matched.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfp = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(df_t), "term")
        .select(id_col, (idf * tfp).alias("s"))
    )
    return (
        scored.groupBy(id_col)
        # rows are unique per (doc, term) by construction, so count(*)
        # counts distinct matched tokens
        .agg(F.sum("s").alias("score"), F.count("*").alias("_m"))
        .where(F.col("_m") == len(toks))
        .select(id_col, "score")
    )


def dismax_search_fields(
    field_postings: DataFrame,
    query: str,
    qf: dict[str, float],
    k: int = 10,
    tie: float = 0.0,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    min_match: "int | None" = None,
    norms: "DataFrame | None" = None,
    pf: "dict[str, float] | None" = None,
    values: "DataFrame | None" = None,
    pf2: "dict[str, float] | None" = None,
    pf3: "dict[str, float] | None" = None,
    ps: int = 0,
    ps2: "int | None" = None,
    ps3: "int | None" = None,
) -> DataFrame:
    """Scored multi-field search — Solr (e)dismax ``qf`` with per-field
    boosts and ``tie`` breaker (Lucene DisjunctionMaxQuery).

    Reference analog: CKAN's package_search queries Solr through the
    dismax parser with qf boosts over the catch-all text plus the dynamic
    metadata fields the reference creates per extracted key
    (plugin.py:40,140; schema.xml:161). Semantics implemented exactly as
    DisjunctionMaxQuery: per (doc, query term) the score is the MAX over
    fields of boost_f * BM25_f(term, doc) plus ``tie`` times the sum of
    the non-max field scores; a doc's score is the sum over matched
    terms (pure disjunction — pair with a match filter upstream if mm
    semantics are wanted). BM25 stats (df, N, avgdl, dl) are PER FIELD,
    as Lucene keeps per-field norms and term statistics. Query terms are
    deduplicated (dict order), matching search_field.

    Scale shape: the field/term filters push to the parquet scan; field
    stats and the (field, term) df table are tiny and broadcast; top-k
    is a global TakeOrderedAndProject — no full sort, no driver
    materialization beyond k rows. ``norms`` (build-time
    :func:`build_field_norms` output, the engine's ``field_norms``
    table) replaces the one doc-scale piece — the per-(doc, field)
    length aggregate over ALL terms of the qf fields — with a
    pushed-filter scan of the precomputed (doc, field, dl) rows, the
    way Lucene reads index-time norms per query instead of re-counting;
    per-field n_docs/avgdl are re-derived from the norms rows (they
    change with every add/delete, so persisting them would just be a
    second table to invalidate). Without ``norms`` the aggregate runs
    query-time (pre-norms stores keep working).

    ``pf`` (edismax phrase fields, with ``values`` = the (doc_id,
    field, value) EAV rows): the whole analyzed query, as a phrase,
    scores each pf field with phrase-frequency BM25 (tf = count of
    phrase starts via :func:`phrase_tf_expr`; idf = the SUM of the
    phrase terms' per-field idfs, Lucene PhraseWeight; norms = the same
    per-field dl), pf fields combine DisjunctionMax-with-``tie`` like
    qf, and the result ADDS to matching docs' main score (edismax
    attaches pf phrases as SHOULD clauses — a phrase-only doc that
    fails the main query stays excluded). Single-term queries skip pf
    (no phrase to build — Solr behaves the same). ``pf2``/``pf3``
    (edismax bigram/trigram phrase fields) build one SHOULD clause per
    ADJACENT token pair / triple over their own field maps; all phrase
    clauses' tfs come from ONE scan of the values frame (stacked via
    explode), each clause dismaxes over its fields, and clause
    contributions sum.

    ``ps``/``ps2``/``ps3`` (edismax phrase slop): the slop applied to
    the pf / pf2 / pf3 clauses' phrase tf — ps2/ps3 DEFAULT to ps when
    unset, Solr parity. Sloppy tf is the pinned anchor-window count of
    :func:`sloppy_phrase_tf_expr` (ps=0 ≡ the exact pf); the slop only
    swaps the tf expression inside the same one-scan plan.

    Divergence, pinned: the engine's main content index is not a qf
    target (its analyzer differs from the field chain); combine with
    ``search()`` for body relevance, as CKAN combines text with field
    boosts inside one Solr schema.
    """
    empty = field_postings.sparkSession.createDataFrame(
        [], f"{id_col} long, score double"
    )
    terms = list(dict.fromkeys(analyze_field_query(query)))
    if not terms or not qf:
        return empty
    fields = list(qf)
    pf = dict(pf or {})
    # fields_all must span EVERY phrase-field map: in Solr pf2/pf3
    # fields are independent of qf, and the dl/stats/df_t relations
    # below are filtered to fields_all — a field named only in
    # pf2/pf3 would otherwise lose its rows and its phrase clauses
    # would vanish in the inner joins (code-review r5 finding)
    fields_all = list(dict.fromkeys(
        fields + list(pf) + list(pf2 or {}) + list(pf3 or {})
    ))
    fp_all = field_postings.where(F.col("field").isin(fields_all))
    fp = fp_all.where(F.col("field").isin(fields))
    if norms is not None:
        dl = norms.where(F.col("field").isin(fields_all)).select(
            id_col, "field", "dl"
        )
    else:
        dl = fp_all.groupBy(id_col, "field").agg(F.sum("tf").alias("dl"))
    stats = dl.groupBy("field").agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = (
        fp_all.where(F.col("term").isin(terms))
        .groupBy("field", "term")
        .agg(F.count("*").alias("df"))
    )
    boost = F.lit(None).cast("double")
    for f_name, f_boost in qf.items():
        boost = F.when(F.col("field") == f_name, F.lit(float(f_boost))) \
            .otherwise(boost)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfp = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        fp.where(F.col("term").isin(terms))
        .join(dl, [id_col, "field"])
        .join(F.broadcast(stats), "field")
        .join(F.broadcast(df_t), ["field", "term"])
        .select(id_col, "term", (boost * idf * tfp).alias("s"))
    )
    per_term = scored.groupBy(id_col, "term").agg(
        (
            F.max("s") + F.lit(float(tie)) * (F.sum("s") - F.max("s"))
        ).alias("ds")
    )
    agg = per_term.groupBy(id_col).agg(
        F.sum("ds").alias("score"), F.count("*").alias("_m")
    )
    if min_match is not None:
        # edismax mm over the dismax clauses: a doc must match at least
        # min_match DISTINCT query terms (in any field) — a filter on
        # the matched-term count, never a rescore
        agg = agg.where(F.col("_m") >= int(min_match))
    ptoks = analyze_field_query(query)  # ordered, dups kept (positions)
    # (boost_map, subphrases) per phrase-field flavor (Solr edismax):
    # pf = the whole query, pf2 = adjacent bigrams, pf3 = adjacent
    # trigrams. Every subphrase is its own SHOULD clause: it earns a
    # DisjunctionMax-with-tie over its flavor's fields, and clause
    # contributions SUM onto matching docs' main score.
    # (boost_map, subphrases, slop): ps2/ps3 default to ps (Solr)
    s_pf = int(ps)
    s_pf2 = s_pf if ps2 is None else int(ps2)
    s_pf3 = s_pf if ps3 is None else int(ps3)
    phrase_specs: "list[tuple[dict[str, float], list[list[str]], int]]" = []
    if pf and len(ptoks) >= 2:
        phrase_specs.append((pf, [ptoks], s_pf))
    if pf2 and len(ptoks) >= 2:
        phrase_specs.append(
            (dict(pf2), [ptoks[i:i + 2] for i in range(len(ptoks) - 1)],
             s_pf2)
        )
    if pf3 and len(ptoks) >= 3:
        phrase_specs.append(
            (dict(pf3), [ptoks[i:i + 3] for i in range(len(ptoks) - 2)],
             s_pf3)
        )
    if phrase_specs and values is not None:
        from collections import Counter

        # flat clause list: (clause id, boost map, subphrase tokens, slop)
        clauses: "list[tuple[int, dict[str, float], list[str], int]]" = []
        for pmap, subs, sl in phrase_specs:
            for sub in subs:
                clauses.append((len(clauses), pmap, sub, sl))
        all_pfields = sorted(
            {f for _, pmap, _, _ in clauses for f in pmap}
        )
        pvals = values.where(F.col("field").isin(all_pfields))
        # ONE scan of the EAV values computes every clause's phrase tf,
        # stacked into (doc, field, pid, ptf) rows via explode
        ptf_structs = F.array(*[
            F.struct(
                F.lit(pid).alias("pid"),
                sloppy_phrase_tf_expr(F.col("value"), sub, sl).alias("ptf"),
            )
            for pid, _, sub, sl in clauses
        ])
        pmatch = (
            pvals.select(id_col, "field", F.explode(ptf_structs).alias("_e"))
            .select(id_col, "field", F.col("_e.pid").alias("pid"),
                    F.col("_e.ptf").alias("ptf"))
            .where(F.col("ptf") > 0)
        )
        # per-(field, clause) summed idf of the clause terms, weighted
        # by position multiplicity (Lucene PhraseWeight sums idf per
        # position); a field missing a term omits its idf, but such a
        # field can't contain the phrase either (ptf = 0 everywhere)
        sumidf_parts = []
        for pid, _pmap, sub, _sl in clauses:
            cnt = Counter(sub)
            w = F.lit(None).cast("double")
            for t, c in cnt.items():
                w = F.when(F.col("term") == t, F.lit(float(c))).otherwise(w)
            sumidf_parts.append(
                df_t.where(F.col("term").isin(list(cnt)))
                .join(F.broadcast(stats.select("field", "n_docs")), "field")
                .select(
                    "field", F.lit(pid).alias("pid"),
                    (w * F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )).alias("wi"),
                )
            )
        sumidf = sumidf_parts[0]
        for part in sumidf_parts[1:]:
            sumidf = sumidf.unionByName(part)
        sumidf = sumidf.groupBy("field", "pid").agg(
            F.sum("wi").alias("pidf")
        )
        # (pid, field) -> boost literal chain
        pboost = F.lit(None).cast("double")
        for pid, pmap, _sub, _sl in clauses:
            for f_name, f_boost in pmap.items():
                pboost = F.when(
                    (F.col("pid") == pid) & (F.col("field") == f_name),
                    F.lit(float(f_boost)),
                ).otherwise(pboost)
        ptfc = F.col("ptf").cast("double")
        ps = pboost * F.col("pidf") * (ptfc * (k1 + 1.0)) / (
            ptfc + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        pscored = (
            pmatch.join(dl, [id_col, "field"])
            .join(F.broadcast(stats), "field")
            .join(F.broadcast(sumidf), ["field", "pid"])
            .select(id_col, "pid", ps.alias("ps"))
        )
        # DisjunctionMax over fields PER CLAUSE, then clauses sum
        pagg = (
            pscored.groupBy(id_col, "pid")
            .agg(
                (
                    F.max("ps")
                    + F.lit(float(tie)) * (F.sum("ps") - F.max("ps"))
                ).alias("_v")
            )
            .groupBy(id_col)
            .agg(F.sum("_v").alias("_ps"))
        )
        agg = agg.join(pagg, id_col, "left").withColumn(
            "score", F.col("score") + F.coalesce(F.col("_ps"), F.lit(0.0))
        )
    return (
        agg.select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def search_field(
    field_postings: DataFrame,
    field: str,
    query: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids whose `field` value contains ALL analyzed query tokens.

    The field+term filters push down to the parquet scan; the AND is a
    distinct-count aggregate (no join)."""
    terms = list(dict.fromkeys(analyze_field_query(query)))
    if not terms:
        return field_postings.select(id_col).limit(0)
    return (
        field_postings.where(F.col("field") == field)
        .where(F.col("term").isin(terms))
        .groupBy(id_col)
        .agg(F.count_distinct("term").alias("_n"))
        .where(F.col("_n") == len(terms))
        .select(id_col)
    )
