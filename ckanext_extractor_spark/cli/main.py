"""CLI entry points (SURVEY.md B5; reference analog: the paster commands
extract/delete/list/show/init over explicit IDs or `all`, paster.py:72-194).

Run under spark-submit (cluster) or plain python (local):

    spark-submit --py-files engine.zip tools/submit_cli.py \
        build --source /data/corpus --index /data/index [--force] [--langs ...]
    python -m ckanext_extractor_spark.cli.main query --index /data/index \
        --q "parseBuffer camelCase" -k 10 [--mode wand|slow] [--or]
    python -m ckanext_extractor_spark.cli.main list|show|delete|lineage ...
"""

from __future__ import annotations

import argparse
import json
import sys

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.session import get_spark
from ckanext_extractor_spark.sources.corpus_source import read_corpus


def _engine(args) -> ExtractorEngine:
    spark = get_spark("ckanext-extractor-spark-cli")
    return ExtractorEngine(
        spark,
        args.index,
        indexed_langs=tuple(args.langs) if getattr(args, "langs", None) else ("*",),
        n_buckets=getattr(args, "buckets", 64),
        store_content=getattr(args, "store_content", False),
        store_offsets=getattr(args, "store_offsets", False),
    )


def cmd_build(args) -> int:
    eng = _engine(args)
    # an existing index's meta pins its storage options and wins over
    # constructor args — fail loudly instead of silently dropping the
    # flag (a doc_store can't be conjured for already-indexed docs)
    for flag, name in (("store_content", "--store-content"),
                       ("store_offsets", "--store-offsets")):
        if getattr(args, flag, False) and not getattr(eng, flag):
            raise SystemExit(
                f"{name} requested but the existing index at "
                f"{args.index} was built without it; use a fresh "
                "--index root (storage options are pinned at first "
                "build)")
    corpus = read_corpus(eng.spark, args.source, fmt=args.format)
    rep = eng.extract(corpus, force=args.force, build_id=args.build_id)
    print(
        json.dumps(
            {
                "build_id": rep.build_id,
                "statuses": rep.status_counts,
                "n_indexed": rep.n_indexed,
                "wall_sec": round(rep.wall_sec, 2),
                "resumed": rep.resumed,
                "in_progress": rep.in_progress,
                "compacted": rep.compacted,
            }
        )
    )
    return 3 if rep.in_progress else 0


def cmd_compact(args) -> int:
    eng = _engine(args)
    merged = eng.compact(dead_frac=args.dead_frac, max_gens=args.max_gens)
    print(json.dumps({"compacted": merged, "generations": len(eng._gens)}))
    return 0


def cmd_status(args) -> int:
    eng = _engine(args)
    print(
        json.dumps(
            {
                "in_progress": eng.in_progress(),
                "generations": eng._gens,
                "seq": eng._seq,
                "tombstones": eng._tombstone_count(),
            },
            default=str,
        )
    )
    return 0


def cmd_query(args) -> int:
    # flag validation BEFORE the engine opens (fail fast on bad combos)
    if args.bf and args.boost:
        # bf is additive, boost multiplicative; the old `spec = bf or
        # boost` silently applied the bf expression multiplicatively
        # and dropped --boost entirely (code-review r5 finding)
        raise SystemExit(
            "--bf and --boost cannot be combined; run one of them "
            "(or fold both into a single function expression)")
    if args.snippets:
        # these variants return before the snippets block; erroring
        # beats silently printing unhighlighted output
        # (code-review r5 finding)
        unsupported = [
            name for name, flag in (
                ("--collapse", args.collapse), ("--elevate", args.elevate),
                ("--bq", args.bq), ("--parent-of", args.parent_of),
                ("--child-of", args.child_of), ("--geo-field", args.geo_field),
                ("--graph-from", args.graph_from), ("--bf", args.bf),
                ("--boost", args.boost), ("--group", args.group),
                ("--sort", args.sort), ("--sort-multi", args.sort_multi),
                ("--rerank", args.rerank), ("--qf", args.qf),
            ) if flag
        ]
        if unsupported:
            raise SystemExit(
                "--snippets is not supported with "
                + "/".join(unsupported)
                + " (highlighting windows the plain/phrase/expr "
                "search forms)")
    eng = _engine(args)
    if args.collapse:
        for rank, (doc_id, score, value, exp) in enumerate(
            eng.collapse_search(args.q, args.collapse, k=args.k,
                                conjunctive=not args.use_or,
                                expand=args.expand), 1
        ):
            print(json.dumps({
                "rank": rank, "doc_id": doc_id, "score": round(score, 6),
                "value": value,
                "expanded": [{"doc_id": d, "score": round(s, 6)}
                             for d, s in exp],
            }))
        return 0
    if args.elevate:
        hits = eng.search_elevated(
            args.q, [int(x) for x in args.elevate.split(",")], k=args.k,
            exclude_ids=[int(x) for x in args.elevate_exclude.split(",")]
            if args.elevate_exclude else None,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for rank, (doc_id, score) in enumerate(hits, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.bq:
        hits = eng.boost_query_search(
            args.q, args.bq, k=args.k, weight=args.bq_weight,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for rank, (doc_id, score) in enumerate(hits, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.parent_of:
        hits = eng.parent_search(
            args.q, args.parent_of, k=args.k, score_mode=args.score_mode,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for rank, (doc_id, score) in enumerate(hits, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.child_of:
        hits = eng.child_search(
            args.q, args.child_of, k=args.k,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for rank, (doc_id, score) in enumerate(hits, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.geo_field:
        lat_s, _, lon_s = (args.geo_pt or "").partition(",")
        try:
            pt = (float(lat_s), float(lon_s))
        except ValueError:
            print("query: --geo-pt must be 'lat,lon'", file=sys.stderr)
            return 2
        hits = eng.spatial_search(
            args.q, args.geo_field, pt, args.geo_d, k=args.k,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for doc_id, dist in hits:
            print(json.dumps({"doc_id": doc_id,
                              "dist_km": round(dist, 6)}))
        return 0
    if args.graph_from:
        ids_ = eng.graph_search(
            args.q, args.graph_from, to_field=args.graph_to,
            max_depth=args.graph_depth,
            return_root=not args.graph_no_root,
            conjunctive=not args.use_or, min_match=args.min_match,
        )
        for doc_id in ids_:
            print(json.dumps({"doc_id": doc_id}))
        return 0
    if args.bf or args.boost:
        spec = args.bf or args.boost
        multiplicative = bool(args.boost)
        if "(" in spec:
            # full value-source expression (Solr bf=recip(...,1,1,1))
            hits = eng.function_query_search(
                args.q, spec, k=args.k,
                conjunctive=not args.use_or, min_match=args.min_match,
                multiplicative=multiplicative,
            )
        else:
            field, _, w = spec.partition("^")
            hits = eng.boosted_search(
                args.q, field, k=args.k, weight=float(w) if w else 1.0,
                conjunctive=not args.use_or, min_match=args.min_match,
                multiplicative=multiplicative,
            )
        for rank, (doc_id, score) in enumerate(hits, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.group:
        for rank, (value, best, n, docs) in enumerate(
            eng.grouped_search(args.q, args.group, k=args.k,
                               group_limit=args.group_limit,
                               conjunctive=not args.use_or), 1
        ):
            print(json.dumps({
                "rank": rank, "value": value, "best": round(best, 6),
                "n": n,
                "docs": [{"doc_id": d, "score": round(s, 6)}
                         for d, s in docs],
            }))
        return 0
    if args.sort:
        for rank, (doc_id, value) in enumerate(
            eng.search_sorted(args.q, args.sort, k=args.k,
                              ascending=not args.desc,
                              conjunctive=not args.use_or), 1
        ):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "value": value}))
        return 0
    if args.sort_multi:
        specs = []
        for spec in args.sort_multi.split(","):
            field, _, direction = spec.partition(":")
            specs.append((field, direction.lower() != "desc"))
        for rank, (doc_id, values) in enumerate(
            eng.search_sorted_multi(args.q, specs, k=args.k,
                                    conjunctive=not args.use_or), 1
        ):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "values": values}))
        return 0
    if args.rerank:
        for rank, (doc_id, score) in enumerate(
            eng.rerank_search(args.q, args.rerank, k=args.k,
                              rerank_docs=args.rerank_docs,
                              weight=args.rerank_weight,
                              conjunctive=not args.use_or), 1
        ):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return 0
    if args.qf:
        def _boosts(specs):
            out = {}
            for spec in specs:
                field, _, w = spec.partition("^")
                out[field] = float(w) if w else 1.0
            return out

        hits = eng.dismax_search(args.q, _boosts(args.qf), k=args.k,
                                 tie=args.tie, min_match=args.min_match,
                                 pf=_boosts(args.pf) if args.pf else None,
                                 pf2=_boosts(args.pf2) if args.pf2 else None,
                                 pf3=_boosts(args.pf3) if args.pf3 else None,
                                 ps=args.ps or 0, ps2=args.ps2,
                                 ps3=args.ps3)
    elif args.phrase:
        hits = eng.phrase_search(args.q, k=args.k,
                                 distributed=args.distributed,
                                 slop=args.slop)
    elif args.expr:
        hits = eng.search_expr(args.q, k=args.k)
    elif args.prefix:
        hits = eng.prefix_search(args.q, k=args.k)
    elif args.phonetic:
        hits = eng.phonetic_search(args.q, k=args.k)
    elif args.span_first is not None:
        hits = eng.span_first_search(args.q, end=args.span_first, k=args.k)
    elif args.prf:
        hits = eng.prf_search(args.q, k=args.k, fb_docs=args.fb_docs,
                              fb_terms=args.fb_terms,
                              expand_boost=args.expand_boost)
    elif args.span_not is not None:
        if args.span_near:
            raise SystemExit("--span-not and --span-near are distinct "
                             "queries; pass exactly one")
        if args.unordered:
            raise SystemExit("--span-not is ordered-only (SpanNot over "
                             "an ordered include span); --unordered "
                             "does not apply")
        hits = eng.span_not_search(
            args.q, args.span_not, slop=args.span_slop, k=args.k,
            pre=args.span_pre, post=args.span_post)
    elif args.span_near:
        hits = eng.span_near_search(args.q, slop=args.span_slop,
                                    k=args.k,
                                    in_order=not args.unordered)
    elif args.wildcard:
        hits = eng.wildcard_search(args.q, k=args.k)
    elif args.fuzzy is not None:
        hits = eng.fuzzy_search(args.q, k=args.k, max_edits=args.fuzzy,
                                blend=args.blend)
    else:
        fq = None
        if args.fq:
            fq = {}
            for spec in args.fq:
                field, _, val = spec.partition("=")
                fq[field] = val
        hits = eng.search(
            args.q, k=args.k, conjunctive=not args.use_or, mode=args.mode,
            exclude=args.exclude, min_match=args.min_match, fq=fq,
            start=args.start,
        )
    if args.snippets:
        # window the hits we JUST computed (phrase/--or/--mode respected),
        # never a re-search with default semantics (ADVICE r2)
        if (args.hl_count > 1 or args.hl_pre is not None
                or args.hl_post is not None):
            for rank, (doc_id, score, frags) in enumerate(
                eng.highlight(args.q, k=args.k, hits=hits,
                              n_snippets=args.hl_count,
                              pre_tag=args.hl_pre, post_tag=args.hl_post), 1
            ):
                print(json.dumps({"rank": rank, "doc_id": doc_id,
                                  "score": round(score, 6),
                                  "snippets": frags}))
            return 0
        for rank, (doc_id, score, snip) in enumerate(
            eng.snippets(args.q, k=args.k, hits=hits), 1
        ):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6), "snippet": snip}))
        return 0
    for rank, (doc_id, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc_id, "score": round(score, 6)}))
    return 0


def cmd_list(args) -> int:
    eng = _engine(args)
    for r in eng.list_indexed().collect():
        print(r["doc_id"])
    return 0


def cmd_show(args) -> int:
    eng = _engine(args)
    print(json.dumps(eng.show(args.doc_id), default=str))
    return 0


def cmd_mlt(args) -> int:
    eng = _engine(args)
    if args.interesting_terms:
        print(json.dumps([
            {"term": t, "boost": round(b, 6)}
            for t, b in eng.interesting_terms(
                args.doc_id, max_query_terms=args.max_terms,
                min_term_freq=args.min_tf, min_doc_freq=args.min_df)
        ]))
        return 0
    for rank, (doc_id, score) in enumerate(
        eng.more_like_this(args.doc_id, k=args.k,
                           max_query_terms=args.max_terms,
                           min_term_freq=args.min_tf,
                           min_doc_freq=args.min_df), 1
    ):
        print(json.dumps({"rank": rank, "doc_id": doc_id,
                          "score": round(score, 6)}))
    return 0


def cmd_stats(args) -> int:
    eng = _engine(args)
    if args.facet:
        out = eng.field_stats_by(args.q, args.field, args.facet,
                                 k=args.k, conjunctive=not args.use_or)
        print(json.dumps(
            [{"value": v, **st} for v, st in out], default=str))
        return 0
    st = eng.field_stats(args.q, args.field, conjunctive=not args.use_or,
                         percentiles=args.percentiles)
    if "percentiles" in st:
        st = {**st, "percentiles": {str(p): v for p, v
                                    in st["percentiles"].items()}}
    print(json.dumps(st, default=str))
    return 0


def cmd_suggest(args) -> int:
    eng = _engine(args)
    for term, sugg in eng.suggest(args.q, max_suggestions=args.k,
                                  max_edits=args.max_edits).items():
        print(json.dumps({"term": term,
                          "suggestions": [{"term": s, "df": d}
                                          for s, d in sugg]}))
    if args.collate:
        print(json.dumps(
            {"collation": eng.collate(args.q, max_edits=args.max_edits)}
        ))
    return 0


def cmd_stream(args) -> int:
    eng = _engine(args)
    for row in eng.stream(args.expr, max_rows=args.max_rows):
        print(json.dumps(row))
    return 0


def cmd_delete(args) -> int:
    eng = _engine(args)
    eng.delete(args.doc_ids)
    print(json.dumps({"deleted": args.doc_ids}))
    return 0


def cmd_terms(args) -> int:
    eng = _engine(args)
    rows = eng.terms(prefix=args.prefix, limit=args.k,
                     min_df=args.min_df, regex=args.regex,
                     sort=args.sort)
    print(json.dumps([{"term": t, "df": d} for t, d in rows]))
    return 0


def cmd_join(args) -> int:
    eng = _engine(args)
    for d in eng.join_search(args.q, args.from_field, args.to_field,
                             k=args.k, conjunctive=not args.use_or):
        print(d)
    return 0


def cmd_termvectors(args) -> int:
    eng = _engine(args)
    print(json.dumps([
        {"term": t, "tf": tf, "positions": pos}
        for t, tf, pos in eng.term_vectors(args.doc_id)
    ]))
    return 0


def cmd_snapshot(args) -> int:
    eng = _engine(args)
    print(json.dumps(eng.snapshot(args.dest)))
    return 0


def cmd_indexstats(args) -> int:
    eng = _engine(args)
    print(json.dumps(eng.index_stats()))
    return 0


def cmd_explain(args) -> int:
    eng = _engine(args)
    print(json.dumps(eng.explain(
        args.q, args.doc_id, conjunctive=not args.use_or
    )))
    return 0


def cmd_update(args) -> int:
    eng = _engine(args)
    changes = {int(k): v for k, v in json.loads(args.changes).items()}
    eng.update_metadata(changes)
    print(json.dumps({"updated": sorted(changes)}))
    return 0


def cmd_facets(args) -> int:
    eng = _engine(args)
    if args.json_spec is not None:
        spec = json.loads(args.json_spec)
        print(json.dumps(eng.json_facets(
            args.q, spec, conjunctive=not args.use_or)))
        return 0
    if args.range is not None:
        field, lo, hi, gap = args.range
        out = eng.range_facets(args.q, field, float(lo), float(hi),
                               float(gap), conjunctive=not args.use_or)
        print(json.dumps({
            "buckets": [{"lo": lo_, "count": c}
                        for lo_, c in out["buckets"]],
            "before": out["before"], "after": out["after"],
        }))
        return 0
    if args.fquery:
        fq = {}
        for spec in args.fquery:
            label, _, q = spec.partition("=")
            fq[label] = q
        print(json.dumps(eng.query_facets(
            args.q, fq, conjunctive=not args.use_or)))
        return 0
    if args.interval:
        field, *sets = args.interval
        out = eng.interval_facets(args.q, field, sets,
                                  conjunctive=not args.use_or)
        print(json.dumps([{"interval": s, "count": c} for s, c in out]))
        return 0
    if not args.fields:
        print("facets: --fields is required unless --range/--fquery "
              "is given", file=sys.stderr)
        return 2
    if args.pivot:
        def as_json(node):
            return [{"value": v, "count": n, "pivot": as_json(kids)}
                    for v, n, kids in node]
        print(json.dumps(as_json(eng.pivot_facets(
            args.q, args.fields, k_per_level=args.k,
            conjunctive=not args.use_or))))
        return 0
    out = eng.facets(
        args.q, args.fields, k_facet=args.k,
        conjunctive=not args.use_or,
        prefix=args.prefix, mincount=args.mincount,
        missing=args.missing, sort=args.sort,
    )
    print(json.dumps(
        {f: [{"value": v, "count": c} for v, c in vs]
         for f, vs in out.items()}
    ))
    return 0


def cmd_sigterms(args) -> int:
    eng = _engine(args)
    for term, fg, bg, score in eng.significant_terms(
        args.q, k=args.k, min_fg=args.min_fg,
        conjunctive=not args.use_or,
    ):
        print(json.dumps({"term": term, "fg": fg, "bg": bg,
                          "score": round(score, 6)}))
    return 0


def cmd_init(args) -> int:
    eng = _engine(args)
    eng._write_meta()
    print(json.dumps({"initialized": args.index, "n_buckets": eng.n_buckets}))
    return 0


# training-data pipeline ops exposed on the CLI. Each is the library
# operator verbatim — the CLI only reads parquet in, writes parquet
# out, and prints a one-line JSON summary, so the same command scales
# from a laptop table to a cluster run unchanged.
_PIPELINE_OPS = (
    "exact-dedup", "neardup-clusters", "semdedup", "tfidf", "chunk",
    "boilerplate", "dup-spans", "quality", "langid", "token-estimates",
    "surprisal", "repetition", "pii-scrub", "split", "decontaminate",
    "tfidf-neighbors", "nb-train", "nb-classify",
    "srp", "srp-bits", "pq-encode", "srp-neardup",
    "winnow", "fp-candidates", "bigram-ppl", "group-quota", "curate",
    "pmi", "dsir-weights", "dsir-select", "rrf-fuse",
    "passage", "cms-build", "cms-query",
    "hll", "bloom-build", "bloom-query", "temperature-mix",
)


def _pipeline_apply(df, a):
    from ckanext_extractor_spark.functions import (
        chunking,
        decontam,
        dedup,
        pii,
        sampling,
        similarity,
        textstats,
        vectorize,
    )

    op = a.op
    if op in ("srp", "srp-bits", "pq-encode", "srp-neardup"):
        # embeddings-shaped (same contract as semdedup)
        if a.text_col is not None:
            raise SystemExit(f"{op} is embeddings-shaped; use "
                             "--id-col/--vec-col, not --text-col")
        from ckanext_extractor_spark.functions import projection
        vid = a.id_col or "vec_id"
        if op == "srp":
            return projection.srp_project(df, out_dim=a.out_dim,
                                          id_col=vid, vec_col=a.vec_col)
        if op == "srp-bits":
            return projection.srp_bits(df, n_bits=a.out_dim,
                                       id_col=vid, vec_col=a.vec_col)
        if op == "srp-neardup":
            return projection.srp_neardup_pairs(
                df, n_bits=a.out_dim, n_bands=a.n_bands,
                max_hamming=a.max_hamming, id_col=vid,
                vec_col=a.vec_col)
        books = projection.pq_codebooks(
            df, m=a.m, n_codes=a.n_codes, rounds=a.kmeans_rounds,
            sample_frac=a.sample_frac, id_col=vid, vec_col=a.vec_col)
        enc = (projection.pq_encode_packed if a.packed
               else projection.pq_encode)
        return enc(df, books, id_col=vid, vec_col=a.vec_col)
    if op == "semdedup":
        # embeddings-shaped: there is no text column to name (ADVICE r4
        # #1 — the flag used to be silently dropped; now it's an error)
        if a.text_col is not None:
            raise SystemExit("semdedup is embeddings-shaped; use "
                             "--id-col/--vec-col, not --text-col")
        thr = 0.9 if a.threshold is None else a.threshold
        cents = None
        if a.kmeans_rounds:
            cents = similarity.kmeans_centroids(
                df, n_clusters=a.n_clusters, rounds=a.kmeans_rounds,
                sample_frac=a.sample_frac,
                id_col=a.id_col or "vec_id", vec_col=a.vec_col)
        return similarity.semantic_dedup(
            df, n_clusters=a.n_clusters, threshold=thr,
            id_col=a.id_col or "vec_id", vec_col=a.vec_col,
            centroids=cents)
    t, i = a.text_col or "text", a.id_col or "doc_id"
    if op == "exact-dedup":
        return dedup.exact_duplicates(df, text_col=t, id_col=i)
    if op == "neardup-clusters":
        thr = 0.5 if a.threshold is None else a.threshold
        return dedup.neardup_clusters(df, text_col=t, id_col=i,
                                      threshold=thr,
                                      include_singletons=True)
    if op == "tfidf":
        return vectorize.hashed_tfidf(df, dim=a.dim, text_col=t, id_col=i)
    if op == "tfidf-neighbors":
        return vectorize.tfidf_neighbors_topk(
            df, k=a.k, dim=a.dim, max_bucket_df=a.max_bucket_df,
            min_cosine=a.min_cosine, text_col=t, id_col=i)
    if op == "nb-train":
        from ckanext_extractor_spark.functions import classify
        return classify.nb_train(df, label_col=a.label_col, text_col=t,
                                 id_col=i, dim=a.dim, alpha=a.alpha)
    if op == "nb-classify":
        from ckanext_extractor_spark.functions import classify
        if not a.model:
            raise SystemExit("nb-classify needs --model MODEL_PARQUET "
                             "(an nb-train output)")
        model = df.sparkSession.read.parquet(a.model)
        # the model records its hashing dim (bucket=-3); trust it over
        # the flag so train/classify can never silently disagree
        drow = model.where("bucket = -3").limit(1).collect()
        mdim = int(drow[0]["log_prob"]) if drow else a.dim
        return classify.nb_classify(df, model, text_col=t, id_col=i,
                                    dim=mdim)
    if op == "chunk":
        return chunking.chunk_documents(df, size=a.size or 512,
                                        overlap=a.overlap,
                                        text_col=t, id_col=i)
    if op == "boilerplate":
        return chunking.remove_repeated_segments(
            df, size=a.size or 16, min_docs=a.min_docs,
            text_col=t, id_col=i)
    if op == "dup-spans":
        return chunking.duplicate_spans(df, size=a.size or 16,
                                        min_docs=a.min_docs,
                                        text_col=t, id_col=i)
    if op == "quality":
        return textstats.quality_score(df, text_col=t, id_col=i)
    if op == "langid":
        return textstats.language_id(df, text_col=t, id_col=i)
    if op == "token-estimates":
        return textstats.token_count_estimates(df, text_col=t, id_col=i)
    if op == "surprisal":
        return textstats.unigram_surprisal(df, text_col=t, id_col=i)
    if op == "repetition":
        return textstats.repetition_stats(df, text_col=t, id_col=i)
    if op == "pii-scrub":
        return pii.pii_scrub(df, text_col=t)
    if op == "split":
        return sampling.hash_split(df, test_frac=a.test_frac,
                                   salt=a.salt, id_col=i)
    if op == "decontaminate":
        bench = df.sparkSession.read.parquet(a.bench)
        return decontam.decontaminate(df, bench, n=a.ngram,
                                      text_col=t, id_col=i)
    if op == "winnow":
        from ckanext_extractor_spark.functions import fingerprint
        return fingerprint.winnow_fingerprints(
            df, k=a.gram_k, w=a.window_w, text_col=t, id_col=i)
    if op == "bigram-ppl":
        return textstats.bigram_perplexity(df, lam=a.lam,
                                           text_col=t, id_col=i)
    if op == "group-quota":
        if not a.group_col:
            raise SystemExit("group-quota needs --group-col COLUMN")
        return sampling.group_quota(df, a.group_col,
                                    a.n_per_group, salt=a.salt,
                                    id_col=i)
    if op == "temperature-mix":
        if not a.group_col:
            raise SystemExit("temperature-mix needs --group-col COLUMN")
        return sampling.temperature_mix(
            df, a.group_col, alpha=a.mix_alpha, total=a.total,
            salt=a.salt, id_col=i)
    if op == "curate":
        from ckanext_extractor_spark.functions import curate
        return curate.curate_corpus(
            df, text_col=t, id_col=i,
            group_col=a.group_col or "source",
            min_tokens=a.min_tokens, max_tokens=a.max_tokens,
            min_alpha_ratio=a.min_alpha,
            min_distinct_ratio=a.min_distinct,
            quota_per_group=a.quota, test_frac=a.test_frac,
            salt=a.salt)
    if op == "fp-candidates":
        from ckanext_extractor_spark.functions import fingerprint
        fps = fingerprint.winnow_fingerprints(
            df, k=a.gram_k, w=a.window_w, text_col=t, id_col=i)
        return fingerprint.fingerprint_candidates(
            fps, min_shared=a.min_shared, max_df=a.max_df, id_col=i)
    if op == "pmi":
        from ckanext_extractor_spark.functions import cooccur
        return cooccur.pmi_pairs(
            df, min_df=a.min_df, max_df=a.max_df,
            min_pair_count=a.min_shared, topk=a.topk,
            text_col=t, id_col=i)
    if op in ("dsir-weights", "dsir-select"):
        from ckanext_extractor_spark.functions import dsir
        if a.target:
            tgt = df.sparkSession.read.parquet(a.target)
        elif a.target_where:
            tgt = df.where(a.target_where)
        else:
            raise SystemExit(f"{op} needs --target TARGET_PARQUET or "
                             "--target-where SQL_PREDICATE")
        if op == "dsir-weights":
            return dsir.dsir_weights(df, tgt, dim=a.dim,
                                     text_col=t, id_col=i)
        return dsir.dsir_resample(
            df, tgt, n=a.n_select, dim=a.dim,
            gumbel_scale=a.gumbel_scale, salt=a.salt,
            text_col=t, id_col=i)
    if op == "passage":
        from ckanext_extractor_spark.functions import passage
        if not a.terms:
            raise SystemExit("passage needs --terms T1,T2,...")
        return passage.passage_topk(
            df, a.terms.split(","), size=a.size or 64,
            overlap=a.overlap, k=a.k, per_doc=a.per_doc,
            text_col=t, id_col=i)
    if op == "cms-build":
        from ckanext_extractor_spark.functions import sketch
        return sketch.cms_build(df, width=a.width, depth=a.depth,
                                text_col=t)
    if op == "cms-query":
        from ckanext_extractor_spark.functions import sketch
        if not a.terms:
            raise SystemExit("cms-query needs --terms T1,T2,... "
                             "(--in is the cms-build sketch parquet)")
        return sketch.cms_query(df, a.terms.split(","),
                                width=a.width, depth=a.depth)
    if op == "hll":
        from ckanext_extractor_spark.functions import sketch
        return sketch.hll_estimate(
            sketch.hll_registers(df, p=a.hll_p, text_col=t), p=a.hll_p)
    if op == "bloom-build":
        from ckanext_extractor_spark.functions import sketch
        return sketch.bloom_build(df, m_bits=a.m_bits,
                                  k_hashes=a.k_hashes, text_col=t)
    if op == "bloom-query":
        from ckanext_extractor_spark.functions import sketch
        if not a.terms:
            raise SystemExit("bloom-query needs --terms T1,T2,... "
                             "(--in is the bloom-build bit parquet)")
        return sketch.bloom_query(df, a.terms.split(","),
                                  m_bits=a.m_bits, k_hashes=a.k_hashes)
    if op == "rrf-fuse":
        from ckanext_extractor_spark.functions import hybrid
        if a.text_col is not None:
            raise SystemExit("rrf-fuse inputs are ranked (id, score) "
                             "lists; --text-col does not apply")
        if not a.second:
            raise SystemExit("rrf-fuse needs --second RANKED_PARQUET "
                             "(the other ranked list)")
        second = df.sparkSession.read.parquet(a.second)
        return hybrid.hybrid_topk(
            df, second, topk=a.topk, k=a.rrf_k,
            dense_weight=a.dense_weight, id_col=i,
            score_col=a.score_col)
    raise SystemExit(f"unknown pipeline op {op!r}")


def cmd_pipeline(args) -> int:
    spark = get_spark("ckanext-extractor-spark-cli")
    df = spark.read.parquet(args.inp)
    if args.op == "decontaminate" and not args.bench:
        raise SystemExit("decontaminate needs --bench BENCH_PARQUET")
    out_df = _pipeline_apply(df, args)
    n_in = df.count()
    if args.out:
        out_df.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
    else:
        n_out = out_df.count()
    print(json.dumps({
        "op": args.op, "rows_in": n_in, "rows_out": n_out,
        "out": args.out, "columns": out_df.columns,
    }))
    return 0


def cmd_lineage(args) -> int:
    eng = _engine(args)
    for r in eng.lineage().orderBy("build_id", "partition_id").collect():
        print(json.dumps(r.asDict(), default=str))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ckanext-extractor-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="incremental index build")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--format", default="auto", choices=["auto", "iceberg", "parquet"])
    b.add_argument("--force", action="store_true")
    b.add_argument("--build-id", default=None)
    b.add_argument("--langs", nargs="*", default=None)
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--store-content", dest="store_content",
                   action="store_true",
                   help="keep a doc_store table (fulltext per doc) — "
                        "required by query --snippets / --prf and "
                        "mlt/more-like-this")
    b.add_argument("--store-offsets", dest="store_offsets",
                   action="store_true",
                   help="store character offsets alongside positions "
                        "(exact highlight windows)")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", default="auto",
                   choices=["auto", "maxscore", "wand", "slow"])
    q.add_argument("--or", dest="use_or", action="store_true",
                   help="disjunctive instead of default AND")
    q.add_argument("--exclude", default=None,
                   help="negative terms (Solr -term analog): drop docs "
                        "containing ANY of these analyzed terms")
    q.add_argument("--min-match", dest="min_match", type=int, default=None,
                   help="with --or: keep docs matching at least this many "
                        "distinct query terms (Solr mm)")
    q.add_argument("--prefix", action="store_true",
                   help="treat --q as a term prefix (PrefixQuery, "
                        "scoring-boolean rewrite over index terms)")
    q.add_argument("--span-first", dest="span_first", type=int,
                   default=None, metavar="END",
                   help="SpanFirstQuery: single-term match whose first "
                        "occurrence is at analyzer position < END")
    q.add_argument("--phonetic", action="store_true",
                   help="match terms that SOUND like --q (classic "
                        "Soundex, Solr PhoneticFilter analog)")
    q.add_argument("--prf", action="store_true",
                   help="pseudo-relevance feedback: expand --q with the "
                        "most interesting terms of its own top hits "
                        "(Rocchio blind feedback; needs an index built "
                        "with --store-content)")
    q.add_argument("--fb-docs", dest="fb_docs", type=int, default=5,
                   help="--prf: feedback depth (top docs mined)")
    q.add_argument("--fb-terms", dest="fb_terms", type=int, default=10,
                   help="--prf: expansion terms added")
    q.add_argument("--expand-boost", dest="expand_boost", type=float,
                   default=0.5,
                   help="--prf: weight on expansion-term BM25 "
                        "(Rocchio beta)")
    q.add_argument("--span-near", dest="span_near", action="store_true",
                   help="SpanNearQuery over --q's terms with total gap "
                        "budget --span-slop (ordered unless "
                        "--unordered)")
    q.add_argument("--span-not", dest="span_not", default=None,
                   metavar="EXCLUDE",
                   help="SpanNotQuery: --q's ordered span (budget "
                        "--span-slop) with no EXCLUDE term within "
                        "[--span-pre, --span-post] of the span window")
    q.add_argument("--span-slop", dest="span_slop", type=int, default=0,
                   help="total gap budget for --span-near/--span-not")
    q.add_argument("--unordered", action="store_true",
                   help="with --span-near: any term order "
                        "(in_order=false)")
    q.add_argument("--span-pre", dest="span_pre", type=int, default=0,
                   help="--span-not: kill zone tokens before the span")
    q.add_argument("--span-post", dest="span_post", type=int, default=0,
                   help="--span-not: kill zone tokens after the span")
    q.add_argument("--start", type=int, default=0,
                   help="skip the first N ranked hits (Solr start/rows "
                        "pagination)")
    q.add_argument("--group", default=None, metavar="FIELD",
                   help="collapse results by a metadata field (Solr "
                        "group.field): top groups by best-doc score")
    q.add_argument("--group-limit", dest="group_limit", type=int, default=1,
                   help="docs shown per group (Solr group.limit)")
    q.add_argument("--sort", default=None, metavar="FIELD",
                   help="order matches by a metadata field value instead "
                        "of score (Solr sort=field)")
    q.add_argument("--desc", action="store_true",
                   help="with --sort: descending order")
    q.add_argument("--sort-multi", dest="sort_multi", default=None,
                   metavar="F1[:desc][,F2[:desc]...]",
                   help="order matches by several metadata fields "
                        "(Solr sort=f1 asc, f2 desc)")
    q.add_argument("--rerank", default=None, metavar="QUERY",
                   help="rescore the top window with a second query "
                        "(Solr ReRankQParser rq)")
    q.add_argument("--rerank-docs", dest="rerank_docs", type=int,
                   default=200,
                   help="first-pass window size reranking touches "
                        "(reRankDocs, default 200)")
    q.add_argument("--rerank-weight", dest="rerank_weight", type=float,
                   default=2.0,
                   help="weight of the rerank query's score "
                        "(reRankWeight, default 2.0)")
    q.add_argument("--expr", action="store_true",
                   help="treat --q as a boolean query-language expression "
                        "(AND/OR/NOT, parentheses, -term, term^boost)")
    q.add_argument("--wildcard", action="store_true",
                   help="treat --q as a */? glob over index terms "
                        "(WildcardQuery)")
    q.add_argument("--fuzzy", type=int, default=None, metavar="N",
                   help="treat --q as a fuzzy term with edit distance "
                        "<= N (FuzzyQuery term~N)")
    q.add_argument("--blend", choices=("idf", "lucene"), default="idf",
                   help="fuzzy scoring: per-expansion idf (pinned "
                        "default) or Lucene's distance-blended boost "
                        "1-edit/min(|q|,|t|)")
    q.add_argument("--qf", action="append", default=None,
                   metavar="FIELD[^BOOST]",
                   help="score over metadata fields with dismax (Solr qf; "
                        "repeatable, e.g. --qf title^4 --qf tags)")
    q.add_argument("--pf", action="append", default=None,
                   metavar="FIELD[^BOOST]",
                   help="phrase-field boost: whole query as an adjacent "
                        "phrase in FIELD adds phrase BM25 (edismax pf; "
                        "repeatable; requires --qf)")
    q.add_argument("--pf2", action="append", default=None,
                   metavar="FIELD[^BOOST]",
                   help="bigram phrase-field boost: every adjacent query "
                        "token pair as its own phrase clause (edismax "
                        "pf2; repeatable; requires --qf)")
    q.add_argument("--pf3", action="append", default=None,
                   metavar="FIELD[^BOOST]",
                   help="trigram phrase-field boost (edismax pf3; "
                        "repeatable; requires --qf)")
    q.add_argument("--ps", type=int, default=0,
                   help="phrase slop on --pf clauses (edismax ps; "
                        "anchor-window sloppy tf, 0 = exact)")
    q.add_argument("--ps2", type=int, default=None,
                   help="phrase slop on --pf2 clauses (defaults to --ps)")
    q.add_argument("--ps3", type=int, default=None,
                   help="phrase slop on --pf3 clauses (defaults to --ps)")
    q.add_argument("--tie", type=float, default=0.0,
                   help="dismax tie breaker in [0,1] (default 0)")
    q.add_argument("--fq", action="append", default=None,
                   metavar="FIELD=QUERY",
                   help="filter query on a metadata field (Solr fq; "
                        "repeatable, fields AND together; never changes "
                        "scores)")
    q.add_argument("--phrase", action="store_true",
                   help="consecutive-phrase match (positions-aware)")
    q.add_argument("--slop", type=int, default=0,
                   help="with --phrase: ordered per-gap proximity window "
                        "(n non-query tokens allowed between adjacent "
                        "query terms; 0 = strict phrase)")
    q.add_argument("--distributed", action="store_true",
                   help="cluster-scale phrase plan (no driver collect)")
    q.add_argument("--collapse", default=None, metavar="FIELD",
                   help="field collapsing (Solr {!collapse field=...})")
    q.add_argument("--expand", type=int, default=0,
                   help="with --collapse: expand.rows per group")
    q.add_argument("--elevate", default=None, metavar="ID,ID",
                   help="query elevation: pinned doc ids, in order")
    q.add_argument("--elevate-exclude", dest="elevate_exclude",
                   default=None, metavar="ID,ID",
                   help="query elevation: excluded doc ids")
    q.add_argument("--parent-of", dest="parent_of", default=None,
                   metavar="FIELD",
                   help="block join {!parent}: --q matches CHILDREN; "
                        "return their parents (child metadata FIELD = "
                        "parent path)")
    q.add_argument("--child-of", dest="child_of", default=None,
                   metavar="FIELD",
                   help="block join {!child}: --q matches PARENTS; "
                        "return their children with the parent's score")
    q.add_argument("--score-mode", dest="score_mode", default="max",
                   choices=["max", "total", "avg", "min", "none"],
                   help="block-join ScoreMode for --parent-of")
    q.add_argument("--geo-field", dest="geo_field", default=None,
                   metavar="FIELD",
                   help="spatial filter ({!geofilt}): metadata FIELD "
                        "holds 'lat,lon' points")
    q.add_argument("--geo-pt", dest="geo_pt", default=None,
                   metavar="LAT,LON",
                   help="center point for --geo-field (Solr pt=)")
    q.add_argument("--geo-d", dest="geo_d", type=float, default=None,
                   help="radius km for --geo-field (Solr d=); results "
                        "sort by geodist asc")
    q.add_argument("--graph-from", dest="graph_from", default=None,
                   metavar="FIELD",
                   help="graph traversal ({!graph}): follow edges from "
                        "metadata FIELD values to --graph-to node keys, "
                        "starting at the --q match set")
    q.add_argument("--graph-to", dest="graph_to", default="path",
                   metavar="FIELD",
                   help="node key for --graph-from: 'path' (default) or "
                        "a metadata field (Solr to=)")
    q.add_argument("--graph-depth", dest="graph_depth", type=int,
                   default=-1,
                   help="maxDepth for --graph-from (-1 = fixpoint)")
    q.add_argument("--graph-no-root", dest="graph_no_root",
                   action="store_true",
                   help="returnRoot=false: drop roots unless re-reached "
                        "through an edge")
    q.add_argument("--bq", default=None, metavar="QUERY",
                   help="edismax bq: additive boost query")
    q.add_argument("--bq-weight", dest="bq_weight", type=float,
                   default=1.0, help="weight for --bq")
    q.add_argument("--bf", default=None, metavar="FIELD^W|EXPR",
                   help="edismax bf: additive function boost — a field "
                        "(FIELD^W) or a full value-source expression "
                        "(sum/product/div/recip/if/exists/... over "
                        "fields, e.g. recip(n-chars,1,1000,1000))")
    q.add_argument("--boost", default=None, metavar="FIELD^W|EXPR",
                   help="edismax boost: multiplicative function boost "
                        "(field or value-source expression)")
    q.add_argument("--snippets", action="store_true",
                   help="include highlight windows (store_content index)")
    q.add_argument("--hl-count", dest="hl_count", type=int, default=1,
                   help="fragments per hit (Solr hl.snippets; >1 emits "
                        "a 'snippets' list per hit)")
    q.add_argument("--hl-pre", dest="hl_pre", default=None,
                   help="match-word open tag (Solr hl.simple.pre)")
    q.add_argument("--hl-post", dest="hl_post", default=None,
                   help="match-word close tag (Solr hl.simple.post)")
    q.add_argument("--buckets", type=int, default=64)
    q.set_defaults(fn=cmd_query)

    l = sub.add_parser("list", help="ids with completed metadata")
    l.add_argument("--index", required=True)
    l.set_defaults(fn=cmd_list)

    s = sub.add_parser("show", help="doc stats + provenance")
    s.add_argument("--index", required=True)
    s.add_argument("doc_id", type=int)
    s.set_defaults(fn=cmd_show)

    m = sub.add_parser(
        "mlt", help="find docs similar to a seed doc (Lucene MoreLikeThis)"
    )
    m.add_argument("--index", required=True)
    m.add_argument("doc_id", type=int)
    m.add_argument("--k", type=int, default=10)
    m.add_argument("--max-terms", dest="max_terms", type=int, default=25)
    m.add_argument("--min-tf", dest="min_tf", type=int, default=1)
    m.add_argument("--min-df", dest="min_df", type=int, default=2)
    m.add_argument("--interesting-terms", dest="interesting_terms",
                   action="store_true",
                   help="print the MLT term selection with boosts "
                        "(Solr mlt.interestingTerms=details) instead "
                        "of running the query")
    m.add_argument("--buckets", type=int, default=64)
    m.set_defaults(fn=cmd_mlt)

    sx = sub.add_parser(
        "stats", help="field stats over matching docs (Solr stats.field)"
    )
    sx.add_argument("--index", required=True)
    sx.add_argument("--q", required=True)
    sx.add_argument("--field", required=True)
    sx.add_argument("--facet", default=None, metavar="FIELD",
                    help="break stats down per facet value "
                         "(Solr stats.facet)")
    sx.add_argument("-k", type=int, default=10,
                    help="with --facet: top buckets by doc count")
    sx.add_argument("--percentiles", type=float, nargs="+", default=None,
                    metavar="P",
                    help="exact quantiles as fractions in (0, 1] "
                         "(Solr stats percentiles takes percent)")
    sx.add_argument("--or", dest="use_or", action="store_true")
    sx.add_argument("--buckets", type=int, default=64)
    sx.set_defaults(fn=cmd_stats)

    sg = sub.add_parser(
        "suggest", help="spellcheck suggestions from the index dictionary"
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("--q", required=True)
    sg.add_argument("--k", type=int, default=5)
    sg.add_argument("--max-edits", dest="max_edits", type=int, default=2)
    sg.add_argument("--collate", action="store_true",
                    help="also print the corrected query "
                         "(Solr spellcheck.collate)")
    sg.add_argument("--buckets", type=int, default=64)
    sg.set_defaults(fn=cmd_suggest)

    st = sub.add_parser(
        "stream",
        help="run a Solr streaming expression (/stream) compiled to "
             "one DataFrame plan",
    )
    st.add_argument("--index", required=True)
    st.add_argument("--expr", required=True,
                    help="streaming expression, e.g. 'rollup(search("
                         "idx, q=\"spark\", fl=\"doc_id,lang\"), "
                         "over=\"lang\", count(*))'")
    st.add_argument("--max-rows", dest="max_rows", type=int,
                    default=1000,
                    help="driver-side row bound for the printed tuples")
    st.set_defaults(fn=cmd_stream)

    d = sub.add_parser("delete", help="tombstone docs")
    d.add_argument("--index", required=True)
    d.add_argument("doc_ids", type=int, nargs="+")
    d.set_defaults(fn=cmd_delete)

    fc = sub.add_parser(
        "facets", help="facet counts over matching docs (Solr faceting)"
    )
    fc.add_argument("--index", required=True)
    fc.add_argument("--q", required=True)
    fc.add_argument("--fields", nargs="+", default=None,
                    help="metadata fields (doc_meta keys) to facet on")
    fc.add_argument("-k", type=int, default=10,
                    help="top values per field (count desc, value asc)")
    fc.add_argument("--pivot", action="store_true",
                    help="nested pivot counts in --fields order "
                         "(Solr facet.pivot)")
    fc.add_argument("--range", nargs=4, default=None,
                    metavar=("FIELD", "START", "END", "GAP"),
                    help="numeric range buckets over a metadata field "
                         "(Solr facet.range; zero buckets included, "
                         "before/after counts reported)")
    fc.add_argument("--json", dest="json_spec", default=None,
                    metavar="SPEC",
                    help="Solr JSON Facet API spec (json.facet): nested "
                         "terms/range/query buckets with per-bucket "
                         "statistics, e.g. '{\"langs\": {\"type\": "
                         "\"terms\", \"field\": \"lang\", \"facet\": "
                         "{\"avg\": \"avg(n-chars)\"}}}'")
    fc.add_argument("--fquery", action="append", default=None,
                    metavar="LABEL=QUERY",
                    help="count docs matching --q AND QUERY per label "
                         "(Solr facet.query; repeatable)")
    fc.add_argument("--interval", nargs="+", default=None,
                    metavar="ARG",
                    help="FIELD then interval sets in Solr syntax, e.g. "
                         "--interval n-chars '[0,100)' '[100,*]' "
                         "(Solr facet.interval; overlaps allowed)")
    fc.add_argument("--prefix", default=None,
                    help="keep only values starting with this "
                         "(Solr facet.prefix)")
    fc.add_argument("--mincount", type=int, default=1,
                    help="drop values below this count "
                         "(Solr facet.mincount)")
    fc.add_argument("--missing", action="store_true",
                    help="append a null bucket counting matching docs "
                         "without the field (Solr facet.missing)")
    fc.add_argument("--sort", choices=("count", "index"), default="count",
                    help="count desc (facet.sort=count) or value asc "
                         "(facet.sort=index)")
    fc.add_argument("--or", dest="use_or", action="store_true")
    fc.add_argument("--buckets", type=int, default=64)
    fc.set_defaults(fn=cmd_facets)

    sig = sub.add_parser(
        "sigterms",
        help="terms overrepresented in the match set vs the corpus "
             "(ES significant_terms, JLH)"
    )
    sig.add_argument("--index", required=True)
    sig.add_argument("--q", required=True)
    sig.add_argument("-k", type=int, default=10)
    sig.add_argument("--min-fg", dest="min_fg", type=int, default=2,
                     help="minimum foreground doc count (ES "
                          "min_doc_count)")
    sig.add_argument("--or", dest="use_or", action="store_true")
    sig.add_argument("--buckets", type=int, default=64)
    sig.set_defaults(fn=cmd_sigterms)

    tm = sub.add_parser(
        "terms", help="index dictionary terms with docFreq "
                      "(Solr TermsComponent)"
    )
    tm.add_argument("--index", required=True)
    tm.add_argument("--prefix", default=None,
                    help="only terms starting with this (terms.prefix)")
    tm.add_argument("-k", type=int, default=10,
                    help="max terms, ranked df desc then term asc")
    tm.add_argument("--min-df", type=int, default=1,
                    help="minimum docFreq (terms.mincount)")
    tm.add_argument("--regex", default=None,
                    help="full-match term filter (terms.regex)")
    tm.add_argument("--sort", choices=("count", "index"),
                    default="count",
                    help="count = df desc; index = term asc "
                         "(terms.sort)")
    tm.add_argument("--buckets", type=int, default=64)
    tm.set_defaults(fn=cmd_terms)

    jn = sub.add_parser(
        "join", help="cross-field semi-join query (Solr {!join})"
    )
    jn.add_argument("--index", required=True)
    jn.add_argument("--q", required=True,
                    help="subquery selecting the from-side docs")
    jn.add_argument("--from", dest="from_field", required=True)
    jn.add_argument("--to", dest="to_field", required=True)
    jn.add_argument("-k", type=int, default=10)
    jn.add_argument("--or", dest="use_or", action="store_true")
    jn.add_argument("--buckets", type=int, default=64)
    jn.set_defaults(fn=cmd_join)

    tv = sub.add_parser(
        "termvectors", help="per-doc term vector (Solr TermVectorComponent)"
    )
    tv.add_argument("--index", required=True)
    tv.add_argument("doc_id", type=int)
    tv.add_argument("--buckets", type=int, default=64)
    tv.set_defaults(fn=cmd_termvectors)

    sn = sub.add_parser(
        "snapshot", help="consistent point-in-time index backup (Solr "
                         "replication backup; restore = open the copy)"
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("dest")
    sn.add_argument("--buckets", type=int, default=64)
    sn.set_defaults(fn=cmd_snapshot)

    ix = sub.add_parser(
        "indexstats", help="index-level statistics (Solr Luke handler: "
                           "numDocs, numTerms, postings, generations)"
    )
    ix.add_argument("--index", required=True)
    ix.add_argument("--buckets", type=int, default=64)
    ix.set_defaults(fn=cmd_indexstats)

    expl = sub.add_parser(
        "explain", help="per-term BM25 score decomposition for one "
                        "(query, doc) pair (Solr debugQuery / Lucene "
                        "IndexSearcher.explain)"
    )
    expl.add_argument("--index", required=True)
    expl.add_argument("--q", required=True)
    expl.add_argument("doc_id", type=int)
    expl.add_argument("--or", dest="use_or", action="store_true",
                      help="disjunctive (default-AND otherwise)")
    expl.add_argument("--buckets", type=int, default=64)
    expl.set_defaults(fn=cmd_explain)

    up = sub.add_parser(
        "update", help="atomic metadata updates (Solr atomic update: "
                       "set / null=remove; no re-extract)"
    )
    up.add_argument("--index", required=True)
    up.add_argument("--changes", required=True,
                    help='JSON {"doc_id": {"field": "value"|null}}')
    up.add_argument("--buckets", type=int, default=64)
    up.set_defaults(fn=cmd_update)

    g = sub.add_parser("lineage", help="per-partition build metrics")
    g.add_argument("--index", required=True)
    g.set_defaults(fn=cmd_lineage)

    c = sub.add_parser(
        "compact", help="merge tombstone-heavy / excess generations"
    )
    c.add_argument("--index", required=True)
    c.add_argument("--dead-frac", type=float, default=None)
    c.add_argument("--max-gens", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    st = sub.add_parser(
        "status", help="lock holder, generation list, tombstone count"
    )
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_status)

    pl = sub.add_parser(
        "pipeline",
        help="training-data pipeline ops over a parquet table "
             "(dedup / semdedup / tfidf / chunk / boilerplate / "
             "dup-spans / quality / langid / token-estimates / "
             "surprisal / repetition / pii-scrub / split / "
             "decontaminate)",
    )
    pl.add_argument("op", choices=sorted(_PIPELINE_OPS))
    pl.add_argument("--in", dest="inp", required=True,
                    help="input parquet path (documents- or "
                         "embeddings-shaped)")
    pl.add_argument("--out", default=None,
                    help="output parquet path (omit for a summary-only "
                         "dry run)")
    pl.add_argument("--text-col", default=None,
                    help="text column (default 'text'; rejected for "
                         "embeddings-shaped ops like semdedup)")
    pl.add_argument("--id-col", default=None,
                    help="id column (default 'doc_id'; 'vec_id' for "
                         "embeddings-shaped ops like semdedup)")
    pl.add_argument("--vec-col", dest="vec_col", default="embedding",
                    help="embedding column (semdedup)")
    pl.add_argument("--threshold", type=float, default=None,
                    help="similarity threshold (neardup-clusters "
                         "jaccard / semdedup cosine)")
    pl.add_argument("--size", type=int, default=None,
                    help="token window (chunk / boilerplate / dup-spans)")
    pl.add_argument("--overlap", type=int, default=0,
                    help="chunk overlap tokens")
    pl.add_argument("--min-docs", type=int, default=2,
                    help="distinct-doc threshold (boilerplate / dup-spans)")
    pl.add_argument("--dim", type=int, default=1024,
                    help="tfidf hash buckets")
    pl.add_argument("--n-clusters", type=int, default=8,
                    help="semdedup coarse clusters")
    pl.add_argument("--kmeans-rounds", dest="kmeans_rounds", type=int,
                    default=0,
                    help="semdedup: Lloyd rounds for the sampled k-means "
                         "coarse quantizer (0 = pinned smallest-id seeds)")
    pl.add_argument("--sample-frac", dest="sample_frac", type=float,
                    default=None,
                    help="semdedup: deterministic hash-sample fraction "
                         "for the k-means sketch (default: all rows)")
    pl.add_argument("--test-frac", type=float, default=0.1,
                    help="split test fraction")
    pl.add_argument("--salt", default="", help="split hash salt")
    pl.add_argument("--bench", default=None,
                    help="benchmark parquet path (decontaminate)")
    pl.add_argument("--k", type=int, default=10,
                    help="neighbors per doc (tfidf-neighbors)")
    pl.add_argument("--max-bucket-df", dest="max_bucket_df", type=int,
                    default=None,
                    help="drop buckets hit by more docs than this before "
                         "the pair join (tfidf-neighbors scale guard)")
    pl.add_argument("--min-cosine", dest="min_cosine", type=float,
                    default=0.0,
                    help="pair score floor (tfidf-neighbors)")
    pl.add_argument("--label-col", dest="label_col", default="lang",
                    help="training label column (nb-train)")
    pl.add_argument("--alpha", type=float, default=1.0,
                    help="NB Laplace smoothing (nb-train)")
    pl.add_argument("--model", default=None,
                    help="model parquet from nb-train (nb-classify)")
    pl.add_argument("--out-dim", dest="out_dim", type=int, default=16,
                    help="projection components / sign bits (srp, "
                         "srp-bits)")
    pl.add_argument("--m", type=int, default=4,
                    help="PQ subspaces (pq-encode)")
    pl.add_argument("--n-codes", dest="n_codes", type=int, default=8,
                    help="PQ codes per subspace (pq-encode)")
    pl.add_argument("--packed", action="store_true",
                    help="pq-encode: one row per vector with an "
                         "array<int> code column (the production "
                         "layout) instead of (id, subspace, code) rows")
    pl.add_argument("--n-bands", dest="n_bands", type=int, default=2,
                    help="signature bands (srp-neardup; must divide "
                         "--out-dim)")
    pl.add_argument("--max-hamming", dest="max_hamming", type=int,
                    default=6,
                    help="hamming ceiling for a surviving pair "
                         "(srp-neardup)")
    pl.add_argument("--ngram", type=int, default=13,
                    help="decontamination n-gram length")
    pl.add_argument("--gram-k", dest="gram_k", type=int, default=5,
                    help="winnowing shingle size in tokens "
                         "(winnow / fp-candidates)")
    pl.add_argument("--window-w", dest="window_w", type=int, default=4,
                    help="winnowing window size in grams "
                         "(winnow / fp-candidates)")
    pl.add_argument("--min-shared", dest="min_shared", type=int,
                    default=2,
                    help="shared fingerprints for a candidate pair "
                         "(fp-candidates)")
    pl.add_argument("--max-df", dest="max_df", type=int, default=1000,
                    help="drop fingerprints/terms in more docs than "
                         "this before the pair join (fp-candidates / "
                         "pmi boilerplate + fan-out guard)")
    pl.add_argument("--min-df", dest="min_df", type=int, default=2,
                    help="pmi: minimum document frequency for a term "
                         "to enter the pair join")
    pl.add_argument("--topk", type=int, default=None,
                    help="result cap (pmi / rrf-fuse); omit for the "
                         "full result")
    pl.add_argument("--target", default=None,
                    help="target-domain parquet (dsir-weights / "
                         "dsir-select)")
    pl.add_argument("--target-where", dest="target_where", default=None,
                    help="SQL predicate selecting the target domain "
                         "from the input instead of --target "
                         "(e.g. \"lang = 'en'\")")
    pl.add_argument("--n-select", dest="n_select", type=int,
                    default=1000,
                    help="docs to keep (dsir-select)")
    pl.add_argument("--gumbel-scale", dest="gumbel_scale", type=float,
                    default=1.0,
                    help="dsir-select sampling temperature (0 = hard "
                         "top-weights)")
    pl.add_argument("--second", default=None,
                    help="second ranked (id, score) parquet "
                         "(rrf-fuse)")
    pl.add_argument("--rrf-k", dest="rrf_k", type=int, default=60,
                    help="RRF rank shift k (rrf-fuse)")
    pl.add_argument("--score-col", dest="score_col", default="score",
                    help="score column in the ranked inputs "
                         "(rrf-fuse)")
    pl.add_argument("--dense-weight", dest="dense_weight", type=float,
                    default=1.0,
                    help="weight on the --second list's contribution "
                         "(rrf-fuse)")
    pl.add_argument("--terms", default=None,
                    help="comma-separated query/probe terms "
                         "(passage / cms-query)")
    pl.add_argument("--per-doc", dest="per_doc", type=int, default=1,
                    help="passage: best passages kept per document")
    pl.add_argument("--width", type=int, default=1024,
                    help="count-min sketch cells per hash row "
                         "(cms-build / cms-query — must match)")
    pl.add_argument("--depth", type=int, default=4,
                    help="count-min sketch hash rows "
                         "(cms-build / cms-query — must match)")
    pl.add_argument("--hll-p", dest="hll_p", type=int, default=9,
                    help="HLL precision: 2^p registers (hll)")
    pl.add_argument("--m-bits", dest="m_bits", type=int, default=8192,
                    help="bloom filter bits (bloom-build / bloom-query "
                         "— must match)")
    pl.add_argument("--k-hashes", dest="k_hashes", type=int, default=4,
                    help="bloom hash functions (bloom-build / "
                         "bloom-query — must match)")
    pl.add_argument("--mix-alpha", dest="mix_alpha", type=float,
                    default=0.5,
                    help="temperature-mix smoothing exponent (quota "
                         "per group ∝ count^alpha; 1 = natural, "
                         "0 = uniform)")
    pl.add_argument("--total", type=int, default=10_000,
                    help="temperature-mix target sample size")
    pl.add_argument("--lam", type=float, default=0.75,
                    help="bigram-ppl interpolation weight on the "
                         "bigram term (Jelinek-Mercer lambda)")
    pl.add_argument("--group-col", dest="group_col", default=None,
                    help="grouping column for group-quota (e.g. the "
                         "host/source)")
    pl.add_argument("--n-per-group", dest="n_per_group", type=int,
                    default=1000,
                    help="max rows kept per group (group-quota)")
    pl.add_argument("--min-tokens", dest="min_tokens", type=int,
                    default=20, help="curate: token-count band low end")
    pl.add_argument("--max-tokens", dest="max_tokens", type=int,
                    default=10_000,
                    help="curate: token-count band high end")
    pl.add_argument("--min-alpha", dest="min_alpha", type=float,
                    default=0.5, help="curate: min alphabetic ratio")
    pl.add_argument("--min-distinct", dest="min_distinct", type=float,
                    default=0.3,
                    help="curate: min distinct-token ratio")
    pl.add_argument("--quota", type=int, default=None,
                    help="curate: per-group cap applied after dedup "
                         "(omit = no cap)")
    pl.set_defaults(fn=cmd_pipeline)

    i = sub.add_parser(
        "init", help="initialize an empty index root (paster init analog)"
    )
    i.add_argument("--index", required=True)
    i.add_argument("--buckets", type=int, default=64)
    i.add_argument("--langs", nargs="*", default=None)
    i.set_defaults(fn=cmd_init)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
