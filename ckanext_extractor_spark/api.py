"""ExtractorEngine — the user-facing facade (SURVEY.md §2.8).

Reference API mapping (logic/action.py, paster.py):
    extractor_extract(id, force) -> Engine.extract(corpus, force=...)
    extractor_list()             -> Engine.list_indexed()
    extractor_show(id)           -> Engine.show(doc_id)
    extractor_delete(id)         -> Engine.delete(doc_ids)
    package_search(q=...)        -> Engine.search(query, k=...)

Index layout under ``index_root`` (all plain Parquet; an Iceberg catalog
slot-in would change only the read/write format strings):
    staging/raw_postings/<build_id>/   tokenize checkpoint (resume point)
    postings/                          current postings (term,doc,tf,pos,dl)
    segments/                          encoded blobs, partitioned term_bucket
    dictionary/                        (term, df, cf, term_bucket)
    doc_stats/                         per-doc metadata + doc_len
    corpus_stats/                      singleton N/avgdl row
    doc_manifest/                      status machine state
    lineage/                           per-partition build metrics

Lifecycle hooks re-express IExtractorPostprocessor
(interfaces.py:25-82, called at tasks.py:80-81,103-104,112-113) and
IExtractorRequest.extractor_before_request (interfaces.py:85-106):
    before_tokenize(corpus_df) -> corpus_df      (~ before_request)
    after_extract(postings_df) -> postings_df    (~ after_extract)
    after_save(manifest_df)    -> manifest_df    (~ after_save)
    after_index(engine)        -> None           (~ after_index)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ckanext_extractor_spark.analysis.tokenizer import (
    INDEX_CONFIG,
    AnalyzerConfig,
    analyze_query,
)
from ckanext_extractor_spark.manifest import (
    STATUS_IGNORED,
    STATUS_NEW,
    STATUS_UPDATE,
    append_lineage,
    compute_statuses,
    read_doc_manifest,
    read_lineage,
    split_raw_postings,
    tokenize_with_lineage,
)
from ckanext_extractor_spark.operators.build import (
    build_corpus_stats,
    build_dictionary,
    build_doc_stats,
    glob_filter_expr,
    prepare_corpus,
)
from ckanext_extractor_spark.operators.query import bm25_search
from ckanext_extractor_spark.operators.segments import (
    encode_segments,
    salted_postings,
)


@dataclass
class EngineHooks:
    before_tokenize: Callable[[DataFrame], DataFrame] | None = None
    after_extract: Callable[[DataFrame], DataFrame] | None = None
    after_save: Callable[[DataFrame], DataFrame] | None = None
    after_index: Callable[["ExtractorEngine"], None] | None = None


@dataclass
class BuildReport:
    build_id: str
    status_counts: dict[str, int] = field(default_factory=dict)
    n_indexed: int = 0
    wall_sec: float = 0.0
    resumed: bool = False


class ExtractorEngine:
    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        indexed_langs: Iterable[str] = ("*",),
        analyzer: AnalyzerConfig = INDEX_CONFIG,
        n_buckets: int = 64,
        salt_threshold: int = 100_000,
        hooks: EngineHooks | None = None,
        with_positions: bool = True,
        ignore_where: str | None = None,
    ):
        """``ignore_where``: SQL predicate over corpus columns marking docs
        to skip AND purge (reference F3: private datasets skipped at
        extract, stored metadata purged on update — tasks.py:61-68,
        plugin.py:101-107). E.g. ``"private = true"``."""
        self.spark = spark
        self.root = index_root
        self.indexed_langs = tuple(indexed_langs)
        self.analyzer = analyzer
        self.n_buckets = n_buckets
        self.salt_threshold = salt_threshold
        self.hooks = hooks or EngineHooks()
        self.with_positions = with_positions
        self.ignore_where = ignore_where
        self._segments_cache: dict[str, list] | None = None
        self._decoded_cache: dict[str, object] = {}
        self._stats_cache: dict | None = None
        self._postings_rel = "postings"
        os.makedirs(index_root, exist_ok=True)
        # structural index properties are INDEX state, not caller options:
        # a query/delete with a different n_buckets than the build would
        # prune the wrong partitions. Persisted at build, loaded on open.
        meta = self._read_meta()
        if meta:
            self.n_buckets = int(meta["n_buckets"])
            self.salt_threshold = int(meta["salt_threshold"])
            self.with_positions = bool(meta["with_positions"])
            self.indexed_langs = tuple(meta["indexed_langs"])
            self._postings_rel = meta.get("postings_rel", "postings")

    def _meta_path(self) -> str:
        return os.path.join(self.root, "index_meta.json")

    def _read_meta(self) -> dict | None:
        p = self._meta_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_meta(self) -> None:
        with open(self._meta_path(), "w") as f:
            json.dump(
                {
                    "n_buckets": self.n_buckets,
                    "salt_threshold": self.salt_threshold,
                    "with_positions": self.with_positions,
                    "indexed_langs": list(self.indexed_langs),
                    "analyzer_mode": self.analyzer.mode,
                    "bm25": {"k1": 1.2, "b": 0.75},
                    "postings_rel": self._postings_rel,
                },
                f,
            )

    # -- paths ------------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    # -- build (extractor_extract analog) ---------------------------------
    def extract(
        self,
        corpus: DataFrame,
        force: bool = False,
        build_id: str | None = None,
    ) -> BuildReport:
        """Incremental index build with change detection + resume.

        Only docs whose content sha changed (or new docs) are re-tokenized
        (F4: the anti-join version of `last_url != url`, action.py:129-133);
        unchanged docs keep their postings. The tokenize output is staged to
        parquet keyed by build_id — re-running the same build_id after a
        crash reuses the completed stage (B3 checkpoint/resume).
        """
        t0 = time.time()
        spark = self.spark
        build_id = build_id or uuid.uuid4().hex[:12]
        prepared = prepare_corpus(corpus, ("*",))  # keep all; lang gates status
        if self.hooks.before_tokenize:
            prepared = self.hooks.before_tokenize(prepared)
        lang_ok = glob_filter_expr(F.col("lang"), self.indexed_langs)
        if self.ignore_where:
            lang_ok = lang_ok & ~F.expr(self.ignore_where)
        manifest = read_doc_manifest(spark, self.root)

        # Slim metadata pass: everything after this point that isn't the
        # tokenize kernel operates on content-free rows. The corpus content
        # is scanned exactly twice per build — once here (sha/fidelity) and
        # once inside tokenize — never cached, never carried through joins.
        meta_slim = prepared.drop("content").cache()
        statused = compute_statuses(meta_slim, manifest, lang_ok, force=force)
        counts = {
            r["status"]: r["n"]
            for r in statused.groupBy("status").agg(F.count("*").alias("n")).collect()
        }

        to_index_ids = statused.where(
            F.col("status").isin(STATUS_NEW, STATUS_UPDATE)
        ).select("doc_id")
        # second content scan: only changed docs reach the kernel. Selecting
        # just (doc_id, content, lang) lets Catalyst prune the sha/size
        # expressions out of this pass; hook transforms stay applied.
        to_index = prepared.join(to_index_ids, "doc_id", "left_semi").select(
            "doc_id", "content", "lang"
        )

        # ---- tokenize (resume-aware staging checkpoint) ------------------
        staging = self._p("staging", "raw_postings", build_id)
        resumed = _stage_complete(staging)
        if not resumed:
            raw, _, _ = tokenize_with_lineage(to_index, build_id, self.analyzer)
            tmp = staging + ".inprogress"
            raw.write.mode("overwrite").parquet(tmp)
            if os.path.exists(staging):
                shutil.rmtree(staging)
            os.rename(tmp, staging)  # atomic publish of the stage
        raw = spark.read.parquet(staging)
        delta_postings, lineage = split_raw_postings(raw, build_id)
        if self.hooks.after_extract:
            delta_postings = self.hooks.after_extract(delta_postings)
        append_lineage(lineage, self.root)

        # ---- merge postings: previous minus (changed ∪ deleted) plus delta
        prev = self._postings_df()
        changed_ids = to_index_ids
        dropped_ids = statused.where(
            F.col("status") == STATUS_IGNORED
        ).select("doc_id")
        if prev is not None:
            kept = prev.join(
                changed_ids.union(dropped_ids), "doc_id", "left_anti"
            )
            postings = kept.unionByName(delta_postings)
            _atomic_overwrite(postings, self._p("postings"), spark)
            self._postings_rel = "postings"
        elif self.hooks.after_extract:
            postings = delta_postings
            _atomic_overwrite(postings, self._p("postings"), spark)
            self._postings_rel = "postings"
        else:
            # fresh build, no transform: the staged tokenize output IS the
            # postings table (readers filter the lineage marker rows) —
            # skipping a full rewrite+reread of the largest intermediate.
            self._postings_rel = os.path.join(
                "staging", "raw_postings", build_id
            )
        postings = self._postings_df()

        # ---- derived tables ---------------------------------------------
        dictionary = build_dictionary(postings, self.n_buckets)
        _atomic_overwrite(dictionary, self._p("dictionary"), spark)
        dictionary = spark.read.parquet(self._p("dictionary"))

        # doc_stats: merge so a partial-corpus batch (streaming/incremental)
        # doesn't drop state for docs absent from this batch
        indexed_docs = meta_slim.where(lang_ok)
        batch_stats = build_doc_stats(indexed_docs, postings)
        prev_ds = self._read_or_none("doc_stats")
        if prev_ds is not None:
            kept_ds = prev_ds.join(
                meta_slim.select("doc_id"), "doc_id", "left_anti"
            )
            batch_stats = kept_ds.unionByName(batch_stats)
        _atomic_overwrite(batch_stats, self._p("doc_stats"), spark)
        doc_stats = spark.read.parquet(self._p("doc_stats"))
        stats = build_corpus_stats(doc_stats)
        _atomic_overwrite(stats, self._p("corpus_stats"), spark)
        self._stats_cache = None  # N/avgdl changed

        # ---- segments ----------------------------------------------------
        st = self.corpus_stats()
        salted = salted_postings(
            postings, dictionary, self.n_buckets, self.salt_threshold
        )
        segments = encode_segments(
            salted, st["avgdl"], with_positions=self.with_positions,
            n_tasks=self._encode_tasks(st),
        )
        _atomic_overwrite(
            segments, self._p("segments"), spark, partition_by="term_bucket"
        )

        # ---- manifest ----------------------------------------------------
        new_manifest = statused.select(
            "doc_id",
            "content_sha256",
            "lang",
            F.when(F.col("status") == STATUS_IGNORED, STATUS_IGNORED)
            .otherwise(F.lit("indexed"))
            .alias("status"),
            F.lit(build_id).alias("build_id"),
        )
        # merge: keep manifest rows for docs not present in this batch
        if manifest.take(1):
            kept_m = manifest.join(meta_slim.select("doc_id"), "doc_id", "left_anti")
            new_manifest = kept_m.unionByName(new_manifest)
        if self.hooks.after_save:
            new_manifest = self.hooks.after_save(new_manifest)
        _atomic_overwrite(new_manifest, self._p("doc_manifest"), spark)
        meta_slim.unpersist()

        self._write_meta()
        self.cool()  # cached segments are stale after a rebuild
        self._gc_staging(keep={build_id})
        if self.hooks.after_index:
            self.hooks.after_index(self)

        n_indexed = counts.get(STATUS_NEW, 0) + counts.get(STATUS_UPDATE, 0)
        return BuildReport(
            build_id=build_id,
            status_counts=counts,
            n_indexed=n_indexed,
            wall_sec=time.time() - t0,
            resumed=resumed,
        )

    # -- introspection -----------------------------------------------------
    def _read_or_none(self, name: str) -> DataFrame | None:
        p = self._p(name)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def _postings_df(self) -> DataFrame | None:
        """The current postings table (term IS NULL lineage markers
        filtered out — present when the table aliases a staging dir)."""
        p = self._p(self._postings_rel)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p).where(F.col("term").isNotNull())

    def corpus_stats(self) -> dict:
        if self._stats_cache is None:
            row = self.spark.read.parquet(self._p("corpus_stats")).collect()[0]
            self._stats_cache = row.asDict()
        return self._stats_cache

    def list_indexed(self) -> DataFrame:
        """Docs with completed metadata (extractor_list, action.py:153-166;
        in-flight/ignored docs excluded, test logic/test_action.py:51-56)."""
        return (
            read_doc_manifest(self.spark, self.root)
            .where(F.col("status") == "indexed")
            .select("doc_id")
        )

    def show(self, doc_id: int) -> dict:
        """Doc stats + provenance (extractor_show, action.py:169-184)."""
        out = {}
        ds = self._read_or_none("doc_stats")
        if ds is not None:
            rows = ds.where(F.col("doc_id") == doc_id).collect()
            if rows:
                out.update(rows[0].asDict())
        m = (
            read_doc_manifest(self.spark, self.root)
            .where(F.col("doc_id") == doc_id)
            .collect()
        )
        if m:
            out["status"] = m[0]["status"]
            out["build_id"] = m[0]["build_id"]
        return out

    def lineage(self) -> DataFrame:
        return read_lineage(self.spark, self.root)

    # -- delete (extractor_delete / private-flip purge) --------------------
    def delete(self, doc_ids: list[int]) -> None:
        """Tombstone docs: postings purged, manifest marked deleted
        (plugin.py:117-123; search must no longer find them,
        test_plugin.py:92-106). Implemented as anti-join rewrite of the
        postings + affected segment buckets only."""
        spark = self.spark
        ids_df = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long")
        postings = self._postings_df()
        if postings is None:
            return
        remaining = postings.join(F.broadcast(ids_df), "doc_id", "left_anti")
        _atomic_overwrite(remaining, self._p("postings"), spark)
        self._postings_rel = "postings"
        self._write_meta()
        postings = self._postings_df()
        dictionary = build_dictionary(postings, self.n_buckets)
        _atomic_overwrite(dictionary, self._p("dictionary"), spark)
        dictionary = spark.read.parquet(self._p("dictionary"))
        ds = self._read_or_none("doc_stats")
        if ds is not None:
            ds2 = ds.join(F.broadcast(ids_df), "doc_id", "left_anti")
            _atomic_overwrite(ds2, self._p("doc_stats"), spark)
            stats = build_corpus_stats(self.spark.read.parquet(self._p("doc_stats")))
            _atomic_overwrite(stats, self._p("corpus_stats"), spark)
            self._stats_cache = None  # N/avgdl changed
        st = self.corpus_stats()
        salted = salted_postings(
            postings, dictionary, self.n_buckets, self.salt_threshold
        )
        segments = encode_segments(
            salted, st["avgdl"], with_positions=self.with_positions,
            n_tasks=self._encode_tasks(st),
        )
        _atomic_overwrite(
            segments, self._p("segments"), spark, partition_by="term_bucket"
        )
        manifest = read_doc_manifest(spark, self.root)
        updated = manifest.withColumn(
            "status",
            F.when(
                F.col("doc_id").isin([int(i) for i in doc_ids]), "deleted"
            ).otherwise(F.col("status")),
        )
        _atomic_overwrite(updated, self._p("doc_manifest"), spark)
        self.cool()

    # -- search ------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        conjunctive: bool = True,
        mode: str = "auto",
        synonyms: dict[str, list[str]] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k BM25 over the encoded segments.

        mode:
          'auto'  — vectorized exact merge over decoded lists (measured
                    fastest at driver scale: intersect/bincount beat the
                    doc-at-a-time python loop by ~300x),
          'wand'  — block-max WAND (the list-skipping algorithm; wins when
                    lists are huge relative to k and decode/IO dominates),
          'slow'  — DataFrame algebra over the postings table (oracle),
        Synonym queries take the grouped slow path (T6 is a query-rewrite
        feature, not a hot-loop one). All three are rank-identical."""
        st = self.corpus_stats()
        if synonyms:
            from ckanext_extractor_spark.operators.query import (
                bm25_search_synonyms,
            )

            rows = bm25_search_synonyms(
                self._postings_df(),
                self.spark.read.parquet(self._p("dictionary")),
                st["n_docs"], st["avgdl"], query, synonyms,
                k=k, conjunctive=conjunctive,
            ).collect()
            return [(r["doc_id"], r["score"]) for r in rows]
        if mode in ("auto", "wand", "exact"):
            from ckanext_extractor_spark.operators.wand import (
                exact_topk,
                wand_topk,
            )

            terms = list(dict.fromkeys(analyze_query(query)))
            if not terms:
                return []
            tls = self._term_postings(terms, st)
            if conjunctive and len(tls) < len(terms):
                return []
            fn = wand_topk if mode == "wand" else exact_topk
            return fn(tls, k, st["avgdl"], conjunctive=conjunctive)
        postings = self._postings_df()
        dictionary = self.spark.read.parquet(self._p("dictionary"))
        rows = bm25_search(
            postings, dictionary, st["n_docs"], st["avgdl"], query,
            k=k, conjunctive=conjunctive,
        ).collect()
        return [(r["doc_id"], r["score"]) for r in rows]


    def warm(self) -> "ExtractorEngine":
        """Load the segment table into a driver-side term dict for
        low-latency serving — the analog of Solr's filter/document caches
        (solrconfig.xml:319-347). Per-query cost becomes a hash lookup +
        numpy decode (memoized), no Spark job at all.

        This assumes the index fits serving memory (it's a compressed
        posting store, ~1-5% of corpus size). When it doesn't, skip warm():
        cold queries do a bucket-pruned parquet read, and truly huge
        queries use the distributed per-bucket scorer."""
        rows = self.spark.read.parquet(self._p("segments")).collect()
        cache: dict[str, list] = {}
        for r in rows:
            cache.setdefault(r["term"], []).append(r)
        self._segments_cache = cache
        self._decoded_cache: dict[str, object] = {}
        return self

    def cool(self) -> None:
        self._segments_cache = None
        self._decoded_cache = {}
        self._stats_cache = None

    ENCODE_ROWS_PER_TASK = 500_000  # ~64 MB of posting rows per sort/encode task

    def _encode_tasks(self, st: dict) -> int:
        """Size the segment-encode shuffle by DATA, not cores: oversized
        partitions make sortWithinPartitions spill and the streaming
        encoder churn (measured: 33M rows at 8 partitions = 208 s; at 64
        partitions = 56 s). AQE coalesces small cases back down."""
        total_tokens = int(st.get("total_tokens") or 0)
        # postings <= tokens; tokens is a safe upper bound available for free
        nsp = int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        want = max(nsp, total_tokens // self.ENCODE_ROWS_PER_TASK + 1)
        return min(want, 4096)

    def _segment_rows(self, term: str) -> list:
        """Raw segment rows (blobs) for one term — warm dict or cold
        bucket-pruned read. Used by phrase verification."""
        if self._segments_cache is not None:
            return self._segments_cache.get(term, [])
        from ckanext_extractor_spark.operators.segments import read_segments

        return read_segments(
            self.spark, self._p("segments"), [term], self.n_buckets
        ).collect()

    def phrase_search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k docs containing the analyzed query as a consecutive
        phrase (positions-aware AND; see operators/phrase.py)."""
        from ckanext_extractor_spark.operators.phrase import phrase_search

        return phrase_search(self, query, k)

    def _gc_staging(self, keep: set[str]) -> None:
        """Drop staging dirs from older builds (the live postings pointer
        and the current build's checkpoint are kept)."""
        st_root = self._p("staging", "raw_postings")
        if not os.path.isdir(st_root):
            return
        live = set(keep)
        if self._postings_rel.startswith("staging"):
            live.add(os.path.basename(self._postings_rel))
        for d in os.listdir(st_root):
            if d not in live:
                shutil.rmtree(os.path.join(st_root, d), ignore_errors=True)

    def _term_postings(self, terms: list[str], st: dict) -> list:
        """TermPostings for `terms` — from the warm dict (memoized decode)
        or a cold bucket-pruned segment read."""
        from ckanext_extractor_spark.operators.wand import (
            load_term_postings,
            term_postings_from_rows,
        )

        if self._segments_cache is None:
            return load_term_postings(
                self.spark, self._p("segments"), terms,
                st["n_docs"], st["avgdl"], self.n_buckets,
            )
        out = []
        for t in terms:
            if t in self._decoded_cache:
                out.append(self._decoded_cache[t])
            elif t in self._segments_cache:
                tp = term_postings_from_rows(
                    t, self._segments_cache[t], st["n_docs"], st["avgdl"]
                )
                self._decoded_cache[t] = tp
                out.append(tp)
        return out


def _stage_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _atomic_overwrite(
    df: DataFrame, path: str, spark: SparkSession, partition_by: str | None = None
) -> None:
    """Write to a temp dir, then atomically swap into place (hard part #3:
    exactly-once publish — readers never observe a half-written table)."""
    tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)
    old = path + ".old-" + uuid.uuid4().hex[:8]
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
