"""Benchmark decontamination: flag / drop training documents that share
word n-grams with an evaluation (benchmark) set.

The standard LLM-training hygiene pass (GPT-3 appendix C / Llama
dedup-and-decontaminate): any training doc containing an n-gram that
also appears in a benchmark document is contaminated and must be
dropped (or audited) before training. Reference analog: none —
ckanext-extractor has no training-pipeline surface; this family extends
the engine the way `functions/dedup.py` does.

Spark-first shape: both sides tokenize with the same simple analyzer as
`textstats` (portable to the DuckDB oracle), n-grams are md5-prefix
hashes (60-bit, the `dedup._h60` convention) so the contamination join
ships longs, never gram strings. The benchmark side is DISTINCT-reduced
first and is expected to be small relative to the corpus (an eval set),
so the join side is broadcast-hinted by default — at 100 TB the corpus
side streams map-side with zero shuffle. With `broadcast_bench=False`
it degrades to a shuffled equi-join on the gram hash (both sides
pre-deduped, so the shuffle carries at most one row per distinct gram
per side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one copy of the pinned portable conventions: the simple tokenizer
# lives in textstats, the md5-60-bit hash in dedup — re-implementing
# either here would let a future change (e.g. a hash-width bump)
# silently desynchronize the families
from ckanext_extractor_spark.functions.dedup import _h60 as _gram_hash
from ckanext_extractor_spark.functions.textstats import _tokens


def ngram_set(df: DataFrame, n: int, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, gram_hash) pairs of word n-grams per document.

    One projection + explode; no shuffle until the caller aggregates.
    Docs shorter than n tokens emit nothing.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(grams)).alias("gram"),
        )
        .select("doc_id", _gram_hash(F.col("gram")).alias("gram_hash"))
    )


def contamination(docs: DataFrame, bench: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_bench: bool = True) -> DataFrame:
    """Per-doc contamination report: (doc_id, n_shared_grams) for every
    training doc sharing >= 1 word n-gram with any benchmark text.

    `bench` needs only `text_col`. The benchmark gram set is distinct-
    reduced and broadcast (eval sets are dim-table-sized); the corpus
    side then joins map-side — no corpus shuffle beyond the final
    per-doc count aggregate (partial-agg friendly).
    """
    doc_grams = ngram_set(docs, n, text_col, id_col)
    bench_side = (
        bench if id_col in bench.columns
        else bench.withColumn(id_col, F.lit(0))
    )
    bench_grams = (
        ngram_set(bench_side, n, text_col, id_col)
        .select("gram_hash").distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "gram_hash")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_bench: bool = True) -> DataFrame:
    """The cleaned corpus: `docs` minus every contaminated row
    (left-anti join on the contamination report)."""
    bad = contamination(
        docs, bench, n=n, text_col=text_col, id_col=id_col,
        broadcast_bench=broadcast_bench,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")
