"""Streaming exact dedup for continuous corpus ingest.

The batch exact-dedup operator (functions/dedup.py:exact_duplicates)
answers "which docs ARE duplicates"; a continuously-ingesting corpus
needs the online form — "is this arriving doc new?" — so re-crawls and
mirror copies are dropped at the door instead of ballooning the lake.
(The reference's ingest loop re-extracts on changed hash,
reference tasks.py — this is that idea turned into a corpus-wide
streaming operator.)

Spark's built-in ``stream.dropDuplicates`` keeps an ARBITRARY first row
per key (partition race), which is fine for filtering but not
oracle-checkable; this operator uses ``applyInPandasWithState`` to keep
a DETERMINISTIC representative — the smallest id in the earliest
micro-batch that contains the key — and emits each key exactly once.

Scale shape: state is ONE small tuple per distinct content hash (the
hash itself is the group key, so state size tracks unique-document
count, never ingest volume or document size; full texts never enter
state). Grouping shuffles each micro-batch by content hash — the same
single exchange the batch operator pays. For bounded retention at
100 TB (e.g. re-crawl windows), swap NoTimeout for a processing-time
TTL; the availableNow catch-up runs used here keep all state for the
run's duration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_dedup_documents(
    spark: SparkSession,
    source: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Emit one (content_md5, doc_id) row per distinct document text —
    the representative is the min doc_id within the earliest micro-batch
    containing that text; later re-arrivals are dropped by GroupState.

    With the whole input in one micro-batch this equals the batch
    ``GROUP BY md5(text) -> min(doc_id)`` exactly (the q137 oracle);
    across micro-batches the earliest-batch-wins rule is pinned by test.
    Returns the sink read back as a DataFrame.
    """
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(source)
        .select("doc_id", F.md5(F.col("text")).alias("content_md5"))
    )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def _first_seen(key, pdfs, state):
        import pandas as pd

        if state.exists:
            for _ in pdfs:  # drain the iterator; key already emitted
                pass
            return
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((1,))
        yield pd.DataFrame(
            {"content_md5": [key[0]], "doc_id": [best]}
        )

    new_docs = stream.groupBy("content_md5").applyInPandasWithState(
        _first_seen,
        outputStructType="content_md5 string, doc_id long",
        stateStructType="seen int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from ckanext_extractor_spark.streaming.sink import (
        clear_stale_sink,
        epoch_saver,
        read_sink_or_empty,
    )

    # shared sink rules (streaming/sink.py): per-epoch overwrite paths
    # (idempotent under foreachBatch's at-least-once replays), stale
    # sinks cleared on a fresh checkpoint (epoch numbering restarts at
    # 0 — leftover epochs would yield duplicate keys), typed empty
    # frame when zero batches ran
    clear_stale_sink(checkpoint_dir, out_dir)
    q = (
        new_docs.writeStream.foreachBatch(epoch_saver(out_dir))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_sink_or_empty(
        spark, out_dir, new_docs.schema,
        columns=["content_md5", "doc_id"],
    )
