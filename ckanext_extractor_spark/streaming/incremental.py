"""Structured-Streaming incremental build (SURVEY.md §1.2 stretch).

The reference's "streaming" is an async-but-batch job queue (RQ/Redis,
logic/action.py:36-39,144): resources arrive, get enqueued, a worker
indexes them. The Spark-native equivalent is a file-source stream with an
``availableNow`` trigger + ``foreachBatch`` into the engine's incremental
``extract``:

* Spark's streaming checkpoint tracks WHICH FILES have been ingested
  (at-least-once replay on restart),
* the engine's sha-based status machine dedups WHICH DOCS need indexing
  (making the sink effectively idempotent/exactly-once at doc level).

Both layers of incrementality are the same ones a 100 TB continuously-
ingesting corpus needs; availableNow makes each run a bounded catch-up
job, which is how large batch-incremental pipelines actually deploy.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ckanext_extractor_spark.api import BuildReport, ExtractorEngine
from ckanext_extractor_spark.sources.corpus_source import CORPUS_SCHEMA


def stream_incremental_build(
    spark: SparkSession,
    engine: ExtractorEngine,
    source_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[BuildReport]:
    """Process all currently-available corpus files once, incrementally.

    Returns the BuildReport of each micro-batch. Restarting with the same
    checkpoint_dir skips files already ingested.
    """
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    reports: list[BuildReport] = []

    def process(batch_df, epoch_id: int) -> None:
        if batch_df.take(1):
            rep = engine.extract(batch_df, build_id=f"stream-{epoch_id:06d}")
            if rep.in_progress:
                # extract() declined because another build holds the
                # index lock. Swallowing that would let the epoch
                # COMMIT — the checkpoint then marks these source
                # files ingested and they are never indexed (silent
                # data loss; code-review r5 finding). Raising fails
                # the batch so the stream retries it after the lock
                # clears.
                raise RuntimeError(
                    f"micro-batch {epoch_id}: index build lock held; "
                    "failing the epoch so the checkpoint does not "
                    "mark these files ingested"
                )
            reports.append(rep)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return reports
