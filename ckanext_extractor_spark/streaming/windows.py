"""Structured-Streaming event analytics: watermarked tumbling windows,
native session windows, and a stateful per-key operator.

The reference has no streaming surface (its "streaming" is an async batch
queue, reference logic/action.py:36-39,144 — see streaming/incremental.py
for that analog). These operators cover the OTHER streaming shape a
100 TB ingest pipeline needs: continuous event telemetry (index-build
progress events, query logs, corpus-ingest audit records) aggregated
on event time with bounded state.

Design (Spark-first):

* One shared Catalyst plan serves batch AND streaming — the aggregation
  helpers take any DataFrame, so the batch form IS the oracle for the
  streaming form (pinned by tests and by the q132/q133/q134 entries).
* Tumbling windows: ``F.window`` + ``withWatermark`` — late rows older
  than the watermark are dropped, state per window is bounded, and
  append mode emits a window exactly once when the watermark passes it.
  (Spark commits the watermark at end-of-batch, so late-row filtering
  takes effect from the FOLLOWING micro-batch — pinned by test.)
  That is the standard scale story: window state never grows with
  corpus size, only with (windows in flight x keys).
* Session windows: ``F.session_window`` (built-in, codegen) rather than
  a hand-rolled stateful UDF — gap-merge semantics pinned against a
  lag/cumsum SQL oracle (Spark merges while ts <= prev_ts + gap —
  touching sessions coalesce; break iff ts - prev_ts > gap).
* Custom state: ``applyInPandasWithState`` carries per-user running
  totals across micro-batches (Arrow-batched, grouped state — the
  escape hatch for semantics window aggregates can't express). Update
  mode emits a refreshed row per touched key per batch; the latest row
  per key equals the batch GROUP BY (pinned).

All sinks here are parquet via availableNow triggers: each run is a
bounded catch-up job (how incremental pipelines actually deploy), and
the streaming checkpoint makes re-runs skip already-ingested files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value).

    Works on batch and streaming frames alike (same plan); on a
    streaming frame the watermark bounds state and defines append-mode
    finalization. Output carries the window start as exact epoch
    micros (BIGINT) so the comparison with an external oracle is
    engine-independent.
    """
    # parquet event times may load as TIMESTAMP_NTZ; unix_micros needs
    # TIMESTAMP (session tz is UTC, so the cast is value-identical)
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_event_stats(
    events: DataFrame, gap: str = "30 minutes",
    watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged): an event extends the
    current session while it lands at or before prev_ts + gap (touching
    sessions coalesce — pinned by test); the session closes at
    last_ts + gap. Built-in ``session_window`` — whole-stage codegen in
    batch, bounded merge state in streaming (Spark REQUIRES a watermark
    for streaming session aggregation, so the streaming branch adds one
    exactly like windowed_event_stats — code-review r5 finding)."""
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df
        .groupBy(
            F.session_window("ts", gap).alias("win"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("win.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_stats(
    spark: SparkSession,
    source: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    mode: str = "complete",
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Run :func:`windowed_event_stats` as a bounded availableNow stream.

    ``mode='complete'``: every window's final value lands in ``out_dir``
    (foreachBatch overwrite — the catch-up-job shape; result equals the
    batch aggregate exactly). ``mode='append'``: the parquet sink
    receives a window only once its watermark passes — windows still
    open when the bounded input drains are NOT emitted and late rows
    older than the watermark are dropped (the at-scale semantics; use
    ``max_files_per_trigger`` to split the input into multiple
    micro-batches so the watermark actually advances mid-run).
    Returns the sink read back as a DataFrame.
    """
    if mode not in ("complete", "append"):
        raise ValueError(f"mode must be complete|append, got {mode!r}")
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = windowed_event_stats(
        reader.parquet(source), window=window, watermark=watermark
    )
    if mode == "complete":

        def _save(batch_df: DataFrame, epoch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(out_dir)

        q = (
            agg.writeStream.foreachBatch(_save)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(agg.schema).parquet(out_dir)
    except AnalysisException:
        # zero batches ran (empty source) -> sink dir never created
        return spark.createDataFrame([], agg.schema)


def stateful_user_totals_stream(
    spark: SparkSession,
    source: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Per-user running totals via ``applyInPandasWithState``: the
    canonical custom stateful operator — GroupState carries (n, total)
    across micro-batches, each batch emits the refreshed row for every
    user it touched (update mode), and the sink keeps every emission
    stamped with its epoch. Returns the LATEST row per user (the final
    totals — equal to the batch ``GROUP BY user_id`` aggregate, pinned
    by test and by the q134 oracle). State is one tuple per user:
    bounded by key cardinality, never by event volume.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source)

    def _update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 6)],
            }
        )

    updates = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=(
            "user_id long, n_events long, sum_value double"
        ),
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from ckanext_extractor_spark.streaming.sink import (
        clear_stale_sink,
        epoch_saver,
        read_sink_or_empty,
    )

    # shared sink rules (streaming/sink.py): per-epoch overwrite paths
    # (idempotent under epoch replays), stale sinks cleared on a fresh
    # checkpoint (a previous run's epochs would win max('epoch') with
    # stale totals), typed empty frame when zero batches ran; the
    # epoch partition column is KEPT for the latest-wins join
    clear_stale_sink(checkpoint_dir, out_dir)
    q = (
        updates.writeStream.foreachBatch(epoch_saver(out_dir))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = read_sink_or_empty(
        spark, out_dir,
        "user_id long, n_events long, sum_value double, epoch int",
    )
    latest = sunk.groupBy("user_id").agg(F.max("epoch").alias("epoch"))
    return (
        sunk.join(latest, ["user_id", "epoch"], "inner")
        .select("user_id", "n_events", "sum_value")
    )
