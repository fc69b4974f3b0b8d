"""Shared foreachBatch parquet-sink helpers for the bounded
(availableNow) streaming operators (one implementation of the
idempotence + read-back rules that dedup.py and windows.py previously
copy-pasted — code-review r5 finding).

Contract:
* each epoch writes to its own ``out_dir/epoch=<id>`` directory with
  mode=overwrite: foreachBatch is at-least-once, so a replayed epoch
  overwrites its own directory instead of appending duplicates.
* a FRESH stream (checkpoint dir does not exist yet) clears any
  pre-existing sink first: epoch numbering restarts at 0, so stale
  epoch dirs from an abandoned previous run would survive the
  per-epoch overwrites and pollute the read-back (duplicate dedup
  keys / stale 'latest' rows). Resuming with the SAME checkpoint
  keeps the sink — earlier epochs are prior emissions, not staleness.
* read-back tolerates the zero-batch case (sink dir never created)
  by returning a typed empty frame.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def clear_stale_sink(checkpoint_dir: str, out_dir: str) -> None:
    """Remove a leftover sink when starting a FRESH stream."""
    if not os.path.exists(checkpoint_dir) and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)


def epoch_saver(out_dir: str):
    """foreachBatch callback writing each epoch to its own
    overwritable directory (idempotent under epoch replays)."""

    def _save(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={int(epoch_id)}")

    return _save


def read_sink_or_empty(
    spark: SparkSession, out_dir: str, schema, columns=None
) -> DataFrame:
    """Read the partitioned sink back; typed empty frame when no epoch
    ever ran. Partition discovery surfaces ``epoch`` as a column —
    pass ``columns`` to project it away (or keep it for latest-wins
    logic)."""
    from pyspark.errors import AnalysisException

    try:
        sunk = spark.read.parquet(out_dir)
    except AnalysisException:
        return spark.createDataFrame([], schema)
    return sunk.select(*columns) if columns else sunk
