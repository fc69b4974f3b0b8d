"""Document chunking for training-data pipelines: token-window
splitting with overlap — the sample-windowing step that turns long
documents into model-sized training chunks.

Pure Catalyst (sequence -> posexplode -> slice -> array_join): no UDF,
no shuffle — chunking is embarrassingly parallel per input partition,
and output partitioning inherits the input's, so a 100 TB corpus chunks
in one map stage. Tokens come from the same simple lowercase
``[^a-z0-9]+`` splitter the textstats family uses (DuckDB-checkable);
swap in the code-aware analyzer upstream for identifier-aware windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ckanext_extractor_spark.functions.textstats import _tokens


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each doc into token windows of ``size`` tokens starting
    every ``size - overlap`` tokens (the final window may be shorter).
    Returns (id, chunk_id, n_tokens, chunk_text); docs with zero
    tokens produce zero chunks (pinned). chunk_id counts windows from
    0 in token order."""
    if isinstance(size, bool) or not isinstance(size, int) or size <= 0:
        raise ValueError(f"size must be a positive int, got {size!r}")
    if isinstance(overlap, bool) or not isinstance(overlap, int) \
            or overlap < 0 or overlap >= size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size, got {overlap!r}"
        )
    stride = size - overlap
    base = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    starts = F.sequence(
        F.lit(0), F.size("_toks") - 1, F.lit(stride)
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
