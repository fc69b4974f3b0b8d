"""Index-carried token->char offsets for highlighting.

Lucene analog: ``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS``
/ term vectors with offsets, consumed by the FastVectorHighlighter —
offsets are computed ONCE at index time by the analyzer, stored, and
read back at highlight time, so the text is never re-analyzed per query.
The reference gets highlighting from Solr's highlighter over the same
stored offsets (travis/solr/ckan-2.8/schema.xml stored fields).

Stored per DOC (one monotone position->char-offset map as a delta+varbyte
blob in the doc_store row), not per posting: highlighting needs
doc-keyed offsets anyway, the blob compresses to ~1 byte/token, and the
posting lists stay exactly as small as without offsets. Opt-in like
Lucene's offsets IndexOption (``ExtractorEngine(store_offsets=True)``)
because the blob is paid by every doc in the store.

Scale: the blob is computed inside the SAME pruned content scan that
writes doc_store (a vectorized pandas UDF column — no extra pass over
the corpus), and lookups are point varbyte decodes bounded by the anchor
position. Per-batch unique-word width memoization mirrors the tokenize
kernel's big win: repeated words pay _expand_word once.
"""

# NOTE: no `from __future__ import annotations` — the pandas UDF's type
# hints must stay real types for PySpark's eval-type inference.
import re

import numpy as np
import pandas as pd

from ckanext_extractor_spark.analysis.tokenizer import _expand_word
from ckanext_extractor_spark.operators.codec import (
    varbyte_decode,
    varbyte_encode,
)

_WORD_RE = re.compile(r"\S+")


def position_offsets_blob(text: str, analyzer, memo: "dict | None" = None) -> bytes:
    """varbyte(delta(char offset of each token position)) for one doc.

    Position numbering reproduces the index contract exactly: positions
    are assigned BEFORE stopword removal, each whitespace word consumes
    its analyzer WIDTH (parts only — catenated forms inject at posInc=0
    and share their anchor part's offset), and stemming renames tokens
    without changing widths. Deltas are non-negative because word starts
    are monotone."""
    if not text:
        return b""
    if memo is None:
        memo = {}
    offs: list[int] = []
    for m in _WORD_RE.finditer(text):
        w = m.group(0)
        width = memo.get(w)
        if width is None:
            width = _expand_word(w, analyzer)[2]
            memo[w] = width
        if width:
            offs.extend([m.start()] * width)
    if not offs:
        return b""
    a = np.asarray(offs, dtype=np.uint64)
    deltas = np.diff(a, prepend=np.uint64(0))
    return varbyte_encode(deltas)


def char_of_position_blob(blob: bytes, position: int) -> "int | None":
    """Char offset of token ``position`` from a stored blob — a point
    varbyte decode of ``position + 1`` deltas (early exit; never scans
    past the anchor). None when the blob is missing/short (e.g. doc_store
    rows written before the index enabled offsets) — callers fall back
    to the analyzer re-scan."""
    if not blob or position < 0:
        return None
    vals, _ = varbyte_decode(blob, 0, position + 1)
    if vals.size < position + 1:
        return None
    return int(vals.sum())


def offsets_udf(analyzer):
    """binary pandas UDF computing the per-doc offsets blob — attached as
    one more column of the doc_store write (same scan, Arrow-batched)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def _offsets(content: pd.Series) -> pd.Series:
        memo: dict = {}
        return pd.Series(
            [position_offsets_blob(t or "", analyzer, memo) for t in content]
        )

    return _offsets
