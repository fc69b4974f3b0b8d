"""Content + metadata normalization (SURVEY.md S2 / F2 / T-key-cleaning).

Reference analogs:
  * S2 — Tika extraction normalization: the engine's corpus is already
    text, so the Tika stage collapses to content hygiene: BOM strip,
    control-char removal, unicode NFC, n_chars (lib.py:50-52 +
    solrconfig.xml:778-792's lowernames/fmap behavior).
  * clean_metadatum — metadata keys lowercased, '_'->'-', 1-element lists
    flattened (lib.py:55-65, golden test test_lib.py:50-51); multi-values
    collapsed with ', ' (tasks.py:89-95).
  * F2 — extracted-field fnmatch filter `indexed_fields` (config.py:101-105,
    applied tasks.py:82-84) -> map_filter on a MapType metadata column.

All Catalyst expressions — no Python.
"""

from __future__ import annotations

import fnmatch
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# control chars except \t \n \r
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_content(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Content hygiene: strip UTF-8 BOM, drop control characters, collapse
    \\r\\n, add n_chars. Idempotent."""
    c = F.col(content_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, "^﻿", ""), "\r\n?", "\n"
        ),
        _CTRL_RE,
        "",
    )
    return df.withColumn(content_col, cleaned).withColumn(
        "n_chars", F.length(F.col(content_col))
    )


def clean_metadata_keys(meta_col: Column) -> Column:
    """Key normalization: lowercase, '_' -> '-' (lib.py:55-59)."""
    return F.map_from_arrays(
        F.transform(
            F.map_keys(meta_col),
            lambda k: F.regexp_replace(F.lower(k), "_", "-"),
        ),
        F.map_values(meta_col),
    )


def collapse_multivalues(meta_col: Column) -> Column:
    """Array-valued metadata collapsed to ', '-joined scalars
    (tasks.py:89-95). Expects map<string, array<string>>."""
    return F.map_from_arrays(
        F.map_keys(meta_col),
        F.transform(F.map_values(meta_col), lambda v: F.array_join(v, ", ")),
    )


def filter_metadata_fields(
    meta_col: Column, indexed_fields: Iterable[str] = ("fulltext",)
) -> Column:
    """F2: keep only metadata keys fnmatch-ing the indexed_fields patterns
    (case-insensitive), as a map_filter Catalyst expression."""
    pats = [p.lower() for p in indexed_fields]
    if any(p == "*" for p in pats):
        return meta_col
    # \A-anchored per branch: rlike has search semantics and
    # fnmatch.translate only emits \Z, so 'my-lang' would match the
    # pattern 'lang' unanchored (code-review r5 finding)
    regex = "|".join(f"(?:\\A{fnmatch.translate(p)})" for p in pats)
    return F.map_filter(meta_col, lambda k, _v: F.lower(k).rlike(regex))
