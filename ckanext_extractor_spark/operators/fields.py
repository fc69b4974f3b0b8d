"""Per-field search over extracted metadata (SURVEY.md Q5).

Reference analog: every metadata key becomes its own dynamic Solr field
``ckanext-extractor_{id}_{key}`` (plugin.py:40,140; schema.xml:161) that
``package_search`` can target as a filter query. The body text keeps the
copyField catch-all behavior (the main index); metadata fields get their
own postings table here so queries can target a single key.

Semantics mirror the reference's filter-query use: a doc matches when ALL
analyzed query tokens occur in that doc's value for the field (boolean
AND, unscored — Solr fq does not score either). The analyzer is the
SQL-parity simple chain (lower + [a-z0-9] runs): metadata values are
short strings where identifier catenation adds nothing, and this keeps
the operator fully oracle-checkable.

Scale: field_postings is O(docs x keys x value tokens) — metadata values
are tiny next to content, so the table is a small fraction of the main
postings; the build is one explode + hash aggregate, the query one
pushed-filter scan + aggregate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELD_POSTINGS_SCHEMA = "doc_id long, field string, term string, tf long"

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def analyze_field_query(query: str) -> list[str]:
    """Driver-side simple analysis matching the build-side tokenizer."""
    return _SIMPLE_RE.findall(query.lower())


def build_field_postings(
    prepared: DataFrame,
    id_col: str = "doc_id",
    meta_col: str = "metadata",
) -> DataFrame:
    """(doc_id, field, term, tf) from a map<string,string> metadata column
    (already cleaned/collapsed/filtered by the engine's sidecar stage)."""
    return (
        prepared.select(
            F.col(id_col), F.explode(F.col(meta_col)).alias("field", "value")
        )
        .select(
            id_col,
            "field",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("value")), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("term"),
        )
        .groupBy(id_col, "field", "term")
        .agg(F.count("*").alias("tf"))
    )


def search_field(
    field_postings: DataFrame,
    field: str,
    query: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids whose `field` value contains ALL analyzed query tokens.

    The field+term filters push down to the parquet scan; the AND is a
    distinct-count aggregate (no join)."""
    terms = list(dict.fromkeys(analyze_field_query(query)))
    if not terms:
        return field_postings.select(id_col).limit(0)
    return (
        field_postings.where(F.col("field") == field)
        .where(F.col("term").isin(terms))
        .groupBy(id_col)
        .agg(F.count_distinct("term").alias("_n"))
        .where(F.col("_n") == len(terms))
        .select(id_col)
    )
