"""PII detection + redaction for training-data pipelines.

Regex-class scrubbing (the C4/Dolma-style pass): emails, IPv4
addresses, and long digit runs (phone-/account-number shaped) are
counted and replaced with typed placeholder tags before text ships to
training. Reference analog: none — ckanext-extractor has no PII
surface; this extends the pipeline family like `functions/decontam.py`.

All patterns are in the RE2 ∩ java.util.regex common subset (no
backreferences, no lookaround) so the same pattern text runs in Spark's
`regexp_replace`/`regexp_count` (JVM, whole-stage codegen — never a
Python UDF) and in the DuckDB oracle's `regexp_extract_all`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: applied in this sequence; earlier replacements cannot create
# later matches (tags contain no '@', dots, or digits)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("digit_run", r"\b[0-9]{9,16}\b", "<NUM>"),
)


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-doc match counts per PII class + total. Pure Catalyst
    (`regexp_count`), one projection, no shuffle."""
    cols = [F.col(id_col).alias("doc_id")]
    total = F.lit(0).cast("long")
    for name, pat, _tag in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    cols.append(total.alias("n_pii"))
    return df.select(*cols)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Replace every PII match with its typed tag. In-place on
    `text_col` unless `out_col` names a new column. Chained
    `regexp_replace` stays inside whole-stage codegen; order is fixed
    by PII_PATTERNS (emails first so their host parts are not
    re-matched as digit runs)."""
    scrubbed = F.col(text_col)
    for _name, pat, tag in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return df.withColumn(out_col or text_col, scrubbed)
