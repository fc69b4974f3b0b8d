"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input shape per BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Content is generated per-document from a seed derived from the document
index, so the corpus is byte-identical regardless of partitioning or
generation order — segment checksums and rank-identity tests depend on
this.  ``corpus_df`` generates distributedly via ``mapInPandas`` over
``spark.range`` (no driver-side materialization), which is the pattern a
cluster-scale fixture load would use.

Reference analog of a "document": the CKAN resource dict consumed at
ckanext/extractor/tasks.py:62-79 (id/url/format/package_id); here ``lang``
plays the role of ``format`` and ``content`` replaces the downloaded bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

LANGS = ["python", "java", "go", "js", "markdown"]
LANG_CUM = np.array([0.40, 0.60, 0.75, 0.90, 1.00])
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "markdown": "md"}

IDENT_STEMS = (
    "parse buffer index token merge shard query vector cache stream block "
    "delta fetch score field batch slice graph node edge hash byte json "
    "http socket thread mutex queue stack heap tree trie span chunk page "
    "frame codec varint posting reader writer codecs lexer symbol scope"
).split()

LANG_KEYWORDS = {
    "python": "def return import class if else for while in is not".split(),
    "java": "public static void class return new int if else for".split(),
    "go": "func package return if else for range var type struct".split(),
    "js": "function var let const return if else for new this".split(),
    "markdown": "the a and of to in is for with".split(),
}

# hot terms present in most docs -> exercise skew salting (FIXTURES.md §1)
HOT_TERMS = ["data", "value", "return", "size"]
UNICODE_WORDS = ["Köln", "naïve", "café", "Zürich", "señor"]


# pre-built vocab tables for the vectorized generator
_IDENT = np.array(IDENT_STEMS, dtype=object)
_CAMEL = np.array(
    [a + b.capitalize() for a in IDENT_STEMS for b in IDENT_STEMS], dtype=object
)
_SNAKE = np.array(
    [f"{a}_{b}" for a in IDENT_STEMS for b in IDENT_STEMS], dtype=object
)
_HOT = np.array(HOT_TERMS, dtype=object)
_UNI = np.array(UNICODE_WORDS, dtype=object)
_NUMS = np.array([str(n) for n in range(10_000)], dtype=object)
_KW = {lg: np.array(ws, dtype=object) for lg, ws in LANG_KEYWORDS.items()}


def _doc_row(i: int) -> dict:
    """Deterministic per-doc generation, vectorized.

    Philox counter-based RNG keyed by (SEED, doc id): byte-identical
    regardless of partitioning or generation order, ~20x faster than a
    per-token python loop (matters when generating 10^5..10^6-doc fixture
    corpora for scaling runs)."""
    rng = np.random.Generator(np.random.Philox(key=SEED, counter=i))
    lang = LANGS[int(np.searchsorted(LANG_CUM, rng.random()))]
    repo = f"org{i % 7}/repo{i % 23}"
    path = f"src/mod{i % 13}/file{i}.{EXT[lang]}"
    h1 = hashlib.md5(f"{repo}/{path}".encode()).hexdigest()
    h2 = hashlib.md5(f"{path}@{repo}".encode()).hexdigest()
    commit = (h1 + h2)[:40]

    n_lines = 5 + int(rng.random() * 35)
    n_tok = (3 + rng.random(n_lines) * 8).astype(np.int64)
    total = int(n_tok.sum())
    r = rng.random(total)
    pick = rng.random(total)  # secondary selector within each class
    words = np.empty(total, dtype=object)
    kws = _KW[lang]

    def fill(mask, table):
        idx = (pick[mask] * len(table)).astype(np.int64)
        words[mask] = table[idx]

    fill(r < 0.25, kws)
    m_ident = (r >= 0.25) & (r < 0.50)
    # camel vs snake split via a tertiary draw
    camel_sel = rng.random(total) < 0.5
    fill(m_ident & camel_sel, _CAMEL)
    fill(m_ident & ~camel_sel, _SNAKE)
    fill((r >= 0.50) & (r < 0.62), _HOT)
    fill((r >= 0.62) & (r < 0.70), _NUMS)
    fill((r >= 0.70) & (r < 0.74), _UNI)
    fill(r >= 0.74, _IDENT)

    # one golden rare token per doc (analog of 'Foobarium' in the
    # reference's tests/test.pdf, asserted at tests/test_lib.py:43-47)
    at = int(rng.random() * (total + 1))
    wl = words.tolist()
    wl.insert(at, f"golden{i:06d}x")
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": " ".join(wl),
    }


def corpus_pdf(n_docs: int, start: int = 0) -> pd.DataFrame:
    """Driver-side generation for unit tests (small n)."""
    return pd.DataFrame([_doc_row(i) for i in range(start, start + n_docs)])


def corpus_df(spark, n_docs: int):
    """Distributed generation: one deterministic row per id in [0, n_docs)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([_doc_row(int(i)) for i in pdf["id"]])

    return spark.range(n_docs).mapInPandas(gen, schema=schema)
