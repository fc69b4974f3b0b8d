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


def _doc_row(i: int) -> dict:
    rng = np.random.RandomState((SEED * 1_000_003 + i) % (2**31 - 1))
    lang = LANGS[int(np.searchsorted(LANG_CUM, rng.rand()))]
    repo = f"org{i % 7}/repo{i % 23}"
    path = f"src/mod{i % 13}/file{i}.{EXT[lang]}"
    h1 = hashlib.md5(f"{repo}/{path}".encode()).hexdigest()
    h2 = hashlib.md5(f"{path}@{repo}".encode()).hexdigest()
    commit = (h1 + h2)[:40]

    kws = LANG_KEYWORDS[lang]
    n_lines = 5 + int(rng.rand() * 35)
    words: list[str] = []
    for _ in range(n_lines):
        n_tok = 3 + int(rng.rand() * 8)
        for _ in range(n_tok):
            r = rng.rand()
            if r < 0.25:
                words.append(kws[int(rng.rand() * len(kws))])
            elif r < 0.50:
                a = IDENT_STEMS[int(rng.rand() * len(IDENT_STEMS))]
                b = IDENT_STEMS[int(rng.rand() * len(IDENT_STEMS))]
                # alternate camelCase / snake_case identifiers
                words.append(a + b.capitalize() if rng.rand() < 0.5 else f"{a}_{b}")
            elif r < 0.62:
                words.append(HOT_TERMS[int(rng.rand() * len(HOT_TERMS))])
            elif r < 0.70:
                words.append(str(int(rng.rand() * 10_000)))
            elif r < 0.74:
                words.append(UNICODE_WORDS[int(rng.rand() * len(UNICODE_WORDS))])
            else:
                words.append(IDENT_STEMS[int(rng.rand() * len(IDENT_STEMS))])
    # one golden rare token per doc (analog of 'Foobarium' in the
    # reference's tests/test.pdf, asserted at tests/test_lib.py:43-47)
    words.insert(int(rng.rand() * len(words)), f"golden{i:06d}x")
    content = " ".join(words)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
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
