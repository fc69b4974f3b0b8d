"""Per-language stopword tables.

Reference analog: the Solr analysis chain applies StopFilter/stemming per
field type (travis/solr/ckan-2.8/schema.xml:51-66); for a source-code corpus
the north rule calls for *lang-specific stopping* — per-language keyword
lists play the role English stopwords play for prose.

Lists are deliberately small and frozen: they are part of the index
contract (changing them changes doc_len, tf, and therefore every BM25
score), so tests pin them via tokenizer goldens.
"""

from __future__ import annotations

# Programming-language keywords that carry no retrieval signal in a code
# corpus (the `lang` column of the corpus selects the list, mirroring how
# the reference selects behavior by resource `format`, config.py:94-112).
CODE_STOPWORDS: dict[str, frozenset[str]] = {
    "python": frozenset(
        "def return import from class if else elif for while in is not and or "
        "pass none true false self with as try except lambda".split()
    ),
    "java": frozenset(
        "public private protected static final void class import package new "
        "return if else for while int long boolean this null true false".split()
    ),
    "go": frozenset(
        "func package import return if else for range var const type struct "
        "interface nil true false go defer chan map".split()
    ),
    "js": frozenset(
        "function var let const return if else for while new this null "
        "undefined true false import export class async await".split()
    ),
    "markdown": frozenset("the a an and or of to in is are was for with".split()),
}

# Natural-language English stopwords (used for prose corpora when enabled).
ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with".split()
)


def stopwords_for(lang: str | None) -> frozenset[str]:
    if lang is None:
        return frozenset()
    return CODE_STOPWORDS.get(lang.lower(), frozenset())
