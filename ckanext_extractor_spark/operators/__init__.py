from ckanext_extractor_spark.operators.build import (  # noqa: F401
    build_corpus_stats,
    build_dictionary,
    build_doc_stats,
    prepare_corpus,
    tokenize_postings,
)
from ckanext_extractor_spark.operators.query import bm25_search  # noqa: F401
