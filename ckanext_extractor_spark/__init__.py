"""ckanext_extractor_spark — a PySpark-native full-text indexing + BM25 engine.

A from-scratch re-expression of the capabilities of
stadt-karlsruhe/ckanext-extractor (reference at /root/reference): ingest →
text analysis → inverted-index build → BM25 top-k retrieval → metadata
CRUD/introspection → lifecycle hooks + metrics, designed Spark-first
(DataFrame/Catalyst + vectorized pandas/Arrow UDFs, zero per-row Python).

The reference delegates analysis/retrieval to Solr/Lucene
(ckanext/extractor/lib.py:33-52, travis/solr/ckan-2.8/schema.xml:51-66);
this engine owns them natively.
"""

__version__ = "0.1.0"

from ckanext_extractor_spark.session import get_spark  # noqa: F401
