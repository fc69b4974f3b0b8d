from ckanext_extractor_spark.analysis.tokenizer import (  # noqa: F401
    AnalyzerConfig,
    analyze_batch,
    analyze_query,
    postings_for_batch,
)
