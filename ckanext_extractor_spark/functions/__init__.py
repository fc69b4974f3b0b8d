from ckanext_extractor_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    jaccard_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
)
from ckanext_extractor_spark.functions.fingerprint import (  # noqa: F401
    fingerprint_candidates,
    winnow_fingerprints,
)
from ckanext_extractor_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    lsh_bucket_topk,
)
from ckanext_extractor_spark.functions.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
