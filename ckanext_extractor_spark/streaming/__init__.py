from ckanext_extractor_spark.streaming.incremental import (  # noqa: F401
    stream_incremental_build,
)
