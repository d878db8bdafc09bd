from mapreduce_framework_api_spark.sources.readers import (
    TABLES,
    fixture_fingerprint,
    parallelized,
    session_cache_key,
    table,
)

__all__ = ["table", "TABLES", "parallelized", "session_cache_key", "fixture_fingerprint"]
