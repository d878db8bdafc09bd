from mapreduce_framework_api_spark.functions.textfns import (
    TOKEN_DELIM_RE,
    tokens,
    tokens_nonempty,
)

__all__ = ["TOKEN_DELIM_RE", "tokens", "tokens_nonempty"]
